"""Loss registry — every loss MMF registers, TPU-native (C34/C24).

Re-design of ``VisualBERT/mmf/modules/losses.py``: the 14 registered
losses (``logit_bce``:192, ``triple_logit_bce``:221, ``bce``:260,
``caption_cross_entropy``:284, ``nll_loss``:323, ``multi``:360,
``attention_supervision``:417, ``weighted_softmax``:453,
``softmax_kldiv``:474, ``wrong``:494, ``bce_kl_combined``:514,
``m4c_decoding_bce_with_mask``:543, ``cross_entropy``:563) plus the
``Losses``/``MMFLoss`` orchestration wrappers (:40-189).

TPU notes: every loss is a pure jnp function of (sample_list dict,
model_output dict) → scalar, jit/grad/vmap-safe with static shapes —
no classes, no in-place masking; the reference's ``masked_fill_``
guards become ``jnp.where``.  The ``Losses`` orchestrator is host-side
config plumbing and stays in Python.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Mapping, Optional, Union

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.core.registry import registry

SampleDict = Mapping[str, Any]


def _bce_with_logits(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary_cross_entropy_with_logits (stable form)."""
    return jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def _bce(p: jnp.ndarray, t: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Elementwise binary_cross_entropy on probabilities (torch clamps
    the log terms at -100, i.e. probabilities at exp(-100))."""
    lo = jnp.log(jnp.maximum(p, jnp.exp(-100.0)))
    l1 = jnp.log(jnp.maximum(1.0 - p, jnp.exp(-100.0)))
    return -(t * lo + (1.0 - t) * l1)


@registry.register_loss("logit_bce")
def logit_bce(sample_list: SampleDict, model_output: SampleDict
              ) -> jnp.ndarray:
    """LogitBinaryCrossEntropy (losses.py:192-218): mean BCE-with-logits
    scaled back by the answer-space size."""
    scores = model_output["scores"]
    targets = sample_list["targets"]
    return _bce_with_logits(scores, targets).mean() * targets.shape[1]


@registry.register_loss("triple_logit_bce")
def triple_logit_bce(sample_list: SampleDict, model_output: SampleDict
                     ) -> jnp.ndarray:
    """TripleLogitBinaryCrossEntropy (losses.py:221-257): one BCE per
    branch of the three-branch fusion when scores is [B, 3, A]."""
    scores = model_output["scores"]
    targets = sample_list["targets"]
    if scores.ndim == 3:
        loss = (_bce_with_logits(scores[:, 0], targets).mean()
                + _bce_with_logits(scores[:, 1], targets).mean()
                + _bce_with_logits(scores[:, 2], targets).mean())
    else:
        loss = _bce_with_logits(scores, targets).mean()
    return loss * targets.shape[-1]


@registry.register_loss("bce")
def bce(sample_list: SampleDict, model_output: SampleDict) -> jnp.ndarray:
    """BinaryCrossEntropyLoss (losses.py:260-281) on probabilities."""
    scores = model_output["scores"]
    targets = sample_list["targets"]
    return _bce(scores, targets).mean() * targets.shape[1]


@registry.register_loss("caption_cross_entropy")
def caption_cross_entropy(sample_list: SampleDict,
                          model_output: SampleDict) -> jnp.ndarray:
    """CaptionCrossEntropyLoss (losses.py:284-320).

    scores [B, T, V], targets [B, T] int.  With ``caption_len`` the
    reference sorts the lengths descending and uses position b's
    *sorted* length-1 as row b's decode length WITHOUT reordering the
    rows (losses.py:305-306) — a protocol quirk we replicate exactly.
    CE is the mean over the packed (unpadded) elements.
    """
    scores = model_output["scores"]
    targets = sample_list["targets"]
    B, T = targets.shape[0], targets.shape[1]
    if "caption_len" in sample_list and sample_list["caption_len"] is not None:
        lens = jnp.sort(sample_list["caption_len"])[::-1] - 1
    else:
        lens = jnp.full((B,), T, jnp.int32)
    mask = (jnp.arange(T)[None, :] < lens[:, None]).astype(scores.dtype)
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


@registry.register_loss("nll_loss")
def nll_loss(sample_list: SampleDict, model_output: SampleDict
             ) -> jnp.ndarray:
    """NLLLoss (losses.py:323-347): scores are log-probs, target is the
    argmax of the soft labels, scaled by answer-space size."""
    scores = model_output["scores"]
    targets = sample_list["targets"]
    idx = targets.argmax(axis=1)
    picked = jnp.take_along_axis(scores, idx[:, None], axis=1)[:, 0]
    return -picked.mean() * targets.shape[1]


def _kl_div(log_x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """kl_div helper (losses.py:350-357): y·(log y − log x) with the
    y==0 rows contributing zero, summed over classes (keepdim)."""
    log_y = jnp.log(jnp.where(y == 0, 1.0, y))
    res = y * (log_y - log_x)
    return res.sum(axis=1, keepdims=True)


def _normalized_targets(target_score: jnp.ndarray):
    tar_sum = target_score.sum(axis=1, keepdims=True)
    tar_sum = jnp.where(tar_sum == 0, 1e-6, tar_sum)
    return target_score / tar_sum, tar_sum


@registry.register_loss("weighted_softmax")
def weighted_softmax(sample_list: SampleDict, model_output: SampleDict
                     ) -> jnp.ndarray:
    """WeightedSoftmaxLoss (losses.py:453-471): KL to the normalized
    soft targets, re-weighted by the target mass."""
    pred = model_output["scores"]
    tar, tar_sum = _normalized_targets(sample_list["targets"])
    res = jax.nn.log_softmax(pred, axis=1)
    loss = _kl_div(res, tar) * tar_sum
    return loss.sum() / loss.shape[0]


@registry.register_loss("softmax_kldiv")
def softmax_kldiv(sample_list: SampleDict, model_output: SampleDict
                  ) -> jnp.ndarray:
    """SoftmaxKlDivLoss (losses.py:474-491)."""
    pred = model_output["scores"]
    tar, _ = _normalized_targets(sample_list["targets"])
    loss = _kl_div(jax.nn.log_softmax(pred, axis=1), tar)
    return loss.sum() / loss.shape[0]


@registry.register_loss("wrong")
def wrong(sample_list: SampleDict, model_output: SampleDict) -> jnp.ndarray:
    """WrongLoss (losses.py:494-511): F.kl_div(reduction='mean') — the
    mean is over ALL elements (the 'wrong' normalization the reference
    keeps for backward compatibility), then scaled by the class count."""
    pred = model_output["scores"]
    tar, _ = _normalized_targets(sample_list["targets"])
    log_x = jax.nn.log_softmax(pred, axis=1)
    log_tar = jnp.log(jnp.where(tar == 0, 1.0, tar))
    elem = tar * (log_tar - log_x)
    return elem.mean() * sample_list["targets"].shape[1]


@registry.register_loss("bce_kl_combined")
def bce_kl_combined(sample_list: SampleDict, model_output: SampleDict,
                    weight_softmax: float = 1.0) -> jnp.ndarray:
    """CombinedLoss (losses.py:514-540)."""
    pred = model_output["scores"]
    target = sample_list["targets"]
    tar, _ = _normalized_targets(target)
    loss1 = _kl_div(jax.nn.log_softmax(pred, axis=1), tar)
    loss1 = loss1.sum() / loss1.shape[0]
    loss2 = _bce_with_logits(pred, target).mean() * target.shape[1]
    return weight_softmax * loss1 + loss2


@registry.register_loss("attention_supervision")
def attention_supervision(sample_list: SampleDict,
                          model_output: SampleDict) -> jnp.ndarray:
    """AttentionSupervisionLoss (losses.py:417-450): weighted BCE of the
    first attention map against the supervision map (weight = the
    supervision itself), scaled by its second dim."""
    attn = model_output["attentions"][0]
    sup = sample_list["info"]["attention_supervision"].astype(attn.dtype)
    loss = (_bce(attn, sup) * sup).mean()
    return loss * sup.shape[1]


@registry.register_loss("m4c_decoding_bce_with_mask")
def m4c_decoding_bce_with_mask(sample_list: SampleDict,
                               model_output: SampleDict) -> jnp.ndarray:
    """M4CDecodingBCEWithMaskLoss (losses.py:543-560)."""
    scores = model_output["scores"]
    targets = sample_list["targets"]
    loss_mask = sample_list["train_loss_mask"]
    assert scores.ndim == 3 and loss_mask.ndim == 2
    losses = _bce_with_logits(scores, targets) * loss_mask[..., None]
    count = jnp.maximum(loss_mask.sum(), 1.0)
    return losses.sum() / count


@registry.register_loss("cross_entropy")
def cross_entropy(sample_list: SampleDict, model_output: SampleDict,
                  ignore_index: int = -100,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """CrossEntropyLoss (losses.py:563-572): int-label CE with torch's
    ``ignore_index``/``label_smoothing`` params."""
    scores = model_output["scores"]
    targets = sample_list["targets"]
    valid = targets != ignore_index
    safe = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
    if label_smoothing:
        smooth = -logp.mean(axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    nll = nll * valid
    return nll.sum() / jnp.maximum(valid.sum(), 1)


# ---------------------------------------------------------------------------
# orchestration: Losses / MMFLoss (losses.py:40-189) + multi (:360-414)
# ---------------------------------------------------------------------------

LossSpec = Union[str, Mapping[str, Any]]


def _resolve(spec: LossSpec) -> "MMFLoss":
    return MMFLoss(spec)


class MMFLoss:
    """MMFLoss (losses.py:118-189): resolve a loss by registry name,
    bind its params, and key the value as ``{type}/{dataset}/{name}``."""

    def __init__(self, params: Optional[LossSpec] = None):
        if params is None:
            params = {}
        if isinstance(params, str):
            name = params
        else:
            if "type" not in params:
                raise ValueError(
                    "Parameters to loss must have 'type' field to"
                    "specify type of loss to instantiate")
            name = params["type"]
        self.name = name
        if name == "multi":
            assert not isinstance(params, str)
            self.fn: Callable = _make_multi(params)
        else:
            loss_params = {} if isinstance(params, str) else dict(
                params.get("params", {}) or {})
            fn = registry.get("loss", name)
            self.fn = (functools.partial(fn, **loss_params)
                       if loss_params else fn)

    def __call__(self, sample_list: SampleDict, model_output: SampleDict
                 ) -> Dict[str, jnp.ndarray]:
        loss = self.fn(sample_list, model_output)
        key = "{}/{}/{}".format(sample_list.get("dataset_type", "train"),
                                sample_list.get("dataset_name", "unknown"),
                                self.name)
        return {key: jnp.atleast_1d(loss)}


def _make_multi(params: Mapping[str, Any]) -> Callable:
    """MultiLoss (losses.py:360-414): weighted sum of sub-losses."""
    subs = [(MMFLoss(p), p.get("weight", 1.0)) for p in params["params"]]

    def multi(sample_list: SampleDict, model_output: SampleDict):
        total = 0.0
        for loss_fn, weight in subs:
            (value,) = loss_fn(sample_list, model_output).values()
            total = total + weight * value[0]
        return total

    return multi


class Losses:
    """Losses (losses.py:40-115): instantiate each configured loss and
    merge their keyed values; empty dict when targets are absent."""

    def __init__(self, loss_list: List[LossSpec]):
        self.losses = [MMFLoss(spec) for spec in loss_list]

    def __call__(self, sample_list: SampleDict, model_output: SampleDict
                 ) -> Dict[str, jnp.ndarray]:
        output: Dict[str, jnp.ndarray] = {}
        if "targets" not in sample_list:
            return output
        for loss in self.losses:
            output.update(loss(sample_list, model_output))
        return output
