"""DETR explanation generators (encoder-decoder relevancy).

Reference: DETR/modules/ExplanationGenerator.py.

``generate_ours`` (:142-195, use_lrp=False path):
  R_ii = I; 6 encoder layers: R_ii += Ê R_ii
  R_qq = I, R_qi = 0; per decoder layer: rules 6+7 on the query
  self-attention, then rule 10 (with NaN→0 guard, :42) on the
  cross-attention; output row R_qi[target_query].

The reference re-runs a full fwd+bwd per kept detection (SURVEY.md
§3.3 "HOT INNER LOOP"); here all K explained queries share ONE forward
of the image and a vmapped VJP over K one-hot cotangents
(models/detr.capture_multi) — K relevancy maps per XLA dispatch at the
cost of 1 forward + one K-batched backward. The LRP variants likewise
tape the transformer once and vmap the per-query relprop over the K
relevance seeds.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import detr as detr_model
from transformer_mm_explainability_tpu.models.detr import DETRTaps
from transformer_mm_explainability_tpu.ops import relevancy as rl


def _avg(cam, grad):
    # Ê and both carries accumulate in fp32 regardless of the capture
    # dtype (same resolution as ops/relevancy.py rules 6+7 and the
    # sharded counterpart parallel/sp.sp_detr_relevancy)
    prod = grad.astype(jnp.float32) * cam.astype(jnp.float32)
    return jnp.maximum(prod, 0.0).mean(axis=0)


def relevancy_from_capture(
    attn: DETRTaps, grads: DETRTaps,
    normalize_self_attention: bool = True,
    apply_self_in_rule_10: bool = True,
    aggregate: bool = True,
    token_valid: Optional[jnp.ndarray] = None,  # [S] 1=real token
) -> jnp.ndarray:
    """Per-example propagation → full R_q_i [Q, S]. attn/grads leaves
    are per-example ([L, H, ...]).

    ``token_valid`` marks the real (non-padded) encoder tokens: padded
    rows of R_ii stay identity rows whose plain eq.-8+9 division would
    be 0/0 — without the mask one padded token NaN-poisons the rule-10
    matmul and the nan→0 guard wipes EVERY cross-attention addition
    (see ops/relevancy.handle_residual)."""
    S = attn.enc_self.shape[-1]
    Q = attn.dec_self.shape[-1]
    dt = jnp.float32

    def enc_step(R_ii, x):
        cam, grad = x
        add = _avg(cam, grad) @ R_ii
        return (R_ii + add if aggregate else add), None

    R_ii, _ = jax.lax.scan(enc_step, jnp.eye(S, dtype=dt),
                           (attn.enc_self, grads.enc_self))

    def dec_step(carry, x):
        R_qq, R_qi = carry
        (c_s, g_s), (c_x, g_x) = x
        e = _avg(c_s, g_s)
        add_qq, add_qi = rl.apply_self_attention_rules(R_qq, R_qi, e)
        if aggregate:
            R_qq, R_qi = R_qq + add_qq, R_qi + add_qi
        else:
            R_qq, R_qi = add_qq, add_qi
        cam_qi = _avg(c_x, g_x)
        add_qi, _ = rl.apply_mm_attention_rules(
            R_qq, R_ii, cam_qi,
            apply_normalization=normalize_self_attention,
            apply_self_in_rule_10=apply_self_in_rule_10,
            nan_to_zero=True,
            q_valid=token_valid,
        )
        R_qi = (R_qi + add_qi) if aggregate else add_qi
        return (R_qq, R_qi), None

    (R_qq, R_qi), _ = jax.lax.scan(
        dec_step,
        (jnp.eye(Q, dtype=dt), jnp.zeros((Q, S), dt)),
        ((attn.dec_self, grads.dec_self), (attn.dec_cross, grads.dec_cross)),
    )
    return R_qi


def _per_example(attn: DETRTaps, grads: DETRTaps, fn):
    batchify = lambda t: DETRTaps(*(jnp.moveaxis(a, 1, 0) for a in t))
    return jax.vmap(fn)(batchify(attn), batchify(grads))


def _sp_relevancy(attn: DETRTaps, grads: DETRTaps, mesh, sp_axis,
                  normalize_self_attention, apply_self_in_rule_10,
                  aggregate, token_valid):
    """Route the propagation chain through the sequence-parallel layout
    (parallel/sp.sp_detr_relevancy): the [L, K, H, S, S] encoder taps
    and the [S, S] carry are row-sharded over ``mesh[sp_axis]`` — the
    memory/bandwidth win for DETR's S ≈ 1900 at protocol 800px."""
    from transformer_mm_explainability_tpu.parallel import sp as psp

    batchify = lambda t: DETRTaps(*(jnp.moveaxis(a, 1, 0) for a in t))
    a, g = batchify(attn), batchify(grads)
    return psp.sp_detr_relevancy(
        a.enc_self, g.enc_self, a.dec_self, g.dec_self,
        a.dec_cross, g.dec_cross, mesh, axis=sp_axis,
        normalize_self_attention=normalize_self_attention,
        apply_self_in_rule_10=apply_self_in_rule_10,
        aggregate=aggregate, token_valid=token_valid)


def _token_valid(image: jnp.ndarray, pad_valid, cfg) -> Optional[jnp.ndarray]:
    """pad_valid [H, W] → flattened [S] encoder-token mask, the same
    strided downsample the captured forward uses (models/detr.forward)."""
    if pad_valid is None:
        return None
    Him, Wim = image.shape[:2]
    stride = 16 if cfg.dilation else 32
    Hf, Wf = Him // stride, Wim // stride
    return pad_valid[::Him // Hf, ::Wim // Wf][:Hf, :Wf].reshape(-1)


def generate_ours(
    params: Dict[str, Any],
    image: jnp.ndarray,                 # [H, W, 3]
    target_queries: jnp.ndarray,        # [K] query indices
    target_classes: jnp.ndarray,        # [K] class indices
    cfg: detr_model.DETRConfig = detr_model.DETR_R50,
    pad_valid: Optional[jnp.ndarray] = None,  # [H, W] 1=valid
    normalize_self_attention: bool = True,
    apply_self_in_rule_10: bool = True,
    mesh=None,
    sp_axis: str = "tp",
) -> jnp.ndarray:
    """K relevancy rows [K, S]: one shared forward + K-batched VJP.

    With ``mesh`` set, the O(S²) propagation chain runs sequence-parallel
    over ``mesh[sp_axis]`` (parallel/sp.py) — identical math, row-sharded
    taps and carry."""
    oh = _one_hots(target_queries, target_classes, cfg)
    _, attn, grads = detr_model.capture_multi(params, image, oh,
                                              pad_valid, cfg)
    tv = _token_valid(image, pad_valid, cfg)
    if mesh is not None:
        R_qi = _sp_relevancy(attn, grads, mesh, sp_axis,
                             normalize_self_attention,
                             apply_self_in_rule_10, True, tv)
    else:
        R_qi = _per_example(
            attn, grads,
            lambda a, g: relevancy_from_capture(
                a, g, normalize_self_attention, apply_self_in_rule_10,
                token_valid=tv))
    return jnp.take_along_axis(R_qi, target_queries[:, None, None],
                               axis=1)[:, 0]


def generate_ours_no_agg(params, image, target_queries, target_classes,
                         cfg=detr_model.DETR_R50, pad_valid=None,
                         normalize_self_attention: bool = False,
                         mesh=None, sp_axis: str = "tp"):
    """Ablation: overwrite instead of aggregate
    (GeneratorAlbationNoAgg, ExplanationGenerator.py:310-403)."""
    oh = _one_hots(target_queries, target_classes, cfg)
    _, attn, grads = detr_model.capture_multi(params, image, oh,
                                              pad_valid, cfg)
    tv = _token_valid(image, pad_valid, cfg)
    if mesh is not None:
        R_qi = _sp_relevancy(attn, grads, mesh, sp_axis,
                             normalize_self_attention, True, False, tv)
    else:
        R_qi = _per_example(
            attn, grads,
            lambda a, g: relevancy_from_capture(
                a, g, normalize_self_attention, True, aggregate=False,
                token_valid=tv))
    return jnp.take_along_axis(R_qi, target_queries[:, None, None],
                               axis=1)[:, 0]


def _one_hots(target_queries, target_classes, cfg):
    """[K, Q, C+1] per-query class one-hots (the VJP cotangents)."""
    K = target_queries.shape[0]
    one_hot = jax.nn.one_hot(target_classes, cfg.num_classes + 1)
    oh = jnp.zeros((K, cfg.num_queries, cfg.num_classes + 1))
    return oh.at[jnp.arange(K), target_queries].set(one_hot)


def _relprop_cams(params, image, oh, cfg, pad_valid=None):
    """LRP relprop cams for K per-query seeds: the transformer is taped
    ONCE (B=1) and the per-query relprop vmaps over the K one-hot
    relevance seeds (models/detr_lrp.relprop)."""
    from transformer_mm_explainability_tpu.models import detr_lrp
    from transformer_mm_explainability_tpu.models import resnet

    feats = resnet.forward(params["backbone"], image[None],
                           dilation_last=cfg.dilation)
    _, Hf, Wf, C = feats.shape
    src = feats.reshape(1, Hf * Wf, C) @ params["input_proj"]["w"] \
        + params["input_proj"]["b"]
    valid = (jnp.ones((1, Hf, Wf)) if pad_valid is None else
             pad_valid[None][:, ::image.shape[0] // Hf,
                             ::image.shape[1] // Wf]
             [:, :Hf, :Wf].astype(jnp.float32))
    pos = detr_model.sine_position_encoding(valid, cfg.d_model // 2)
    pos = pos.reshape(1, Hf * Wf, cfg.d_model)
    # same key-padding bias as the captured forward — the relprop tape
    # must come from the SAME program the gradients came from
    bias = (None if pad_valid is None else
            ((1.0 - valid.reshape(1, Hf * Wf)) * -1e9)
            [:, None, None, :])
    hs, _, _, tape = detr_model.transformer_forward(
        params, src, pos, bias, cfg,
        detr_model.zero_taps(cfg, 1, Hf * Wf), return_tape=True)

    def one(oh_k):
        _, cams = detr_lrp.relprop(params, tape, hs, oh_k[None], cfg)
        return cams

    cams_k = jax.vmap(one)(oh)                     # leaves [K, L, 1, ...]
    return DETRTaps(*(jnp.moveaxis(c[:, :, 0], 0, 1) for c in cams_k))


def generate_ours_lrp(
    params, image, target_queries, target_classes,
    cfg=detr_model.DETR_R50, pad_valid=None,
    normalize_self_attention: bool = True,
    apply_self_in_rule_10: bool = True,
    mesh=None, sp_axis: str = "tp",
):
    """'ours_with_lrp' (ExplanationGenerator.py:142-195 use_lrp=True):
    the propagation chain consumes relprop cams instead of raw A."""
    oh = _one_hots(target_queries, target_classes, cfg)
    _, attn, grads = detr_model.capture_multi(params, image, oh,
                                              pad_valid, cfg)
    cams = _relprop_cams(params, image, oh, cfg, pad_valid)
    tv = _token_valid(image, pad_valid, cfg)
    if mesh is not None:
        R_qi = _sp_relevancy(cams, grads, mesh, sp_axis,
                             normalize_self_attention,
                             apply_self_in_rule_10, True, tv)
    else:
        R_qi = _per_example(
            cams, grads,
            lambda a, g: relevancy_from_capture(
                a, g, normalize_self_attention, apply_self_in_rule_10,
                token_valid=tv))
    return jnp.take_along_axis(R_qi, target_queries[:, None, None],
                               axis=1)[:, 0]


# the reference mask generator's --method family
# (DETR/mask_generator.py:95-115)
DETR_METHODS = (
    "ours_with_lrp", "ours_no_lrp", "ours_no_lrp_no_norm",
    "ablation_no_self_in_10", "ablation_no_aggregation",
    "transformer_att", "partial_lrp", "raw_attn", "attn_gradcam",
    "rollout",
)


def generate(method: str, params, image, target_queries, target_classes,
             cfg=detr_model.DETR_R50, pad_valid=None,
             mesh=None, sp_axis: str = "tp") -> jnp.ndarray:
    """Dispatch any reference method name → [K, S] relevancy rows
    (mask_generator.py:95-115). With ``mesh``, the "ours" family's
    O(S²) propagation runs sequence-parallel over ``mesh[sp_axis]``."""
    args = (params, image, target_queries, target_classes, cfg, pad_valid)
    sp = dict(mesh=mesh, sp_axis=sp_axis)
    if method == "ours_no_lrp":
        return generate_ours(*args, **sp)
    if method == "ours_no_lrp_no_norm":
        return generate_ours(*args, normalize_self_attention=False, **sp)
    if method == "ablation_no_self_in_10":
        return generate_ours(*args, apply_self_in_rule_10=False, **sp)
    if method == "ablation_no_aggregation":
        return generate_ours_no_agg(*args, **sp)
    if method == "ours_with_lrp":
        return generate_ours_lrp(*args, **sp)
    if method not in DETR_METHODS:
        raise ValueError(
            f"unknown DETR explanation method {method!r}; valid: "
            f"{sorted(DETR_METHODS)}")
    oh = _one_hots(target_queries, target_classes, cfg)
    if method != "partial_lrp":
        # partial_lrp consumes relprop cams only — skip the capture
        # whose attn/grads it would never read
        _, attn, grads = detr_model.capture_multi(params, image, oh,
                                                  pad_valid, cfg)
    if method == "raw_attn":
        return generate_raw_attn(attn, target_queries)
    if method == "attn_gradcam":
        return generate_attn_gradcam(attn, grads, target_queries)
    if method == "rollout":
        return generate_rollout(attn, target_queries)
    cams = _relprop_cams(params, image, oh, cfg, pad_valid)
    if method == "transformer_att":
        return generate_transformer_att(cams, grads, target_queries)
    return generate_partial_lrp(cams, target_queries)  # partial_lrp


def generate_transformer_att(cams, grads, target_queries: jnp.ndarray
                             ) -> jnp.ndarray:
    """transformer_att baseline (:64-108): avg_heads of the LAST decoder
    cross-attention's (LRP cam ⊙ grad)."""
    cam = jax.vmap(_avg)(cams.dec_cross[-1], grads.dec_cross[-1])
    return jnp.take_along_axis(cam, target_queries[:, None, None],
                               axis=1)[:, 0]


def generate_partial_lrp(cams, target_queries: jnp.ndarray) -> jnp.ndarray:
    """partial_lrp (:197-224): head-mean of the last decoder cross cam,
    min-max normalised."""
    cam = cams.dec_cross[-1].mean(axis=1)  # [B, Q, S]
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    cam = (cam - lo) / (hi - lo)
    return jnp.take_along_axis(cam, target_queries[:, None, None],
                               axis=1)[:, 0]


# --- capture-only baselines (one fwd, optional one bwd) -------------------

def generate_raw_attn(attn: DETRTaps, target_queries: jnp.ndarray
                      ) -> jnp.ndarray:
    """Head-mean of the last decoder cross-attention (:226-238)."""
    cam = attn.dec_cross[-1].mean(axis=1)  # [B, Q, S]
    return jnp.take_along_axis(cam, target_queries[:, None, None],
                               axis=1)[:, 0]


def generate_attn_gradcam(attn: DETRTaps, grads: DETRTaps,
                          target_queries: jnp.ndarray) -> jnp.ndarray:
    """GradCAM on the last decoder cross-attention (:282-305)."""
    cam = jax.vmap(rl.grad_cam)(attn.dec_cross[-1], grads.dec_cross[-1])
    return jnp.take_along_axis(cam, target_queries[:, None, None],
                               axis=1)[:, 0]


def generate_rollout(attn: DETRTaps, target_queries: jnp.ndarray
                     ) -> jnp.ndarray:
    """Rollout baseline (:240-273): separate image/query rollouts bridged
    by the last cross-attention head-mean."""
    def per_example(a: DETRTaps):
        R_ii = rl.compute_rollout_attention(a.enc_self.mean(axis=1))
        R_qq = rl.compute_rollout_attention(a.dec_self.mean(axis=1))
        cam_qi = a.dec_cross[-1].mean(axis=0)
        return R_qq.T @ (cam_qi @ R_ii)

    batchify = lambda t: DETRTaps(*(jnp.moveaxis(x, 1, 0) for x in t))
    R_qi = jax.vmap(per_example)(batchify(attn))
    return jnp.take_along_axis(R_qi, target_queries[:, None, None],
                               axis=1)[:, 0]
