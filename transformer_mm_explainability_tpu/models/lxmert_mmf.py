"""The MMF-side LXMERT model — registry name ``lxmert-old``
(VisualBERT/mmf/models/lxmert.py:633-774).

The reference's ``lxmert-old`` is a re-packaging of the airsplay LXMERT
encoder inside MMF: ``LXMERTForPretraining`` (lxmert.py:401-558, masked
LM + obj-predict + matched + QA heads) and ``LXMERTForClassification``
(lxmert.py:560-631, a ``BertVisualAnswerHead`` over the pooled CLS with
the nlvr2 pair-doubling). This module builds both on top of the
existing functional encoder (``models/lxmert.py``) and pretraining
heads (``models/lxmert_pretrain.py``) instead of duplicating them —
the backbone math is identical (LXMERTBase == LxmertModel).

All heads take explicit arrays; MMF's ``sample_list`` plumbing maps
onto the ``batch`` dict (input_ids, segment_ids→token_type_ids,
input_mask→attention_mask, image_feature_0→visual_feats,
image_info_0.bbox→visual_pos).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from transformer_mm_explainability_tpu.models import lxmert as lx
from transformer_mm_explainability_tpu.models import lxmert_pretrain as lxp
from transformer_mm_explainability_tpu.ops.attention import gelu, layer_norm


@dataclasses.dataclass(frozen=True)
class LxmertOldConfig:
    """configs/models/lxmert/pretrain.yaml defaults, reference
    lxmert.py:642-708 ``build``."""
    lxmert: lx.LxmertConfig = lx.LXMERT_VQA
    training_head_type: str = "pretraining"  # | "vqa2" | "gqa" | "nlvr2"
    num_labels: int = 3129
    gqa_labels: int = 1842
    num_object_labels: int = 1600
    task_mask_lm: bool = True
    task_obj_predict: bool = True
    task_matched: bool = True
    task_qa: bool = True


def _init_logit_fc(key: jax.Array, in_dim: int, hid: int, out_dim: int,
                   dtype) -> Dict[str, Any]:
    """BertVisualAnswerHead's logit_fc: Linear(in, 2*hid) → GeLU →
    LayerNorm → Linear(2*hid, out) (lxmert.py:133-139)."""
    k1, k2 = jax.random.split(key)
    nrm = lambda k, s: (jax.random.normal(k, s) * 0.02).astype(dtype)
    return {
        "w1": nrm(k1, (in_dim, hid * 2)), "b1": jnp.zeros((hid * 2,), dtype),
        "ln": {"scale": jnp.ones((hid * 2,), dtype),
               "bias": jnp.zeros((hid * 2,), dtype)},
        "w2": nrm(k2, (hid * 2, out_dim)), "b2": jnp.zeros((out_dim,), dtype),
    }


def _logit_fc_fwd(p: Dict[str, Any], x: jnp.ndarray,
                  eps: float) -> jnp.ndarray:
    h = gelu(x @ p["w1"] + p["b1"])
    h = layer_norm(h, p["ln"]["scale"], p["ln"]["bias"], eps)
    return h @ p["w2"] + p["b2"]


def init_params(key: jax.Array, cfg: LxmertOldConfig = LxmertOldConfig(),
                dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    D = cfg.lxmert.hidden_size
    params: Dict[str, Any] = {"bert": lx.init_params(k1, cfg.lxmert, dtype)}
    if cfg.training_head_type == "pretraining":
        params["heads"] = lxp.init_head_params(
            k2, cfg.lxmert, cfg.num_object_labels, dtype)
        if cfg.task_qa:
            # BertVisualAnswerHead with the gqa twin (lxmert.py:124-131)
            params["answer_head"] = _init_logit_fc(
                k3, D, D, cfg.num_labels, dtype)
            params["answer_head_gqa"] = _init_logit_fc(
                k4, D, D, cfg.gqa_labels, dtype)
    else:
        in_dim = D * 2 if cfg.training_head_type == "nlvr2" else D
        out_dim = 2 if cfg.training_head_type == "nlvr2" else cfg.num_labels
        params["classifier"] = _init_logit_fc(k2, in_dim, D, out_dim, dtype)
    return params


def _backbone(params, batch: Dict[str, jnp.ndarray],
              cfg: LxmertOldConfig) -> Dict[str, Any]:
    return lx.forward(
        params["bert"],
        batch["input_ids"],
        batch["input_mask"],
        batch["image_feature_0"],
        batch["bbox"],
        token_type_ids=batch.get("segment_ids"),
        visual_mask=batch.get("image_mask"),
        cfg=cfg.lxmert,
    )


def forward_classification(params: Dict[str, Any],
                           batch: Dict[str, jnp.ndarray],
                           cfg: LxmertOldConfig) -> Dict[str, jnp.ndarray]:
    """LXMERTForClassification.forward (lxmert.py:591-631): pooled CLS
    → BertVisualAnswerHead; nlvr2 concatenates the image-pair pooled
    vectors before the head."""
    out = _backbone(params, batch, cfg)
    pooled = out["pooled"]
    if cfg.training_head_type == "nlvr2":
        pooled = pooled.reshape(-1, pooled.shape[-1] * 2)
    scores = _logit_fc_fwd(params["classifier"], pooled,
                           cfg.lxmert.layer_norm_eps)
    return {"scores": scores}


def _masked_ce(logits: jnp.ndarray, labels: jnp.ndarray,
               ignore_index: int = -1) -> jnp.ndarray:
    """CrossEntropyLoss(ignore_index=-1) over flattened logits/labels."""
    logits = logits.reshape(-1, logits.shape[-1])
    labels = labels.reshape(-1)
    mask = labels != ignore_index
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.clip(labels, 0))
    return jnp.where(mask, ce, 0.0).sum() / jnp.maximum(mask.sum(), 1)


def forward_pretraining(params: Dict[str, Any],
                        batch: Dict[str, jnp.ndarray],
                        cfg: LxmertOldConfig,
                        name: Optional[str] = None
                        ) -> Dict[str, jnp.ndarray]:
    """LXMERTForPretraining.forward (lxmert.py:462-558) → loss dict with
    the reference's keys. Optional batch fields (``None``/absent skips
    the task, like the reference's None-label guards):

      masked_lm_labels [B, St] (-1 = unmasked), matched_label [B],
      obj_labels [B, Sv, C] soft detector scores, masked_image_labels
      [B, Sv] (1 = masked), ans [B, A] soft answer scores.
    """
    eps = cfg.lxmert.layer_norm_eps
    out = _backbone(params, batch, cfg)
    heads = params["heads"]
    output: Dict[str, jnp.ndarray] = {}

    if cfg.task_qa and "ans" in batch:
        head = (params["answer_head_gqa"] if name is not None
                and "gqa" in name else params["answer_head"])
        answer_score = _logit_fc_fwd(head, out["pooled"], eps)
        output["answer_loss"] = _masked_ce(
            answer_score, batch["ans"].argmax(-1))
    if cfg.task_mask_lm and "masked_lm_labels" in batch:
        lm = lxp.lm_logits(heads, params["bert"]["embeddings"]["word"],
                           out["lang_output"], eps)
        output["masked_lm_loss"] = _masked_ce(lm, batch["masked_lm_labels"])
    if cfg.task_matched and "matched_label" in batch:
        match_logits = out["pooled"] @ heads["matching"]["w"] \
            + heads["matching"]["b"]
        output["matched_loss"] = _masked_ce(match_logits,
                                            batch["matched_label"])
    if cfg.task_obj_predict and "obj_labels" in batch:
        # visual_losses obj (CE vs argmax, weighted by max confidence)
        # + feat (SmoothL1 vs the input features on masked positions),
        # lxmert.py:521-556
        h_obj = lxp._transform(heads["obj_transform"], out["visn_output"],
                               eps)
        obj_logits = h_obj @ heads["obj_decoder"]["w"] \
            + heads["obj_decoder"]["b"]
        conf = batch["obj_labels"].max(-1)
        idx = batch["obj_labels"].argmax(-1)
        obj_ce = optax.softmax_cross_entropy_with_integer_labels(
            obj_logits.reshape(-1, obj_logits.shape[-1]), idx.reshape(-1))
        visn_loss = (obj_ce * conf.reshape(-1)).mean()
        if "masked_image_labels" in batch:
            feat_pred = h_obj @ heads["feat_decoder"]["w"] \
                + heads["feat_decoder"]["b"]
            l1 = optax.huber_loss(feat_pred, batch["image_feature_0"],
                                  delta=1.0).mean(-1)
            mask_conf = (batch["masked_image_labels"] == 1).astype(l1.dtype)
            visn_loss = visn_loss + (l1.reshape(-1)
                                     * mask_conf.reshape(-1)).mean()
        output["visn_loss"] = visn_loss
    return output


def forward(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
            cfg: LxmertOldConfig = LxmertOldConfig(),
            name: Optional[str] = None) -> Dict[str, jnp.ndarray]:
    """LXMERT.forward dispatch (lxmert.py:710-774)."""
    if cfg.training_head_type == "pretraining":
        return forward_pretraining(params, batch, cfg, name)
    return forward_classification(params, batch, cfg)
