"""LXMERT pretraining heads + losses (C36: pretrain/lxmert_pretrain.py
and lxmert_lrp.py:941-1120 heads).

Tasks (lxmert_pretrain.py:435 config): masked LM (tied decoder over the
word embeddings), visual feature regression (SmoothL1), visual object
classification (CE over detector classes), cross-modality matching, and
QA — assembled into one jitted loss.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from transformer_mm_explainability_tpu.models import lxmert as lx
from transformer_mm_explainability_tpu.ops.attention import gelu, layer_norm


def init_head_params(key: jax.Array, cfg: lx.LxmertConfig,
                     num_object_labels: int = 1600,
                     dtype=jnp.float32) -> Dict[str, Any]:
    D = cfg.hidden_size
    ks = jax.random.split(key, 6)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    zeros = lambda s: jnp.zeros(s, dtype)
    ones = lambda s: jnp.ones(s, dtype)
    return {
        "lm_transform": {"w": nrm(ks[0], (D, D)), "b": zeros((D,)),
                         "ln": {"scale": ones((D,)), "bias": zeros((D,))}},
        "lm_bias": zeros((cfg.vocab_size,)),
        "obj_transform": {"w": nrm(ks[1], (D, D)), "b": zeros((D,)),
                          "ln": {"scale": ones((D,)), "bias": zeros((D,))}},
        "obj_decoder": {"w": nrm(ks[2], (D, num_object_labels)),
                        "b": zeros((num_object_labels,))},
        "feat_decoder": {"w": nrm(ks[3], (D, cfg.visual_feat_dim)),
                         "b": zeros((cfg.visual_feat_dim,))},
        "matching": {"w": nrm(ks[4], (D, 2)), "b": zeros((2,))},
    }


def _transform(p, x, eps):
    h = gelu(x @ p["w"] + p["b"])
    return layer_norm(h, p["ln"]["scale"], p["ln"]["bias"], eps)


def lm_logits(head_params, word_embedding: jnp.ndarray,
              lang_output: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Masked-LM head with the decoder TIED to the word embeddings
    (lxmert_lrp.py LxmertLMPredictionHead :924-938)."""
    h = _transform(head_params["lm_transform"], lang_output, eps)
    return h @ word_embedding.T + head_params["lm_bias"]


def pretrain_loss(
    params: Dict[str, Any],
    head_params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    cfg: lx.LxmertConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Batch fields: input_ids, attention_mask, visual_feats, visual_pos,
    masked_lm_labels (-100 = unmasked), obj_labels [B, Sv] (-100 pad),
    feat_targets [B, Sv, feat_dim], feat_mask [B, Sv],
    matched_label [B] {0, 1}, ans [B] (-100 = no answer)."""
    eps = cfg.layer_norm_eps
    out = lx.forward(params, batch["input_ids"], batch["attention_mask"],
                     batch["visual_feats"], batch["visual_pos"], cfg=cfg)
    losses: Dict[str, jnp.ndarray] = {}

    # masked LM
    lm = lm_logits(head_params, params["embeddings"]["word"],
                   out["lang_output"], eps)
    labels = batch["masked_lm_labels"]
    lm_mask = labels != -100
    ce = optax.softmax_cross_entropy_with_integer_labels(
        lm, jnp.clip(labels, 0))
    losses["masked_lm"] = jnp.where(lm_mask, ce, 0.0).sum() / jnp.maximum(
        lm_mask.sum(), 1)

    # visual object classification + feature regression
    h_obj = _transform(head_params["obj_transform"], out["visn_output"], eps)
    obj_logits = h_obj @ head_params["obj_decoder"]["w"] \
        + head_params["obj_decoder"]["b"]
    obj_labels = batch["obj_labels"]
    obj_mask = obj_labels != -100
    obj_ce = optax.softmax_cross_entropy_with_integer_labels(
        obj_logits, jnp.clip(obj_labels, 0))
    losses["obj_predict"] = jnp.where(obj_mask, obj_ce, 0.0).sum() / \
        jnp.maximum(obj_mask.sum(), 1)

    feat_pred = h_obj @ head_params["feat_decoder"]["w"] \
        + head_params["feat_decoder"]["b"]
    l1 = optax.huber_loss(feat_pred, batch["feat_targets"], delta=1.0).sum(-1)
    fm = batch["feat_mask"]
    losses["feat_regress"] = (l1 * fm).sum() / jnp.maximum(fm.sum(), 1)

    # cross-modality matching (on the pooled CLS)
    match_logits = out["pooled"] @ head_params["matching"]["w"] \
        + head_params["matching"]["b"]
    losses["matched"] = optax.softmax_cross_entropy_with_integer_labels(
        match_logits, batch["matched_label"]).mean()

    # QA (only where an answer exists AND the pair is matched)
    ans = batch["ans"]
    qa_mask = (ans != -100) & (batch["matched_label"] == 1)
    qa_ce = optax.softmax_cross_entropy_with_integer_labels(
        out["qa_scores"], jnp.clip(ans, 0))
    losses["qa"] = jnp.where(qa_mask, qa_ce, 0.0).sum() / jnp.maximum(
        qa_mask.sum(), 1)

    total = sum(losses.values())
    return total, losses
