"""TPU-native MMFBert: the Pythia-skeleton BERT variant (C34).

Re-design of ``VisualBERT/mmf/models/mmf_bert.py`` (MMFBert:19-407):
BERT embeddings → one text self-attention (nn.MultiheadAttention) →
per-stream image cross-attention (text queries over projected image
features, optional intra-image self-attention) → optional
NonLinearElementMultiply combine → BertPooler → one of the heads:
pretraining (BertPreTrainingHeads), VQA/VizWiz (gather the token at
``input_mask.sum()-2``, i.e. the '?' position, then transform+linear),
or NLVR2/visual-entailment (pooled CLS).

All MultiheadAttention blocks map onto the repo's separate-projection
``multi_head_cross_attention`` (torch's fused in_proj splits at
conversion time, like the DETR frontend does).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import mmf_layers as L
from transformer_mm_explainability_tpu.ops.attention import (
    CrossAttentionParams,
    gelu,
    layer_norm,
    multi_head_cross_attention,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MMFBertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    image_feature_dim: int = 2048
    num_image_features: int = 1
    image_intra_attention: bool = False
    combine_embeddings: bool = True
    combine_hidden_dim: int = 768
    training_head_type: str = "vqa2"   # pretraining | vqa2 | vizwiz | nlvr2
    answer_space_size: int = 3129
    layer_norm_eps: float = 1e-12


def _init_mha(key: jax.Array, d: int, dtype) -> CrossAttentionParams:
    ks = jax.random.split(key, 4)
    u = lambda k: (jax.random.normal(k, (d, d)) * 0.02).astype(dtype)
    z = jnp.zeros((d,), dtype)
    return CrossAttentionParams(w_q=u(ks[0]), b_q=z, w_k=u(ks[1]), b_k=z,
                                w_v=u(ks[2]), b_v=z, w_out=u(ks[3]),
                                b_out=z)


def init_mmf_bert(key: jax.Array, cfg: MMFBertConfig,
                  dtype=jnp.float32) -> Params:
    D = cfg.hidden_size
    bert_cfg = jbert.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=D,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps)
    ks = jax.random.split(key, 10 + cfg.num_image_features)
    nrm = lambda k, s: (jax.random.normal(k, s) * 0.02).astype(dtype)
    params: Params = {
        "embeddings": jbert.init_embedding_params(ks[0], bert_cfg, dtype),
        "text_attention": _init_mha(ks[1], D, dtype),
        "image_projection": L.init_linear(ks[2], cfg.image_feature_dim, D,
                                          dtype),
        "image_attentions": [_init_mha(ks[10 + i], D, dtype)
                             for i in range(cfg.num_image_features)],
        "pooler": {"w": nrm(ks[3], (D, D)), "b": jnp.zeros((D,), dtype)},
        "classifier": {
            "transform": {"w": nrm(ks[4], (D, D)),
                          "b": jnp.zeros((D,), dtype),
                          "ln": {"scale": jnp.ones((D,), dtype),
                                 "bias": jnp.zeros((D,), dtype)}},
            "out": L.init_linear(ks[5], D, cfg.answer_space_size, dtype),
        },
        "cls": {
            "transform": {"w": nrm(ks[6], (D, D)),
                          "b": jnp.zeros((D,), dtype),
                          "ln": {"scale": jnp.ones((D,), dtype),
                                 "bias": jnp.zeros((D,), dtype)}},
            "decoder_bias": jnp.zeros((cfg.vocab_size,), dtype),
            "seq_relationship": L.init_linear(ks[7], D, 2, dtype),
        },
    }
    if cfg.image_intra_attention:
        params["image_intra_attention"] = _init_mha(ks[8], D, dtype)
    if cfg.combine_embeddings:
        params["combine"] = L.init_non_linear_element_multiply(
            ks[9], D, D, cfg.combine_hidden_dim, dtype=dtype)
    return params


def _pad_bias(key_padding_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """torch key_padding_mask (True = ignore) → additive [B,1,1,S]."""
    if key_padding_mask is None:
        return None
    return jnp.where(key_padding_mask[:, None, None, :], -jnp.inf, 0.0)


def mmf_bert_encode(params: Params, cfg: MMFBertConfig,
                    input_ids: jnp.ndarray, input_mask: jnp.ndarray,
                    segment_ids: jnp.ndarray,
                    image_features: Sequence[jnp.ndarray]
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mmf_bert.py:285-337 up to the joint embedding: returns
    (joint_embedding [B,S,D], text_embedding_total)."""
    eps = cfg.layer_norm_eps
    emb = params["embeddings"]
    T = input_ids.shape[1]
    text = (emb["word"][input_ids] + emb["position"][jnp.arange(T)][None]
            + emb["token_type"][segment_ids])
    text = layer_norm(text, emb["ln"]["scale"], emb["ln"]["bias"], eps)
    pad = input_mask == 0
    text_total, _ = multi_head_cross_attention(
        params["text_attention"], text, text, cfg.num_attention_heads,
        mask=_pad_bias(pad))

    # the reference forward passes no key_padding_mask to the image
    # attentions (mmf_bert.py:322-324 → process_feature_embedding
    # default None), so image keys are unmasked
    feats = []
    for p_attn, feat in zip(params["image_attentions"], image_features):
        enc = L.linear_fwd(params["image_projection"], feat)
        if cfg.image_intra_attention:
            enc, _ = multi_head_cross_attention(
                params["image_intra_attention"], enc, enc,
                cfg.num_attention_heads)
        out, _ = multi_head_cross_attention(
            p_attn, text_total, enc, cfg.num_attention_heads)
        feats.append(out)
    image_total = jnp.concatenate(feats, axis=1)

    if cfg.combine_embeddings:
        joint = L.non_linear_element_multiply_fwd(params["combine"],
                                                  image_total, text_total)
    else:
        joint = image_total
    return joint, text_total


def _transform(p, x, eps):
    h = gelu(x @ p["w"].T + p["b"])
    return layer_norm(h, p["ln"]["scale"], p["ln"]["bias"], eps)


def mmf_bert_forward(params: Params, cfg: MMFBertConfig,
                     input_ids: jnp.ndarray, input_mask: jnp.ndarray,
                     segment_ids: jnp.ndarray,
                     image_features: Sequence[jnp.ndarray]):
    """mmf_bert.py:285-407: head dispatch on training_head_type."""
    eps = cfg.layer_norm_eps
    joint, _ = mmf_bert_encode(params, cfg, input_ids, input_mask,
                               segment_ids, image_features)
    pooled = jnp.tanh(joint[:, 0] @ params["pooler"]["w"].T
                      + params["pooler"]["b"])
    if "pretraining" in cfg.training_head_type:
        h = _transform(params["cls"]["transform"], joint, eps)
        lm_logits = h @ params["embeddings"]["word"].T \
            + params["cls"]["decoder_bias"]
        seq_rel = L.linear_fwd(params["cls"]["seq_relationship"], pooled)
        return lm_logits, seq_rel
    if cfg.training_head_type in ("vqa2", "vqa", "vizwiz"):
        # the '?' token sits at input_mask.sum()-2 (mmf_bert.py:381-394)
        idx = input_mask.sum(1) - 2
        gathered = jnp.take_along_axis(joint, idx[:, None, None], axis=1)
        h = _transform(params["classifier"]["transform"], gathered, eps)
        return L.linear_fwd(params["classifier"]["out"],
                            h).reshape(-1, cfg.answer_space_size)
    # nlvr2 / visual_entailment: pooled CLS
    h = _transform(params["classifier"]["transform"], pooled, eps)
    return L.linear_fwd(params["classifier"]["out"], h)
