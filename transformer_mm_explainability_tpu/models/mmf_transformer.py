"""TPU-native MMFTransformer: the generic N-modality transformer.

Re-design of ``VisualBERT/mmf/models/mmf_transformer.py`` (:19-187;
the flatten helpers of mmf/utils/transform.py are plain reshapes
here) and
its huggingface backend
(``mmf/models/transformers/backends/huggingface.py``:
HuggingfaceEmbeddings:18-157, HuggingfaceBackend:162-233).

Each modality gets its own token embedding (word table for text, a
Linear+LN projection for features), its own position table, and a
shared token-type table sized to the modality count; the per-modality
embeddings are layer-normed, concatenated along the sequence axis, and
run through ONE BERT encoder; a BertPooler + PredictionHeadTransform +
linear head produce the scores.

The per-modality loops unroll at trace time — XLA sees one fused
embedding-concat program, not N kernels.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import mmf_layers as L
from transformer_mm_explainability_tpu.ops.attention import gelu, layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class Modality:
    key: str
    type: str                 # "text" | "image" | other feature stream
    segment_id: int = -1      # -1: no token-type embedding added
    embedding_dim: int = 0    # feature dim for non-text modalities
    position_dim: int = 512


@dataclasses.dataclass(frozen=True)
class MMFTransformerConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    num_labels: int = 2
    layer_norm_eps: float = 1e-12
    modalities: Tuple[Modality, ...] = (
        Modality("text", "text", 0),
        Modality("image", "image", 1, embedding_dim=2048),
    )

    def bert_cfg(self) -> jbert.BertConfig:
        return jbert.BertConfig(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=4 * self.hidden_size,
            layer_norm_eps=self.layer_norm_eps)


def init_mmf_transformer(key: jax.Array, cfg: MMFTransformerConfig,
                         dtype=jnp.float32) -> Params:
    D = cfg.hidden_size
    n = len(cfg.modalities)
    ks = jax.random.split(key, 6 + 3 * n)
    nrm = lambda k, s: (jax.random.normal(k, s) * 0.02).astype(dtype)
    per_mod = []
    for i, m in enumerate(cfg.modalities):
        tok = ({"word": nrm(ks[6 + 3 * i], (cfg.vocab_size, D))}
               if m.type == "text"
               else {"proj": L.init_linear(ks[6 + 3 * i], m.embedding_dim,
                                           D, dtype),
                     "proj_ln": {"scale": jnp.ones((D,), dtype),
                                 "bias": jnp.zeros((D,), dtype)}})
        per_mod.append({
            "token": tok,
            "position": nrm(ks[7 + 3 * i], (m.position_dim, D)),
            "ln": {"scale": jnp.ones((D,), dtype),
                   "bias": jnp.zeros((D,), dtype)},
        })
    return {
        "modalities": per_mod,
        "token_type": nrm(ks[0], (n, D)),
        "encoder": jbert.init_encoder_params(ks[1], cfg.bert_cfg(), dtype),
        "pooler": {"w": nrm(ks[2], (D, D)), "b": jnp.zeros((D,), dtype)},
        "classifier": {
            "transform": {"w": nrm(ks[3], (D, D)),
                          "b": jnp.zeros((D,), dtype),
                          "ln": {"scale": jnp.ones((D,), dtype),
                                 "bias": jnp.zeros((D,), dtype)}},
            "out": L.init_linear(ks[4], D, cfg.num_labels, dtype),
        },
    }


def _modality_embedding(p: Params, m: Modality, x: jnp.ndarray,
                        token_type: jnp.ndarray, eps: float) -> jnp.ndarray:
    """HuggingfaceEmbeddings.forward (huggingface.py:132-157) for one
    modality: token + position (+ token_type when segment_id >= 0), LN."""
    if m.type == "text":
        emb = p["token"]["word"][x]
    else:
        emb = L.linear_fwd(p["token"]["proj"], x)
        emb = layer_norm(emb, p["token"]["proj_ln"]["scale"],
                         p["token"]["proj_ln"]["bias"], eps)
    S = emb.shape[1]
    emb = emb + p["position"][jnp.arange(S)][None]
    if m.segment_id >= 0:
        emb = emb + token_type[jnp.full((emb.shape[0], S), m.segment_id)]
    return layer_norm(emb, p["ln"]["scale"], p["ln"]["bias"], eps)


def mmf_transformer_forward(params: Params, cfg: MMFTransformerConfig,
                            inputs: Sequence[jnp.ndarray],
                            masks: Optional[Sequence[Optional[jnp.ndarray]]]
                            = None) -> jnp.ndarray:
    """MMFTransformer.forward (mmf_transformer.py:161-180): embed each
    modality, concat, one encoder, pooler + head → scores [B, L].

    ``inputs[i]``: int token ids [B, S_i] for text modalities, float
    features [B, S_i, embedding_dim] otherwise.  ``masks[i]``: optional
    [B, S_i] {0,1} (defaults to all-ones, base.py semantics)."""
    eps = cfg.layer_norm_eps
    embs, mask_parts = [], []
    for i, m in enumerate(cfg.modalities):
        embs.append(_modality_embedding(params["modalities"][i], m,
                                        inputs[i], params["token_type"],
                                        eps))
        mask = None if masks is None else masks[i]
        if mask is None:
            mask = jnp.ones(embs[-1].shape[:2], jnp.float32)
        mask_parts.append(mask.astype(jnp.float32))
    x = jnp.concatenate(embs, axis=1)
    bias = jbert.extended_attention_mask(
        jnp.concatenate(mask_parts, axis=1))
    seq, _ = jbert.encoder(params["encoder"], x, cfg.bert_cfg(), mask=bias)
    pooled = jnp.tanh(seq[:, 0] @ params["pooler"]["w"].T
                      + params["pooler"]["b"])
    t = params["classifier"]["transform"]
    h = gelu(pooled @ t["w"].T + t["b"])
    h = layer_norm(h, t["ln"]["scale"], t["ln"]["bias"], eps)
    return L.linear_fwd(params["classifier"]["out"], h)
