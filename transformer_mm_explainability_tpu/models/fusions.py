"""TPU-native MMF fusion + unimodal baselines.

Re-designs of ``VisualBERT/mmf/models/fusions.py`` (FusionBase:13-54,
ConcatBERT:57-113, ConcatBoW:116-148, LateFusion:151-194) and
``mmf/models/unimodal.py`` (UnimodalBase:13-38, UnimodalText:41-70,
UnimodalModal:73-106).

Text side: either the repo's functional BERT (pooled output, the
"transformer" text encoder) or a bag-of-words embedding reduction
(``TextEmbeddingEncoder`` with a vocab embedding + sum/mean operator,
encoders.py:266-295).  Modal side: pre-extracted features (the
direct-features path) — image pixels go through the separately-built
ResNet frontend (``models/resnet.py``) when needed, mirroring how this
repo treats every detector/CNN frontend.

Each model is cfg + init + pure forward; classifier is the MMF "mlp"
type (mmf_layers.init_mlp_classifier).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import mmf_layers as L

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    # text side
    text_encoder: str = "transformer"     # "transformer" | "embedding"
    vocab_size: int = 30522
    text_hidden_size: int = 768           # BERT width or embedding dim
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    bow_operator: str = "sum"             # TextEmbeddingEncoder operator
    # modal side (direct features)
    modal_hidden_size: int = 2048
    num_features: int = 1
    # classifier
    num_labels: int = 2
    classifier_hidden_dim: Optional[int] = 768
    classifier_num_layers: int = 0
    layer_norm_eps: float = 1e-12

    def bert_cfg(self) -> jbert.BertConfig:
        return jbert.BertConfig(
            vocab_size=self.vocab_size, hidden_size=self.text_hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=4 * self.text_hidden_size,
            layer_norm_eps=self.layer_norm_eps)


def init_text_encoder(key: jax.Array, cfg: FusionConfig,
                      dtype=jnp.float32) -> Params:
    if cfg.text_encoder == "transformer":
        k1, k2, k3 = jax.random.split(key, 3)
        D = cfg.text_hidden_size
        return {
            "embeddings": jbert.init_embedding_params(k1, cfg.bert_cfg(),
                                                      dtype),
            "encoder": jbert.init_encoder_params(k2, cfg.bert_cfg(), dtype),
            "pooler": {"w": (jax.random.normal(k3, (D, D)) * 0.02
                             ).astype(dtype),
                       "b": jnp.zeros((D,), dtype)},
        }
    if cfg.text_encoder == "embedding":
        return {"word": (jax.random.normal(
            key, (cfg.vocab_size, cfg.text_hidden_size)) * 0.02
            ).astype(dtype)}
    raise ValueError(f"unknown text encoder {cfg.text_encoder!r}")


def text_encode(params: Params, cfg: FusionConfig, text: jnp.ndarray,
                input_mask: Optional[jnp.ndarray] = None,
                segment_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """FusionBase text path (fusions.py:44-49): BERT → pooled output,
    or bow embedding → operator reduction over tokens."""
    p = params["text"]
    if cfg.text_encoder == "transformer":
        emb = p["embeddings"]
        T = text.shape[1]
        if segment_ids is None:
            segment_ids = jnp.zeros_like(text)
        x = (emb["word"][text] + emb["position"][jnp.arange(T)][None]
             + emb["token_type"][segment_ids])
        x = jbert.layer_norm(x, emb["ln"]["scale"], emb["ln"]["bias"],
                             cfg.layer_norm_eps)
        bias = (jbert.extended_attention_mask(input_mask)
                if input_mask is not None else None)
        seq, _ = jbert.encoder(p["encoder"], x, cfg.bert_cfg(), mask=bias)
        return jnp.tanh(seq[:, 0] @ p["pooler"]["w"].T + p["pooler"]["b"])
    vecs = p["word"][text]
    if cfg.bow_operator == "sum":
        return vecs.sum(axis=1)
    if cfg.bow_operator == "mul":
        return jnp.prod(vecs, axis=1)
    raise ValueError(f"unknown bow operator {cfg.bow_operator!r}")


def _classifier_in_dim(cfg: FusionConfig, with_text: bool = True,
                       with_modal: bool = True) -> int:
    d = 0
    if with_modal:
        d += cfg.num_features * cfg.modal_hidden_size
    if with_text:
        d += cfg.text_hidden_size
    return d


def init_concat(key: jax.Array, cfg: FusionConfig,
                dtype=jnp.float32) -> Params:
    """ConcatBERT / ConcatBoW (fusions.py:57-148) — the text-encoder
    choice in cfg decides which."""
    k1, k2 = jax.random.split(key)
    return {
        "text": init_text_encoder(k1, cfg, dtype),
        "classifier": L.init_mlp_classifier(
            k2, _classifier_in_dim(cfg), cfg.num_labels,
            cfg.classifier_hidden_dim, cfg.classifier_num_layers, dtype),
    }


def concat_forward(params: Params, cfg: FusionConfig, text: jnp.ndarray,
                   modal: jnp.ndarray,
                   input_mask: Optional[jnp.ndarray] = None,
                   segment_ids: Optional[jnp.ndarray] = None
                   ) -> jnp.ndarray:
    """ConcatBERT.forward (fusions.py:100-113): flatten both streams,
    concat [text, modal], classify."""
    t = text_encode(params, cfg, text, input_mask, segment_ids)
    m = modal.reshape(modal.shape[0], -1)
    return L.mlp_classifier_fwd(params["classifier"],
                                jnp.concatenate([t, m], axis=-1))


def init_late_fusion(key: jax.Array, cfg: FusionConfig,
                     dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "text": init_text_encoder(k1, cfg, dtype),
        "text_classifier": L.init_mlp_classifier(
            k2, _classifier_in_dim(cfg, with_modal=False), cfg.num_labels,
            cfg.classifier_hidden_dim, cfg.classifier_num_layers, dtype),
        "modal_classifier": L.init_mlp_classifier(
            k3, _classifier_in_dim(cfg, with_text=False), cfg.num_labels,
            cfg.classifier_hidden_dim, cfg.classifier_num_layers, dtype),
    }


def late_fusion_forward(params: Params, cfg: FusionConfig,
                        text: jnp.ndarray, modal: jnp.ndarray,
                        input_mask: Optional[jnp.ndarray] = None,
                        segment_ids: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """LateFusion.forward (fusions.py:177-194): average of per-modality
    classifier scores."""
    t = text_encode(params, cfg, text, input_mask, segment_ids)
    m = modal.reshape(modal.shape[0], -1)
    return (L.mlp_classifier_fwd(params["text_classifier"], t)
            + L.mlp_classifier_fwd(params["modal_classifier"], m)) / 2.0


def init_unimodal_text(key: jax.Array, cfg: FusionConfig,
                       dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "text": init_text_encoder(k1, cfg, dtype),
        "classifier": L.init_mlp_classifier(
            k2, cfg.text_hidden_size, cfg.num_labels,
            cfg.classifier_hidden_dim, cfg.classifier_num_layers, dtype),
    }


def unimodal_text_forward(params: Params, cfg: FusionConfig,
                          text: jnp.ndarray,
                          input_mask: Optional[jnp.ndarray] = None,
                          segment_ids: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """UnimodalText.forward (unimodal.py:57-70)."""
    return L.mlp_classifier_fwd(
        params["classifier"],
        text_encode(params, cfg, text, input_mask, segment_ids))


def init_unimodal_image(key: jax.Array, cfg: FusionConfig,
                        dtype=jnp.float32) -> Params:
    return {"classifier": L.init_mlp_classifier(
        key, cfg.num_features * cfg.modal_hidden_size, cfg.num_labels,
        cfg.classifier_hidden_dim, cfg.classifier_num_layers, dtype)}


def unimodal_image_forward(params: Params, cfg: FusionConfig,
                           modal: jnp.ndarray,
                           direct_features: bool = True) -> jnp.ndarray:
    """UnimodalModal.forward (unimodal.py:94-106): direct features are
    mean-pooled over boxes, then flattened and classified."""
    if direct_features and modal.ndim == 3:
        modal = modal.mean(axis=1)
    modal = modal.reshape(modal.shape[0], -1)
    return L.mlp_classifier_fwd(params["classifier"], modal)
