"""Encoder registry — MMF's image/text encoder zoo, TPU-native (C34).

Re-design of ``VisualBERT/mmf/modules/encoders.py``: the registered
encoders (finetune_faster_rcnn_fpn_fc7:93, identity:134, resnet152:188,
text_embedding:266, transformer:297) and the three factory dispatchers
(ImageFeatureEncoderFactory:56, ImageEncoderFactory:157,
TextEncoderFactory:239) plus ProjectionEmbedding
(``mmf/modules/embeddings.py:194-215``).

TPU shape: each encoder is a tiny host-side config object with
``init(key, dtype) -> params`` and ``apply(params, x) -> y`` — the
apply path is pure jnp (jit/vmap/grad-safe), params are explicit
pytrees (never baked into the trace).  Image tensors follow the
reference's NCHW convention at the boundary and run NHWC internally
(TPU conv layout).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from transformer_mm_explainability_tpu.core.registry import registry
from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import mmf_layers as L
from transformer_mm_explainability_tpu.models import resnet as jresnet

RESNET152_STAGES = (3, 8, 36, 3)


@registry.register_encoder("identity")
class IdentityEncoder:
    """IdentityEncoder (encoders.py:134-148)."""

    def __init__(self, config: Dict[str, Any]):
        self.in_dim = config["in_dim"]
        self.out_dim = config["in_dim"]

    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        return {}

    def apply(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        return x


class ProjectionEncoder:
    """ProjectionEmbedding (embeddings.py:194-215), 'linear' module."""

    def __init__(self, config: Dict[str, Any]):
        if config.get("module", "linear") != "linear":
            raise TypeError(
                "Unknown module type for 'ProjectionEmbedding',"
                "use either 'linear' or 'conv'")
        self.in_dim = config["in_dim"]
        self.out_dim = config["out_dim"]

    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        return L.init_linear(key, self.in_dim, self.out_dim, dtype)

    def apply(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        return L.linear_fwd(params, x)


@registry.register_encoder("finetune_faster_rcnn_fpn_fc7")
class FinetuneFasterRcnnFpnFc7:
    """FinetuneFasterRcnnFpnFc7 (encoders.py:93-131): the detectron
    fc7 linear + ReLU over pooled FRCNN features.  Weights come from
    the published fc7_w/fc7_b pickles (``weights_file``/``bias_file``)
    or explicit arrays; the zoo download path is offline-gated like
    utils/download.py."""

    def __init__(self, config: Dict[str, Any]):
        self.in_dim = config["in_dim"]
        self.weights: Optional[np.ndarray] = None
        self.bias: Optional[np.ndarray] = None
        if "weights" in config:
            self.weights = np.asarray(config["weights"], np.float32)
            self.bias = np.asarray(config["bias"], np.float32)
        elif "weights_file" in config:
            with open(config["weights_file"], "rb") as w:
                self.weights = np.asarray(pickle.load(w), np.float32)
            with open(config["bias_file"], "rb") as b:
                self.bias = np.asarray(pickle.load(b), np.float32)
        self.out_dim = (self.bias.shape[0] if self.bias is not None
                        else config.get("out_dim", self.in_dim))

    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        if self.weights is not None:
            return {"w": jnp.asarray(self.weights, dtype),
                    "b": jnp.asarray(self.bias, dtype)}
        return L.init_linear(key, self.in_dim, self.out_dim, dtype)

    def apply(self, params: Dict, image: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.relu(L.linear_fwd(params, image))


def adaptive_pool_2d(x: jnp.ndarray, out_hw, mode: str = "avg"
                     ) -> jnp.ndarray:
    """torch AdaptiveAvg/MaxPool2d on NHWC: cell i spans
    [floor(i*S/O), ceil((i+1)*S/O)) — exact boundary semantics."""
    B, H, W, C = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -(-((i + 1) * H) // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -(-((j + 1) * W) // ow)
            cell = x[:, h0:h1, w0:w1, :]
            cols.append(cell.mean(axis=(1, 2)) if mode == "avg"
                        else cell.max(axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # [B, oh, ow, C]


@registry.register_encoder("resnet152")
class ResNet152ImageEncoder:
    """ResNet152ImageEncoder (encoders.py:188-230): torchvision
    resnet152 trunk (children[:-2] — through layer4, no avgpool/fc),
    adaptive pool to the num_output_features grid, flatten to
    [B, N, 2048].  Input is NCHW like the reference; grids per N
    follow encoders.py:210-221."""

    GRIDS = {1: (1, 1), 2: (2, 1), 3: (3, 1), 4: (2, 2), 5: (5, 1),
             6: (3, 2), 7: (7, 1), 8: (4, 2), 9: (3, 3)}

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        config = config or {}
        self.pool_type = config.get("pool_type", "avg")
        self.num_output_features = config.get("num_output_features", 1)
        self.out_dim = 2048

    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        return jresnet.init_params(key, stages=RESNET152_STAGES,
                                   dtype=dtype)

    def apply(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW → NHWC
        feat = jresnet.forward(params, x)   # [B, H/32, W/32, 2048]
        n = self.num_output_features
        if n == -1:
            B, H, W, C = feat.shape
            pooled = feat.reshape(B, H * W, C)
            return pooled
        mode = "avg" if self.pool_type == "avg" else "max"
        pooled = adaptive_pool_2d(feat, self.GRIDS[n], mode)
        B = pooled.shape[0]
        # reference flattens CxN then transposes → row-major over the
        # (h, w) grid, matching reshape on NHWC
        return pooled.reshape(B, -1, self.out_dim)


@registry.register_encoder("transformer")
class TransformerEncoder:
    """TransformerEncoder (encoders.py:297-359): BERT encoder whose
    forward returns the pooled output; token-type table expanded to
    ``num_segments`` rows (first two copied, middle rows set to their
    mean, the final row left at init — replicating the reference's
    off-by-one at :346-349)."""

    def __init__(self, config: Optional[Dict[str, Any]] = None):
        config = config or {}
        self.num_segments = config.get("num_segments", 2)
        self.cfg = jbert.BertConfig(
            vocab_size=config.get("vocab_size", 30522),
            hidden_size=config.get("hidden_size", 768),
            num_hidden_layers=config.get("num_hidden_layers", 12),
            num_attention_heads=config.get("num_attention_heads", 12),
        )
        self.out_dim = self.cfg.hidden_size

    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        ks = jax.random.split(key, 4)
        emb = jbert.init_embedding_params(ks[0], self.cfg, dtype)
        if self.num_segments and self.num_segments > 2:
            old = emb["token_type"]
            new = (jax.random.normal(
                ks[3], (self.num_segments, self.cfg.hidden_size))
                * 0.02).astype(dtype)
            new = new.at[:2].set(old[:2])
            mean = old.mean(axis=0)
            for idx in range(2, self.num_segments - 1):
                new = new.at[idx].set(mean)
            emb["token_type"] = new
        D = self.cfg.hidden_size
        return {
            "embeddings": emb,
            "encoder": jbert.init_encoder_params(ks[1], self.cfg, dtype),
            "pooler": {
                "w": (jax.random.normal(ks[2], (D, D)) * 0.02
                      ).astype(dtype),
                "b": jnp.zeros((D,), dtype)},
        }

    def apply(self, params: Dict, input_ids: jnp.ndarray,
              input_mask: Optional[jnp.ndarray] = None,
              segment_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        emb = params["embeddings"]
        B, S = input_ids.shape
        if segment_ids is None:
            segment_ids = jnp.zeros_like(input_ids)
        x = (emb["word"][input_ids]
             + emb["position"][jnp.arange(S)][None]
             + emb["token_type"][segment_ids])
        from transformer_mm_explainability_tpu.ops.attention import (
            layer_norm)
        x = layer_norm(x, emb["ln"]["scale"], emb["ln"]["bias"],
                       self.cfg.layer_norm_eps)
        bias = (jbert.extended_attention_mask(input_mask, x.dtype)
                if input_mask is not None else None)
        seq, _ = jbert.encoder(params["encoder"], x, self.cfg, mask=bias)
        return jnp.tanh(seq[:, 0] @ params["pooler"]["w"].T
                        + params["pooler"]["b"])


@registry.register_encoder("text_embedding")
class TextEmbeddingEncoder:
    """TextEmbeddingEncoder (encoders.py:266-294): a TextEmbedding
    module followed by a sum/concat/mul reduction over the sequence.
    The embedding_params.type supported here is 'attention' (the
    BiLSTM+attention TextEmbedding the VisDial/Pythia configs use)."""

    def __init__(self, config: Dict[str, Any]):
        self.operator = config["operator"]
        ep = config["embedding_params"]
        if ep["type"] != "attention":
            raise NotImplementedError(
                f"TextEmbedding type {ep['type']} not wired")
        self.params_cfg = ep["params"]

    def init(self, key: jax.Array, dtype=jnp.float32) -> Dict:
        p = self.params_cfg
        return L.init_attention_text_embedding(
            key, p["hidden_dim"], p["embedding_dim"], p["conv1_out"],
            p["conv2_out"], p.get("bidirectional", False), dtype)

    def apply(self, params: Dict, x: jnp.ndarray) -> jnp.ndarray:
        y = L.attention_text_embedding_fwd(params, x)
        if self.operator == "sum":
            y = y.sum(axis=1)
        elif self.operator == "concat":
            y = y.reshape(y.shape[0], -1)
        elif self.operator == "mul":
            y = jnp.prod(y, axis=1)
        return jnp.squeeze(y)


# ---------------------------------------------------------------------------
# factory dispatch (encoders.py:56-90, 157-184, 239-263)
# ---------------------------------------------------------------------------

def build_image_feature_encoder(enc_type: str, params: Dict[str, Any]):
    """ImageFeatureEncoderFactory (encoders.py:62-90)."""
    assert "in_dim" in params, (
        "ImageFeatureEncoder require 'in_dim' param in config")
    if enc_type in ("default", "identity"):
        return IdentityEncoder(params)
    if enc_type == "projection":
        return ProjectionEncoder(params)
    if enc_type == "finetune_faster_rcnn_fpn_fc7":
        return FinetuneFasterRcnnFpnFc7(params)
    raise NotImplementedError(f"Unknown Image Encoder: {enc_type}")


def build_image_encoder(enc_type: str,
                        params: Optional[Dict[str, Any]] = None):
    """ImageEncoderFactory (encoders.py:162-184)."""
    if enc_type in ("default", "identity"):
        return IdentityEncoder(params or {"in_dim": None})
    if enc_type == "resnet152":
        return ResNet152ImageEncoder(params)
    raise NotImplementedError(f"Unknown Image Encoder: {enc_type}")


def build_text_encoder(enc_type: str,
                       params: Optional[Dict[str, Any]] = None):
    """TextEncoderFactory (encoders.py:246-263)."""
    if enc_type == "identity":
        return IdentityEncoder(params or {"in_dim": None})
    if enc_type == "transformer":
        return TransformerEncoder(params)
    if enc_type == "embedding":
        return TextEmbeddingEncoder(params)
    raise NotImplementedError(f"Unknown Text Encoder {enc_type}")
