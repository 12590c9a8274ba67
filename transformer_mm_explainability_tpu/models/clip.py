"""CLIP (ViT vision tower + causal text tower) with attention capture.

Re-implements the behaviour of the reference's instrumented OpenAI CLIP
(CLIP/clip/model.py:201-378 — ``VisualTransformer``/``Transformer``/
``CLIP``; capture hooks at model.py:181-193 + auxilary.py:243-250)
TPU-natively:

  * residual attention blocks stacked on a layer axis + ``lax.scan``,
  * LayerNorm in fp32 (the reference's fp16-safe LayerNorm,
    model.py:153-159), QuickGELU (model.py:162-164),
  * causal text mask built once as an additive -inf upper triangle
    (model.py:335-341),
  * attention probabilities captured via additive taps on both towers
    (see ops/attention.py) — one jitted fwd+bwd replaces the
    reference's per-block ``torch.autograd.grad`` calls.

Weight layout matches ``clip.load``'s state dict after conversion by
utils/convert.py (in_proj fused qkv, model.py:405-442 ``build_model``
shape sniffing).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.ops.attention import (
    AttentionParams,
    layer_norm,
    multi_head_self_attention,
    quick_gelu,
)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    # vision: int = ViT depth; tuple = ModifiedResNet stage sizes
    image_resolution: int = 224
    vision_layers: Any = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    # text
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.vision_layers, (tuple, list))

    @property
    def vision_heads(self) -> int:
        if self.is_resnet:
            return self.vision_width * 32 // 64  # model.py:269
        return self.vision_width // 64

    @property
    def vision_seq_len(self) -> int:
        return (self.image_resolution // self.vision_patch_size) ** 2 + 1


CLIP_VIT_B_32 = CLIPConfig()
CLIP_VIT_B_16 = CLIPConfig(vision_patch_size=16)


class Taps(NamedTuple):
    """Attention-probability taps for both towers (zeros for capture)."""

    visual: jnp.ndarray  # [L_v, B, H_v, S_v, S_v]
    text: jnp.ndarray    # [L_t, B, H_t, S_t, S_t]


def zero_taps(cfg: CLIPConfig, n_images: int, n_texts: int,
              dtype: jnp.dtype = jnp.float32) -> Taps:
    St = cfg.context_length
    if cfg.is_resnet:
        visual = jnp.zeros((0,), dtype)  # no attention capture in the RN tower
    else:
        Sv = cfg.vision_seq_len
        visual = jnp.zeros(
            (cfg.vision_layers, n_images, cfg.vision_heads, Sv, Sv), dtype)
    return Taps(
        visual=visual,
        text=jnp.zeros(
            (cfg.transformer_layers, n_texts, cfg.transformer_heads, St, St),
            dtype,
        ),
    )


def _init_tower(key, width, layers, heads, dtype):
    D, L, Dm = width, layers, width * 4
    ks = jax.random.split(key, 4)
    nrm = lambda k, shape, s: (jax.random.normal(k, shape) * s).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    proj_std = (D ** -0.5) * ((2 * L) ** -0.5)
    return {
        "ln1": {"scale": ones((L, D)), "bias": zeros((L, D))},
        "attn": AttentionParams(
            w_qkv=nrm(ks[0], (L, D, 3 * D), D ** -0.5),
            b_qkv=zeros((L, 3 * D)),
            w_out=nrm(ks[1], (L, D, D), proj_std),
            b_out=zeros((L, D)),
        ),
        "ln2": {"scale": ones((L, D)), "bias": zeros((L, D))},
        "mlp": {
            "w1": nrm(ks[2], (L, D, Dm), (2 * D) ** -0.5), "b1": zeros((L, Dm)),
            "w2": nrm(ks[3], (L, Dm, D), proj_std), "b2": zeros((L, D)),
        },
    }


def init_params(key: jax.Array, cfg: CLIPConfig = CLIP_VIT_B_32,
                dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 8)
    nrm = lambda k, shape, s: (jax.random.normal(k, shape) * s).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    Dv, P = cfg.vision_width, cfg.vision_patch_size
    Dt = cfg.transformer_width
    return {
        "visual": {
            "conv1": nrm(ks[0], (P * P * 3, Dv), Dv ** -0.5),  # no bias
            "class_embedding": nrm(ks[1], (Dv,), Dv ** -0.5),
            "positional_embedding": nrm(ks[2], (cfg.vision_seq_len, Dv), Dv ** -0.5),
            "ln_pre": {"scale": ones((Dv,)), "bias": zeros((Dv,))},
            "blocks": _init_tower(ks[3], Dv, cfg.vision_layers,
                                  cfg.vision_heads, dtype),
            "ln_post": {"scale": ones((Dv,)), "bias": zeros((Dv,))},
            "proj": nrm(ks[4], (Dv, cfg.embed_dim), Dv ** -0.5),
        },
        "text": {
            "token_embedding": nrm(ks[5], (cfg.vocab_size, Dt), 0.02),
            "positional_embedding": nrm(ks[6], (cfg.context_length, Dt), 0.01),
            "blocks": _init_tower(ks[7], Dt, cfg.transformer_layers,
                                  cfg.transformer_heads, dtype),
            "ln_final": {"scale": ones((Dt,)), "bias": zeros((Dt,))},
            "text_projection": nrm(ks[5], (Dt, cfg.embed_dim), Dt ** -0.5),
        },
        "logit_scale": jnp.asarray(jnp.log(1.0 / 0.07), dtype),
    }


def _tower(blocks, x, num_heads, taps, mask=None, ln_eps=1e-5):
    """Shared residual-attention-block stack (scan over layers)."""

    def block(x, layer):
        p, tap = layer
        h = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], ln_eps)
        attn_out, probs = multi_head_self_attention(
            p["attn"], h, num_heads, mask=mask, tap=tap
        )
        x = x + attn_out
        h = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], ln_eps)
        h = quick_gelu(h @ p["mlp"]["w1"] + p["mlp"]["b1"])
        x = x + (h @ p["mlp"]["w2"] + p["mlp"]["b2"])
        return x, probs

    return jax.lax.scan(block, x, (blocks, taps))


def encode_image(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: CLIPConfig,
    taps: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """images: [B, H, W, 3] normalised. Returns (features [B, E], attn)."""
    if cfg.is_resnet:
        from transformer_mm_explainability_tpu.models import clip_resnet

        feats = clip_resnet.forward(params["visual"], images,
                                    cfg.vision_heads)
        return feats, jnp.zeros((0,), images.dtype)
    v = params["visual"]
    B, H, W, _ = images.shape
    P = cfg.vision_patch_size
    x = images.reshape(B, H // P, P, W // P, P, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, P * P * 3) @ v["conv1"]
    cls = jnp.broadcast_to(v["class_embedding"], (B, 1, cfg.vision_width))
    x = jnp.concatenate([cls, x], axis=1) + v["positional_embedding"]
    x = layer_norm(x, v["ln_pre"]["scale"], v["ln_pre"]["bias"])
    if taps is None:
        taps = zero_taps(cfg, B, 1, x.dtype).visual
    x, attn = _tower(v["blocks"], x, cfg.vision_heads, taps)
    x = layer_norm(x[:, 0], v["ln_post"]["scale"], v["ln_post"]["bias"])
    return x @ v["proj"], attn


def encode_text(
    params: Dict[str, Any],
    tokens: jnp.ndarray,
    cfg: CLIPConfig,
    taps: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """tokens: [B, context_length] int32. Returns (features [B, E], attn).

    Pools at the EOT position = argmax token id (model.py:360-362).
    """
    t = params["text"]
    x = t["token_embedding"][tokens] + t["positional_embedding"]
    S = cfg.context_length
    causal = jnp.triu(jnp.full((S, S), -jnp.inf, x.dtype), k=1)
    if taps is None:
        taps = zero_taps(cfg, 1, tokens.shape[0], x.dtype).text
    x, attn = _tower(t["blocks"], x, cfg.transformer_heads, taps, mask=causal)
    x = layer_norm(x, t["ln_final"]["scale"], t["ln_final"]["bias"])
    eot = tokens.argmax(axis=-1)
    x = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    return x @ t["text_projection"], attn


def forward(
    params: Dict[str, Any],
    images: jnp.ndarray,
    tokens: jnp.ndarray,
    cfg: CLIPConfig = CLIP_VIT_B_32,
    taps: Optional[Taps] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Returns (logits_per_image [B_i, B_t], logits_per_text,
    (visual_attn, text_attn))."""
    if taps is None:
        taps = zero_taps(cfg, images.shape[0], tokens.shape[0], images.dtype)
    img_feat, v_attn = encode_image(params, images, cfg, taps.visual)
    txt_feat, t_attn = encode_text(params, tokens, cfg, taps.text)
    img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)
    txt_feat = txt_feat / jnp.linalg.norm(txt_feat, axis=-1, keepdims=True)
    scale = jnp.exp(params["logit_scale"])
    logits_per_image = scale * img_feat @ txt_feat.T
    return logits_per_image, logits_per_image.T, (v_attn, t_attn)
