"""CLIP's ModifiedResNet vision tower (RN50/RN101 CLIP variants).

Behavioural port of CLIP/clip/model.py:10-150 (anti-aliased Bottleneck
with avgpool-before-stride, 3-conv stem + avgpool, QKV AttentionPool2d
head). The explainability notebooks use the ViT variants; this
completes the CLIP model-family surface so every published CLIP
checkpoint loads. BatchNorms run in eval mode (running stats — the
same fused affine as the DETR frozen BN).
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp
from jax import lax

from transformer_mm_explainability_tpu.models import resnet


def avg_pool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """AvgPool2d(k) with stride k (NHWC)."""
    return lax.reduce_window(
        x, 0.0, lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def bottleneck(x: jnp.ndarray, p: Dict[str, Any], stride: int) -> jnp.ndarray:
    """CLIP Bottleneck: all convs stride 1; avgpool(stride) after conv2;
    downsample = avgpool + 1×1 conv (model.py:10-54)."""
    out = jax.nn.relu(resnet.frozen_bn(
        resnet.conv(x, p["conv1"]["w"]), p["bn1"]))
    out = jax.nn.relu(resnet.frozen_bn(
        resnet.conv(out, p["conv2"]["w"]), p["bn2"]))
    if stride > 1:
        out = avg_pool(out, stride)
    out = resnet.frozen_bn(resnet.conv(out, p["conv3"]["w"]), p["bn3"])
    identity = x
    if "downsample" in p:
        identity = x if stride == 1 else avg_pool(x, stride)
        identity = resnet.frozen_bn(
            resnet.conv(identity, p["downsample"]["w"]), p["downsample_bn"])
    return jax.nn.relu(out + identity)


def attention_pool(p: Dict[str, Any], x: jnp.ndarray,
                   num_heads: int) -> jnp.ndarray:
    """AttentionPool2d (model.py:57-86): prepend the spatial mean, add
    positional embeddings, one MHA step queried at the mean token."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    mean = tokens.mean(axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1) + p["positional_embedding"]
    Hh = num_heads
    dh = C // Hh

    def proj(w, b, t):
        return (t @ w + b).reshape(B, -1, Hh, dh).transpose(0, 2, 1, 3)

    q = proj(p["q_w"], p["q_b"], tokens[:, :1])
    k = proj(p["k_w"], p["k_b"], tokens)
    v = proj(p["v_w"], p["v_b"], tokens)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(dh, x.dtype))
    probs = jax.nn.softmax(scores, -1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C)[:, 0]
    return out @ p["c_w"] + p["c_b"]


def forward(params: Dict[str, Any], images: jnp.ndarray,
            num_heads: int) -> jnp.ndarray:
    """images [B, H, W, 3] → pooled embedding [B, output_dim]."""
    x = images
    for i in (1, 2, 3):
        x = jax.nn.relu(resnet.frozen_bn(
            resnet.conv(x, params[f"stem_conv{i}"]["w"],
                        stride=2 if i == 1 else 1),
            params[f"stem_bn{i}"]))
    x = avg_pool(x, 2)
    for si, blocks in enumerate(params["layers"]):
        stride = 1 if si == 0 else 2
        for bi, bp in enumerate(blocks):
            x = bottleneck(x, bp, stride if bi == 0 else 1)
    return attention_pool(params["attnpool"], x, num_heads)


def from_state_dict(sd, prefix: str = "visual.") -> Dict[str, Any]:
    """Convert the CLIP RN state dict subtree → this pytree."""
    from transformer_mm_explainability_tpu.utils import convert as cv

    g = lambda k: sd[f"{prefix}{k}"]
    params: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"stem_conv{i}"] = {"w": cv._conv_hwio(g(f"conv{i}.weight"))}
        params[f"stem_bn{i}"] = {
            "weight": jnp.asarray(cv._np(g(f"bn{i}.weight"))),
            "bias": jnp.asarray(cv._np(g(f"bn{i}.bias"))),
            "mean": jnp.asarray(cv._np(g(f"bn{i}.running_mean"))),
            "var": jnp.asarray(cv._np(g(f"bn{i}.running_var"))),
        }
    layers: List[List[Dict[str, Any]]] = []
    si = 1
    while f"{prefix}layer{si}.0.conv1.weight" in sd:
        blocks = []
        bi = 0
        while f"{prefix}layer{si}.{bi}.conv1.weight" in sd:
            pfx = f"layer{si}.{bi}"
            blk = {
                "conv1": {"w": cv._conv_hwio(g(f"{pfx}.conv1.weight"))},
                "bn1": _bn(sd, f"{prefix}{pfx}.bn1", cv),
                "conv2": {"w": cv._conv_hwio(g(f"{pfx}.conv2.weight"))},
                "bn2": _bn(sd, f"{prefix}{pfx}.bn2", cv),
                "conv3": {"w": cv._conv_hwio(g(f"{pfx}.conv3.weight"))},
                "bn3": _bn(sd, f"{prefix}{pfx}.bn3", cv),
            }
            if f"{prefix}{pfx}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "w": cv._conv_hwio(g(f"{pfx}.downsample.0.weight"))}
                blk["downsample_bn"] = _bn(
                    sd, f"{prefix}{pfx}.downsample.1", cv)
            blocks.append(blk)
            bi += 1
        layers.append(blocks)
        si += 1
    params["layers"] = layers
    ap = f"{prefix}attnpool."
    params["attnpool"] = {
        "positional_embedding": jnp.asarray(
            cv._np(sd[f"{ap}positional_embedding"])),
        "q_w": jnp.asarray(cv._np(sd[f"{ap}q_proj.weight"]).T),
        "q_b": jnp.asarray(cv._np(sd[f"{ap}q_proj.bias"])),
        "k_w": jnp.asarray(cv._np(sd[f"{ap}k_proj.weight"]).T),
        "k_b": jnp.asarray(cv._np(sd[f"{ap}k_proj.bias"])),
        "v_w": jnp.asarray(cv._np(sd[f"{ap}v_proj.weight"]).T),
        "v_b": jnp.asarray(cv._np(sd[f"{ap}v_proj.bias"])),
        "c_w": jnp.asarray(cv._np(sd[f"{ap}c_proj.weight"]).T),
        "c_b": jnp.asarray(cv._np(sd[f"{ap}c_proj.bias"])),
    }
    return params


def _bn(sd, prefix, cv):
    return {
        "weight": jnp.asarray(cv._np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(cv._np(sd[f"{prefix}.bias"])),
        "mean": jnp.asarray(cv._np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(cv._np(sd[f"{prefix}.running_var"])),
    }
