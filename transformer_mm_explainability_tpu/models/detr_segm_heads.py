"""DETR segmentation heads (models/segmentation.py:24-245 equivalents).

The explainability flow replaces DETRsegm's learned masks with
explanation-derived masks (the reference keeps DETRsegm commented out in
build(), detr.py:357-358), but the heads are part of the model family
surface and are provided for checkpoint-complete parity:

  * ``mh_attention_map`` — MHAttentionMap: per-query attention over the
    feature map (2D softmax, no value projection);
  * ``mask_head`` — MaskHeadSmallConv: FPN-style conv head fusing the
    attention maps with backbone features;
  * ``post_process_segm`` — PostProcessSegm: bilinear upsample + 0.5
    sigmoid threshold (this one IS on the eval path, engine.py:153+).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import resnet


def mh_attention_map(params: Dict[str, Any], q: jnp.ndarray,
                     k_feat: jnp.ndarray, num_heads: int,
                     mask_valid: jnp.ndarray = None) -> jnp.ndarray:
    """q: [B, Q, D] decoder outputs; k_feat: [B, H, W, D] projected
    features → [B, Q, heads, H, W] attention maps (softmax over H·W)."""
    B, Qn, D = q.shape
    _, H, W, _ = k_feat.shape
    dh = D // num_heads
    qh = (q @ params["q_w"] + params["q_b"]).reshape(B, Qn, num_heads, dh)
    kh = (k_feat @ params["k_w"] + params["k_b"]).reshape(B, H, W,
                                                          num_heads, dh)
    scores = jnp.einsum("bqnd,bhwnd->bqnhw", qh, kh) / (dh ** 0.5)
    if mask_valid is not None:
        bias = (1.0 - mask_valid.astype(scores.dtype)) * -1e9
        scores = scores + bias[:, None, None, :, :]
    flat = scores.reshape(B, Qn, num_heads, H * W)
    probs = jax.nn.softmax(flat, axis=-1)
    return probs.reshape(B, Qn, num_heads, H, W)


def _gn(x: jnp.ndarray, scale, bias, groups: int = 8,
        eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channel-last maps."""
    B, H, W, C = x.shape
    g = x.reshape(B, H, W, groups, C // groups)
    mean = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mean) * jax.lax.rsqrt(var + eps)
    return g.reshape(B, H, W, C) * scale + bias


def mask_head(params: Dict[str, Any], feat: jnp.ndarray,
              attn_maps: jnp.ndarray,
              fpn_feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """MaskHeadSmallConv: concat(features, per-query attention maps) →
    conv/GN/relu ladder with FPN skip fusions → per-query mask logits
    [B·Q, H, W, 1]."""
    B, H, W, D = feat.shape
    _, Qn, heads, _, _ = attn_maps.shape
    # expand to per-query inputs: [B*Q, H, W, D+heads]
    f = jnp.broadcast_to(feat[:, None], (B, Qn, H, W, D)).reshape(
        B * Qn, H, W, D)
    a = attn_maps.transpose(0, 1, 3, 4, 2).reshape(B * Qn, H, W, heads)
    x = jnp.concatenate([f, a], axis=-1)
    for i, lay in enumerate(params["convs"]):
        x = resnet.conv(x, lay["w"]) + lay["b"]
        x = jax.nn.relu(_gn(x, lay["gn_scale"], lay["gn_bias"]))
        if i < len(fpn_feats):
            skip = fpn_feats[i]
            adapter = params["adapters"][i]
            if adapter is not None:
                skip = resnet.conv(skip, adapter["w"]) + adapter["b"]
            sh, sw = skip.shape[1:3]
            x = jax.image.resize(x, (x.shape[0], sh, sw, x.shape[-1]),
                                 method="nearest")
            skip_q = jnp.broadcast_to(
                skip[:, None], (B, Qn) + skip.shape[1:]).reshape(
                    B * Qn, sh, sw, -1)
            x = x + skip_q
    return resnet.conv(x, params["out"]["w"]) + params["out"]["b"]


def post_process_segm(mask_logits: jnp.ndarray,
                      out_hw: Tuple[int, int]) -> jnp.ndarray:
    """PostProcessSegm (segmentation.py:218-243): bilinear upsample to
    the original image size, sigmoid, threshold 0.5 → binary masks."""
    K = mask_logits.shape[0]
    up = jax.image.resize(mask_logits[..., 0],
                          (K,) + tuple(out_hw), method="linear")
    return (jax.nn.sigmoid(up) > 0.5).astype(jnp.float32)
