"""ResNet backbone (frozen BatchNorm) in NHWC for TPU.

The reference DETR uses a torchvision ResNet-50 with FrozenBatchNorm2d
(DETR/models/backbone.py:19-96) — batch statistics and affine params
fixed. Here frozen BN is an elementwise scale/shift that XLA fuses into
the surrounding convs; layout is NHWC (TPU-native conv layout).

Structure: conv7x7/2 → FBN → relu → maxpool3x3/2 → 4 bottleneck stages
[3, 4, 6, 3] (ResNet-50); stage strides (1, 2, 2, 2); v1.5 stride
placement (stride on the 3×3 conv), matching torchvision.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

RESNET50_STAGES = (3, 4, 6, 3)


def conv(x: jnp.ndarray, w: jnp.ndarray, stride: int = 1,
         dilation: int = 1) -> jnp.ndarray:
    """NHWC conv with HWIO weights and torch-style 'same-ish' padding."""
    kh, kw = w.shape[0], w.shape[1]
    pad_h = dilation * (kh - 1) // 2
    pad_w = dilation * (kw - 1) // 2
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((pad_h, pad_h), (pad_w, pad_w)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def frozen_bn(x: jnp.ndarray, p: Dict[str, jnp.ndarray],
              eps: float = 1e-5) -> jnp.ndarray:
    """y = (x - mean) * weight / sqrt(var + eps) + bias, all fixed
    (DETR backbone.py:45-58 semantics, incl. the eps)."""
    scale = p["weight"] * lax.rsqrt(p["var"] + eps)
    return x * scale + (p["bias"] - p["mean"] * scale)


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def max_pool_3x3_s2_caffe(x: jnp.ndarray) -> jnp.ndarray:
    """Caffe-style stem pool: kernel 3, stride 2, pad 0, ceil_mode=True
    (the FRCNN reference's MODEL.MAX_POOL stem, modeling_frcnn.py:794).
    Ceil mode = pad only bottom/right so the last partial window is
    kept; -inf padding makes the partial-window max identical to
    caffe's boundary clamping."""
    _, H, W, _ = x.shape
    out_h = -(-(H - 3) // 2) + 1   # ceil((H-3)/2) + 1
    out_w = -(-(W - 3) // 2) + 1
    pad_h = (out_h - 1) * 2 + 3 - H
    pad_w = (out_w - 1) * 2 + 3 - W
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (0, pad_h), (0, pad_w), (0, 0)],
    )


def bottleneck(x: jnp.ndarray, p: Dict[str, Any], stride: int,
               dilation: int = 1, stride_in_1x1: bool = False) -> jnp.ndarray:
    """``stride_in_1x1`` selects the caffe/detectron2 variant (stride on
    the first 1×1 conv) vs torchvision v1.5 (stride on the 3×3)."""
    s1, s2 = (stride, 1) if stride_in_1x1 else (1, stride)
    out = jax.nn.relu(frozen_bn(conv(x, p["conv1"]["w"], stride=s1),
                                p["bn1"]))
    out = jax.nn.relu(frozen_bn(
        conv(out, p["conv2"]["w"], stride=s2, dilation=dilation),
        p["bn2"]))
    out = frozen_bn(conv(out, p["conv3"]["w"]), p["bn3"])
    if "downsample" in p:
        x = frozen_bn(conv(x, p["downsample"]["w"], stride=stride),
                      p["downsample_bn"])
    return jax.nn.relu(out + x)


def forward(params: Dict[str, Any], images: jnp.ndarray,
            dilation_last: bool = False) -> jnp.ndarray:
    """images [B, H, W, 3] → C5 features [B, H/32, W/32, 2048]
    (or H/16 with ``dilation_last`` — the DC5 variants)."""
    x = jax.nn.relu(frozen_bn(conv(images, params["conv1"]["w"], stride=2),
                              params["bn1"]))
    x = max_pool_3x3_s2(x)
    for si, blocks in enumerate(params["layers"]):
        stage_stride = 1 if si == 0 else 2
        dilation = 1
        if dilation_last and si == 3:
            stage_stride, dilation = 1, 2
        for bi, bp in enumerate(blocks):
            x = bottleneck(x, bp, stride=stage_stride if bi == 0 else 1,
                           dilation=dilation)
    return x


def init_params(key: jax.Array, stages: Tuple[int, ...] = RESNET50_STAGES,
                width: int = 64, dtype: jnp.dtype = jnp.float32
                ) -> Dict[str, Any]:
    """He-init random backbone (real weights via utils/convert)."""
    def he(k, shape):
        fan_in = shape[0] * shape[1] * shape[2]
        return (jax.random.normal(k, shape) *
                jnp.sqrt(2.0 / fan_in)).astype(dtype)

    def bn(n):
        return {"weight": jnp.ones((n,), dtype), "bias": jnp.zeros((n,), dtype),
                "mean": jnp.zeros((n,), dtype), "var": jnp.ones((n,), dtype)}

    import itertools

    # ResNet-101 needs 104 weight keys; recycle the 64 split keys (random
    # init is only used for parity tests / benches, never real weights)
    keys = jax.random.split(key, 64)
    ki = itertools.count()
    params: Dict[str, Any] = {
        "conv1": {"w": he(keys[next(ki)], (7, 7, 3, width))},
        "bn1": bn(width),
        "layers": [],
    }
    in_ch = width
    for si, n_blocks in enumerate(stages):
        mid = width * (2 ** si)
        out_ch = mid * 4
        blocks: List[Dict[str, Any]] = []
        for bi in range(n_blocks):
            p = {
                "conv1": {"w": he(keys[next(ki) % 64], (1, 1, in_ch, mid))},
                "bn1": bn(mid),
                "conv2": {"w": he(keys[next(ki) % 64], (3, 3, mid, mid))},
                "bn2": bn(mid),
                "conv3": {"w": he(keys[next(ki) % 64], (1, 1, mid, out_ch))},
                "bn3": bn(out_ch),
            }
            if bi == 0:
                p["downsample"] = {
                    "w": he(keys[next(ki) % 64], (1, 1, in_ch, out_ch))}
                p["downsample_bn"] = bn(out_ch)
            blocks.append(p)
            in_ch = out_ch
        params["layers"].append(blocks)
    return params
