"""Batched image preprocessing as XLA ops.

The reference's preprocessing stacks (SURVEY C35/C37/C10):
  * CLIP: Resize(bicubic, shortest side = n_px) → CenterCrop(n_px) →
    RGB [0,1] → Normalize((0.481,0.458,0.408),(0.269,0.261,0.276))
    (CLIP/clip/clip.py:60-67);
  * DETR: resize shortest edge (800) capped at 1333, ImageNet
    normalisation, pad to batch max with a validity mask
    (DETR/datasets/transforms.py, util/misc.NestedTensor);
  * FRCNN: ResizeShortestEdge + pad (lxmert processing_image.py:29-134).

All implemented channel-last on-device (jax.image.resize), jit/vmap
friendly (static output sizes — size bucketing happens at the data
layer).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize(image: jnp.ndarray, size: Tuple[int, int],
           method: str = "bicubic") -> jnp.ndarray:
    """[H, W, C] → [h, w, C]; method: "bilinear" | "bicubic"."""
    jax_method = {"bilinear": "linear", "bicubic": "cubic"}[method]
    return jax.image.resize(image, size + image.shape[2:], method=jax_method)


def resize_shortest_edge(image: jnp.ndarray, shortest: int,
                         longest_cap: int = 0,
                         method: str = "bilinear") -> jnp.ndarray:
    """Scale so the shortest side equals ``shortest`` (host-side shape
    math; image shapes are static per call)."""
    h, w = image.shape[:2]
    scale = shortest / min(h, w)
    if longest_cap and max(h, w) * scale > longest_cap:
        scale = longest_cap / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    return resize(image, (nh, nw), method)


def center_crop(image: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = image.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return image[top:top + size, left:left + size]


def normalize(image: jnp.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> jnp.ndarray:
    mean = jnp.asarray(mean, image.dtype)
    std = jnp.asarray(std, image.dtype)
    return (image - mean) / std


def clip_preprocess(image: jnp.ndarray, n_px: int = 224) -> jnp.ndarray:
    """uint8/float [H, W, 3] (RGB, 0-255 or 0-1) → normalised
    [n_px, n_px, 3] (the ``_transform`` pipeline, clip.py:60-67)."""
    img = image.astype(jnp.float32)
    img = jnp.where(jnp.asarray(img.max() > 2.0), img / 255.0, img) \
        if image.dtype != jnp.uint8 else img / 255.0
    img = resize_shortest_edge(img, n_px, method="bicubic")
    img = center_crop(img, n_px)
    return normalize(img, CLIP_MEAN, CLIP_STD)


def pad_to(image: jnp.ndarray, height: int, width: int
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad bottom/right to (height, width); returns (padded, valid_mask)
    — the NestedTensor contract (valid=1 on real pixels)."""
    h, w = image.shape[:2]
    padded = jnp.zeros((height, width) + image.shape[2:], image.dtype)
    padded = padded.at[:h, :w].set(image)
    valid = jnp.zeros((height, width), jnp.float32).at[:h, :w].set(1.0)
    return padded, valid


def min_max_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(x - min) / (max - min) over the full array — the relevancy-map
    display normalisation used everywhere in the reference."""
    return (x - x.min()) / (x.max() - x.min())


def upsample_relevancy(rel: jnp.ndarray, grid_hw: Tuple[int, int],
                       out_hw: Tuple[int, int]) -> jnp.ndarray:
    """[N_patches] patch relevancy → bilinear [H, W] heatmap (the
    notebooks' interpolate step)."""
    rel2d = rel.reshape(grid_hw)
    return jax.image.resize(rel2d, out_hw, method="linear")
