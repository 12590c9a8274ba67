"""Box utilities: format conversion, IoU, generalized IoU.

Equivalent of DETR/util/box_ops.py (cxcywh↔xyxy, box_iou,
generalized_box_iou) in jnp — used by the Hungarian matcher, the
SetCriterion losses, and PostProcess.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pairwise IoU of xyxy boxes [N,4]×[M,4] → ([N,M] iou, union)."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return inter / union, union


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """GIoU [N, M] (Rezatofighi et al.), DETR box_ops.generalized_box_iou."""
    iou, union = box_iou(a, b)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / hull


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """DETR/util/box_ops.py:74-88: [N, H, W] binary masks → [N, 4]
    xyxy boxes around the mask support (zeros for empty masks)."""
    if masks.shape[0] == 0:
        return jnp.zeros((0, 4), jnp.float32)
    n, h, w = masks.shape
    m = masks.astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    big = jnp.float32(1e8)
    any_mask = m.sum(axis=(1, 2)) > 0
    x_max = (m * xs).reshape(n, -1).max(axis=-1)
    x_min = jnp.where(m > 0, xs, big).reshape(n, -1).min(axis=-1)
    y_max = (m * ys).reshape(n, -1).max(axis=-1)
    y_min = jnp.where(m > 0, ys, big).reshape(n, -1).min(axis=-1)
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=1)
    return jnp.where(any_mask[:, None], boxes, 0.0)
