"""Otsu thresholding as an XLA op.

The reference binarises relevancy maps with cv2's Otsu
(DETR/mask_generator.py:116-121: min-max → ×255 → uint8 → THRESH_OTSU).
cv2 is not a dependency here; Otsu over a 256-bin histogram is a few
vector ops and runs on device inside the jitted mask pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp


def otsu_threshold(image_u8: jnp.ndarray) -> jnp.ndarray:
    """Scalar Otsu threshold of a uint8-valued array (any shape).

    Returns the threshold t (float); foreground = value > t, matching
    cv2.threshold(..., THRESH_BINARY+THRESH_OTSU) semantics (cv2 picks
    argmax of between-class variance; ties → lowest t).
    """
    flat = image_u8.astype(jnp.int32).reshape(-1)
    hist = jnp.bincount(flat, length=256).astype(jnp.float32)
    n = flat.shape[0]
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)                      # pixels ≤ t
    sum0 = jnp.cumsum(hist * bins)
    total = sum0[-1]
    w1 = n - w0
    mu0 = sum0 / jnp.maximum(w0, 1.0)
    mu1 = (total - sum0) / jnp.maximum(w1, 1.0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    between = jnp.where((w0 > 0) & (w1 > 0), between, -1.0)
    return jnp.argmax(between).astype(jnp.float32)


def otsu_binarize(relevancy: jnp.ndarray) -> jnp.ndarray:
    """min-max normalise → 255 scale → Otsu → binary {0,1} mask
    (mask_generator.py:116-121)."""
    lo, hi = relevancy.min(), relevancy.max()
    scaled = (relevancy - lo) / jnp.maximum(hi - lo, 1e-12) * 255.0
    u8 = jnp.clip(scaled, 0, 255).astype(jnp.uint8)
    t = otsu_threshold(u8)
    return (u8.astype(jnp.float32) > t).astype(jnp.float32)
