"""Metric registry + the reference's key metrics (C28).

MMF registers ~25 metrics (mmf/modules/metrics.py); the ones on the
explainability/VQA path are implemented here and registered under the
same names. All are pure jnp and jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from transformer_mm_explainability_tpu.core.registry import registry


@registry.register_metric("accuracy")
def accuracy(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """targets: int labels [B] or one/soft-hot [B, C]."""
    pred = scores.argmax(-1)
    if targets.ndim == scores.ndim:
        targets = targets.argmax(-1)
    return (pred == targets).mean()


@registry.register_metric("vqa_accuracy")
def vqa_accuracy(scores: jnp.ndarray, soft_targets: jnp.ndarray
                 ) -> jnp.ndarray:
    """VQA soft accuracy: the soft label mass of the argmax answer
    (mmf/modules/metrics.py:316-364 semantics: one-hot the prediction,
    dot with the soft targets, mean over batch)."""
    pred = scores.argmax(-1)
    picked = jnp.take_along_axis(soft_targets, pred[:, None], axis=1)[:, 0]
    return picked.mean()


@registry.register_metric("top_k_accuracy")
def top_k_accuracy(scores: jnp.ndarray, targets: jnp.ndarray, k: int = 5
                   ) -> jnp.ndarray:
    topk = jnp.argsort(-scores, axis=-1)[:, :k]
    if targets.ndim == scores.ndim:
        targets = targets.argmax(-1)
    return (topk == targets[:, None]).any(-1).mean()


@registry.register_metric("binary_f1")
def binary_f1(scores: jnp.ndarray, targets: jnp.ndarray,
              threshold: float = 0.5) -> jnp.ndarray:
    pred = (scores > threshold).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    tp = (pred * t).sum()
    precision = tp / jnp.maximum(pred.sum(), 1e-9)
    recall = tp / jnp.maximum(t.sum(), 1e-9)
    return 2 * precision * recall / jnp.maximum(precision + recall, 1e-9)


def compute(name: str, scores, targets, **kw) -> float:
    return float(registry.get("metric", name)(scores, targets, **kw))
