"""Hungarian matcher + DETR losses + post-processing.

Equivalents of DETR/models/matcher.py:12-77 (HungarianMatcher),
DETR/models/detr.py:103-276 (SetCriterion) and :278-307 (PostProcess).

TPU design notes: the assignment problem itself is tiny (≤100×N) and
sits between two big jitted programs, so it runs as a pure-numpy
Jonker-Volgenant/scipy solve on host via ``pure_callback`` when inside
jit, or directly in the eager training loop. Cost matrices and losses
are computed on device with padded targets + validity masks (static
shapes).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_mm_explainability_tpu.utils import box_ops


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    cost_class: float = 1.0
    cost_bbox: float = 5.0
    cost_giou: float = 2.0


def cost_matrix(
    pred_logits: jnp.ndarray,   # [Q, C+1]
    pred_boxes: jnp.ndarray,    # [Q, 4] cxcywh
    tgt_labels: jnp.ndarray,    # [M] (padded)
    tgt_boxes: jnp.ndarray,     # [M, 4] cxcywh (padded)
    cfg: MatcherConfig = MatcherConfig(),
) -> jnp.ndarray:
    """[Q, M] matching cost (matcher.py:48-69: -prob, L1, -GIoU mix)."""
    prob = jax.nn.softmax(pred_logits, -1)
    cost_class = -prob[:, tgt_labels]
    cost_bbox = jnp.abs(pred_boxes[:, None] - tgt_boxes[None]).sum(-1)
    cost_giou = -box_ops.generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(tgt_boxes))
    return (cfg.cost_bbox * cost_bbox + cfg.cost_class * cost_class
            + cfg.cost_giou * cost_giou)


def hungarian(cost: np.ndarray, n_valid: int) -> np.ndarray:
    """Assignment of targets→queries. Returns [M] query index per target
    (−1 beyond n_valid). Host-side scipy solve."""
    from scipy.optimize import linear_sum_assignment

    M = cost.shape[1]
    out = np.full((M,), -1, np.int64)
    if n_valid > 0:
        rows, cols = linear_sum_assignment(cost[:, :n_valid])
        out[cols] = rows
    return out


def match(pred_logits, pred_boxes, tgt_labels, tgt_boxes, n_valid,
          cfg: MatcherConfig = MatcherConfig()) -> np.ndarray:
    """Batched matching on host (eval/train loop boundary).
    Inputs [B, ...]; returns [B, M] query indices (−1 = pad)."""
    B = pred_logits.shape[0]
    cost = jax.vmap(
        lambda l, b, tl, tb: cost_matrix(l, b, tl, tb, cfg)
    )(pred_logits, pred_boxes, tgt_labels, tgt_boxes)
    cost = np.asarray(cost)
    return np.stack([
        hungarian(cost[i], int(n_valid[i])) for i in range(B)
    ])


def set_criterion_losses(
    pred_logits: jnp.ndarray,    # [B, Q, C+1]
    pred_boxes: jnp.ndarray,     # [B, Q, 4]
    tgt_labels: jnp.ndarray,     # [B, M] padded with any value
    tgt_boxes: jnp.ndarray,      # [B, M, 4]
    assignment: jnp.ndarray,     # [B, M] query index per target (−1 pad)
    eos_coef: float = 0.1,
    num_classes: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """DETR losses given a matching (SetCriterion: loss_labels :159-180,
    cardinality :182-192, loss_boxes :194-214). Static shapes — padded
    targets masked by ``assignment >= 0``."""
    B, Q, Cp1 = pred_logits.shape
    C = (Cp1 - 1) if num_classes is None else num_classes
    valid = assignment >= 0
    n_boxes = jnp.maximum(valid.sum(), 1)

    # classification: all queries default to no-object class C.  Pad
    # rows (assignment == -1) must not scatter at all — clipping them
    # to query 0 would collide with a real assignment to query 0 and
    # JAX leaves duplicate-index scatter order unspecified.  Route
    # them out of bounds and drop.
    target_classes = jnp.full((B, Q), C, jnp.int32)
    q_idx = jnp.where(valid, jnp.clip(assignment, 0), Q)
    target_classes = jax.vmap(
        lambda tc, qi, lbl: tc.at[qi].set(lbl.astype(jnp.int32),
                                          mode="drop")
    )(target_classes, q_idx, tgt_labels)
    weights = jnp.where(target_classes == C, eos_coef, 1.0)
    logp = jax.nn.log_softmax(pred_logits, -1)
    ce = -jnp.take_along_axis(logp, target_classes[..., None], -1)[..., 0]
    loss_ce = (ce * weights).sum() / weights.sum()

    # cardinality (diagnostic): |#non-eos-pred − #targets| (L1)
    pred_count = (pred_logits.argmax(-1) != C).sum(-1)
    card_err = jnp.abs(pred_count - valid.sum(-1)).astype(jnp.float32).mean()

    # box losses on matched pairs
    matched_pred = jax.vmap(
        lambda pb, qi: pb[qi]
    )(pred_boxes, q_idx)                                  # [B, M, 4]
    l1 = jnp.abs(matched_pred - tgt_boxes).sum(-1)
    loss_bbox = jnp.where(valid, l1, 0.0).sum() / n_boxes
    giou = jax.vmap(
        lambda mp, tb: jnp.diagonal(box_ops.generalized_box_iou(
            box_ops.box_cxcywh_to_xyxy(mp), box_ops.box_cxcywh_to_xyxy(tb)))
    )(matched_pred, tgt_boxes)
    loss_giou = jnp.where(valid, 1.0 - giou, 0.0).sum() / n_boxes

    return {"loss_ce": loss_ce, "loss_bbox": loss_bbox,
            "loss_giou": loss_giou, "cardinality_error": card_err}


def post_process(pred_logits: jnp.ndarray, pred_boxes: jnp.ndarray,
                 target_sizes: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """PostProcess (detr.py:278-307): softmax over classes (dropping the
    no-object column for the max), boxes → absolute xyxy."""
    prob = jax.nn.softmax(pred_logits, -1)
    scores = prob[..., :-1].max(-1)
    labels = prob[..., :-1].argmax(-1)
    boxes = box_ops.box_cxcywh_to_xyxy(pred_boxes)
    h, w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([w, h, w, h], axis=1)[:, None, :]
    return {"scores": scores, "labels": labels, "boxes": boxes * scale}
