"""Differential fuzz: frcnn.nms_fixed / nms_blocked vs a scalar greedy
oracle with torchvision semantics.

The FRCNN parity suite already exercises NMS end-to-end inside the
reference pipeline; this fuzz hits the kernel directly across many
random geometries — clustered boxes (heavy suppression), quantised
coordinates and scores (exact IoU==1 duplicates and score ties), mixed
scales, and degenerate zero-area boxes — so any divergence in the
greedy recurrence (tie-breaks, strict-vs-weak threshold,
self-suppression) surfaces with a tiny reproducible seed.

The oracle is a python transcription of torchvision ``nms``: stable
score-descending order (ties broken by lower original index — the same
tie-break both kernels implement), suppress on IoU strictly greater
than the threshold, f32 IoU arithmetic. ``tests/_shims.tv_nms`` is NOT
used here because its ``torch.argsort`` is not guaranteed stable, which
makes the oracle itself ambiguous exactly on the tie cases this fuzz
exists to pin.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.models import frcnn

N, MAX_OUT = 128, 48  # fixed shapes: every case reuses one compile/impl

_JIT = {
    "fixed": jax.jit(lambda b, s, t: frcnn.nms_fixed(b, s, t, MAX_OUT)),
    "blocked": jax.jit(lambda b, s, t: frcnn.nms_blocked(b, s, t, MAX_OUT)),
}


def greedy_nms_oracle(boxes: np.ndarray, scores: np.ndarray,
                      iou_thresh: float) -> np.ndarray:
    order = sorted(range(len(scores)), key=lambda i: (-scores[i], i))
    x1, y1, x2, y2 = boxes.T.astype(np.float32)
    areas = (x2 - x1) * (y2 - y1)
    alive = np.ones(len(order), bool)
    keep = []
    for j in order:
        if not alive[j]:
            continue
        keep.append(j)
        xx1 = np.maximum(x1[j], x1)
        yy1 = np.maximum(y1[j], y1)
        xx2 = np.minimum(x2[j], x2)
        yy2 = np.minimum(y2[j], y2)
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        with np.errstate(invalid="ignore"):
            # 0/0 for pairs of zero-area boxes → NaN, and NaN > thresh is
            # False, i.e. degenerate boxes never suppress each other —
            # matching torchvision's batched IoU semantics.
            iou = inter / (areas[j] + areas - inter)
        alive &= ~(iou > np.float32(iou_thresh))
    return np.asarray(keep[:MAX_OUT], np.int64)


def _random_case(rng, quantise, cluster):
    if cluster:
        # a few dense clusters: most boxes suppress each other
        centers = rng.rand(max(1, N // 20), 2) * 400
        pick = rng.randint(0, len(centers), N)
        ctr = centers[pick] + rng.randn(N, 2) * 8
    else:
        ctr = rng.rand(N, 2) * 400
    wh = rng.rand(N, 2) * 60 + 2
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
    scores = rng.rand(N)
    if quantise:
        boxes = np.round(boxes / 4) * 4   # exact duplicates → IoU == 1
        scores = np.round(scores * 8) / 8  # score ties
    # sprinkle degenerate boxes (x2 == x1)
    idx = rng.choice(N, N // 16, replace=False)
    boxes[idx, 2] = boxes[idx, 0]
    return boxes.astype(np.float32), scores.astype(np.float32)


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("quantise,cluster", [(False, False), (True, True),
                                              (False, True), (True, False)])
def test_nms_matches_greedy_oracle(seed, quantise, cluster):
    rng = np.random.RandomState(1000 * seed + 7 * quantise + cluster)
    iou = float(rng.choice([0.3, 0.5, 0.7]))
    boxes, scores = _random_case(rng, quantise, cluster)

    want = greedy_nms_oracle(boxes, scores, iou)

    for name, impl in _JIT.items():
        idxs, ok = impl(jnp.asarray(boxes), jnp.asarray(scores), iou)
        got = np.asarray(idxs)[np.asarray(ok)]
        np.testing.assert_array_equal(got, want, err_msg=name)


def test_nms_valid_mask_equals_prefiltering():
    """Masking via `valid` must equal physically removing the boxes."""
    rng = np.random.RandomState(3)
    boxes, scores = _random_case(rng, False, True)
    valid = rng.rand(N) > 0.3

    idxs, ok = jax.jit(
        lambda b, s, v: frcnn.nms_fixed(b, s, 0.5, MAX_OUT, valid=v))(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
    got = np.asarray(idxs)[np.asarray(ok)]

    keep_map = np.where(valid)[0]
    want_sub = greedy_nms_oracle(boxes[valid], scores[valid], 0.5)
    np.testing.assert_array_equal(got, keep_map[want_sub])
