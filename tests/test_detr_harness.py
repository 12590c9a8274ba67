"""DETR harness pieces: box ops vs reference, matcher behaviour, Otsu,
mask AP evaluator."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import requires_reference

from transformer_mm_explainability_tpu.utils import box_ops
from transformer_mm_explainability_tpu.models import matcher
from transformer_mm_explainability_tpu.ops.otsu import (
    otsu_binarize, otsu_threshold)
from transformer_mm_explainability_tpu.harness import detr_segm


def rand_boxes(n, seed=0):
    rng = np.random.RandomState(seed)
    cxcy = rng.rand(n, 2) * 0.8 + 0.1
    wh = rng.rand(n, 2) * 0.2 + 0.05
    return np.concatenate([cxcy, wh], 1).astype(np.float32)


@requires_reference
def test_box_ops_parity():
    """Round-trip + GIoU vs reference util/box_ops (DETR test_all.py:25
    pattern)."""
    import torch

    from _shims import torchvision_shim
    from conftest import load_reference_module

    # reference box_ops needs torchvision.box_area — shim then clean
    with torchvision_shim():
        ref = load_reference_module("DETR/util/box_ops.py", "ref_box_ops")

    b = rand_boxes(6, seed=1)
    xyxy_ref = ref.box_cxcywh_to_xyxy(torch.tensor(b)).numpy()
    xyxy = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(b)))
    np.testing.assert_allclose(xyxy, xyxy_ref, atol=1e-6)
    back = np.asarray(box_ops.box_xyxy_to_cxcywh(jnp.asarray(xyxy)))
    np.testing.assert_allclose(back, b, atol=1e-6)

    b2 = rand_boxes(4, seed=2)
    xy2 = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(b2)))
    giou_ref = ref.generalized_box_iou(
        torch.tensor(xyxy), torch.tensor(xy2)).numpy()
    giou = np.asarray(box_ops.generalized_box_iou(
        jnp.asarray(xyxy), jnp.asarray(xy2)))
    np.testing.assert_allclose(giou, giou_ref, atol=1e-5)


def test_matcher_matches_identity():
    """Perfect predictions must match 1:1 (HungarianMatcher shape test,
    DETR test_all.py:34-61 analogue)."""
    Q, C, M = 10, 5, 3
    rng = np.random.RandomState(3)
    tgt_boxes = rand_boxes(M, seed=4)
    tgt_labels = rng.randint(0, C, (M,))
    logits = np.full((Q, C + 1), -5.0, np.float32)
    boxes = rand_boxes(Q, seed=5)
    chosen = [7, 2, 9]
    for t, q in enumerate(chosen):
        logits[q, tgt_labels[t]] = 5.0
        boxes[q] = tgt_boxes[t]
    a = matcher.match(
        jnp.asarray(logits)[None], jnp.asarray(boxes)[None],
        jnp.asarray(tgt_labels)[None], jnp.asarray(tgt_boxes)[None],
        np.asarray([M]))
    np.testing.assert_array_equal(a[0], chosen)


def test_matcher_empty_targets():
    a = matcher.match(
        jnp.zeros((1, 5, 4)), jnp.zeros((1, 5, 4)) + 0.5,
        jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 2, 4)) + 0.4,
        np.asarray([0]))
    assert (a[0] == -1).all()


def test_criterion_losses():
    Q, C, M = 6, 4, 2
    rng = np.random.RandomState(6)
    logits = jnp.asarray(rng.randn(1, Q, C + 1).astype(np.float32))
    boxes = jnp.asarray(rand_boxes(Q, seed=7)[None])
    tgt_labels = jnp.asarray([[1, 3]])
    tgt_boxes = jnp.asarray(rand_boxes(M, seed=8)[None])
    assignment = jnp.asarray([[4, 0]])
    losses = matcher.set_criterion_losses(
        logits, boxes, tgt_labels, tgt_boxes, assignment)
    for k in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error"):
        assert np.isfinite(float(losses[k])), k
    # perfect boxes → zero bbox/giou loss
    perfect = boxes.at[0, 4].set(tgt_boxes[0, 0]).at[0, 0].set(tgt_boxes[0, 1])
    losses2 = matcher.set_criterion_losses(
        logits, perfect, tgt_labels, tgt_boxes, assignment)
    assert float(losses2["loss_bbox"]) < 1e-6
    assert float(losses2["loss_giou"]) < 1e-5


def test_otsu_bimodal():
    """Otsu on a clean bimodal image separates the modes like cv2."""
    rng = np.random.RandomState(9)
    img = np.concatenate([
        rng.normal(50, 5, 500), rng.normal(200, 5, 500)
    ]).clip(0, 255).astype(np.uint8)
    t = float(otsu_threshold(jnp.asarray(img)))
    assert 60 < t < 195
    rel = jnp.asarray(img.astype(np.float32).reshape(20, 50))
    binary = np.asarray(otsu_binarize(rel))
    assert set(np.unique(binary)) <= {0.0, 1.0}
    # min-max scaling means modes at 50/200 → split cleanly
    assert binary.mean() == pytest.approx(0.5, abs=0.05)


def test_mask_iou_and_ap():
    H = W = 8
    gt = np.zeros((2, H, W))
    gt[0, :4] = 1
    gt[1, 4:] = 1
    pred = np.zeros((2, H, W))
    pred[0, :4] = 1          # perfect
    pred[1, 4:6] = 1         # IoU 0.5
    iou = detr_segm.mask_iou(pred, gt)
    assert iou[0, 0] == 1.0
    assert iou[1, 1] == pytest.approx(0.5)
    det = [{
        "scores": np.asarray([0.9, 0.8]),
        "classes": np.asarray([1, 2]),
        "iou": iou,
        "gt_classes": np.asarray([1, 2]),
    }]
    res = detr_segm.segm_map(det, np.asarray([0.4]))
    assert res["AP@0.40"] == pytest.approx(1.0)
    res2 = detr_segm.segm_map(det, np.asarray([0.6]))
    assert res2["AP@0.60"] == pytest.approx(0.5)  # one of two classes hit


def test_keep_detections_padding():
    Q, C = 10, 5
    logits = np.full((Q, C + 1), 0.0, np.float32)
    logits[3, 1] = 6.0
    logits[7, 2] = 5.0
    q, c, v = detr_segm.keep_detections(logits, 0.5, max_keep=4)
    assert list(q[:2]) == [3, 7]
    assert list(c[:2]) == [1, 2]
    assert v[:2].all() and not v[2:].any()


def test_pack_mask_bits_roundtrip():
    """Device bit-packing must be np.unpackbits-exact for any width
    (incl. non-multiple-of-8) — the protocol transfers masks as bits."""
    import jax.numpy as jnp
    from transformer_mm_explainability_tpu.harness import detr_segm

    rng = np.random.RandomState(0)
    for W in (96, 101, 1088):
        m = (rng.rand(5, 7, W) > 0.5).astype(np.float32)
        packed = np.asarray(detr_segm.pack_mask_bits(jnp.asarray(m)))
        assert packed.dtype == np.uint8
        assert packed.shape == (5, 7, -(-W // 8))
        got = detr_segm.unpack_mask_bits(packed, W)
        np.testing.assert_array_equal(got, m.astype(np.uint8))
