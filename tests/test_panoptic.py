"""Panoptic postprocess parity vs the reference PostProcessPanoptic
(DETR/models/segmentation.py:245-366) + PQ metric semantics."""

import sys
import types

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

torch = pytest.importorskip("torch")

from transformer_mm_explainability_tpu.harness import panoptic as pano

Q, C, FH, FW = 12, 6, 16, 24   # queries, classes (bg = C), mask grid
H, W = 48, 72                  # processed size
IS_THING = {i: (i % 2 == 0) for i in range(C + 1)}


# one canonical id<->rgb codec lives in the shim module
from _shims import _id2rgb, _rgb2id  # noqa: E402


def _load_ref_postprocess():
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    import importlib

    from _shims import panopticapi_shim, torchvision_shim

    with torchvision_shim(), panopticapi_shim():
        seg = importlib.import_module("DETR.models.segmentation")
    # the module guards the panopticapi import with try/except; inject
    # the shims if the guard swallowed them before our stub existed
    if not hasattr(seg, "id2rgb"):
        seg.id2rgb = _id2rgb
        seg.rgb2id = _rgb2id
    return seg


def _synthetic_outputs(seed=0):
    rng = np.random.RandomState(seed)
    logits = rng.randn(Q, C + 1).astype(np.float32)
    # force a deterministic mix: 5 confident fg queries (2 sharing a
    # stuff class), the rest background/low-confidence
    logits[:, :] = -3.0
    confident = [(0, 1), (2, 3), (4, 3), (6, 2), (8, 5)]
    for q, c in confident:
        logits[q, c] = 6.0
    logits[1, C] = 6.0      # background
    logits[3, 4] = 0.5      # low confidence → dropped by threshold
    masks = rng.randn(Q, FH, FW).astype(np.float32) * 2.0
    # spatially separate blobs so segments have real areas
    for i, (q, c) in enumerate(confident):
        masks[q] = -4.0
        y = (i * FH) // len(confident)
        masks[q, y:y + FH // len(confident) + 1,
              (i * 3) % FW:(i * 3) % FW + 14] = 5.0
    return logits, masks


@requires_reference
def test_postprocess_panoptic_parity():
    seg = _load_ref_postprocess()
    logits, masks = _synthetic_outputs()

    ref_pp = seg.PostProcessPanoptic(IS_THING, threshold=0.85)
    outputs = {
        "pred_logits": torch.from_numpy(logits)[None],
        "pred_masks": torch.from_numpy(masks)[None],
        "pred_boxes": torch.rand(1, Q, 4),
    }
    ref = ref_pp(outputs, processed_sizes=[(H, W)],
                 target_sizes=[(H, W)])[0]
    from PIL import Image
    import io

    ref_ids = _rgb2id(np.asarray(
        Image.open(io.BytesIO(ref["png_string"])).convert("RGB")))

    got = pano.post_process_panoptic(
        logits, masks, (H, W), IS_THING, target_size=(H, W),
        threshold=0.85)

    np.testing.assert_array_equal(got["id_map"], ref_ids)
    assert len(got["segments_info"]) == len(ref["segments_info"])
    for a, b in zip(got["segments_info"], ref["segments_info"]):
        assert a["id"] == b["id"]
        assert a["category_id"] == b["category_id"]
        assert a["isthing"] == b["isthing"]
        assert a["area"] == b["area"]


@requires_reference
def test_postprocess_panoptic_parity_resized():
    """Same comparison with target != processed size (exercises the
    PIL-NEAREST-equivalent id-map resize)."""
    seg = _load_ref_postprocess()
    logits, masks = _synthetic_outputs(seed=1)
    target = (31, 49)

    ref_pp = seg.PostProcessPanoptic(IS_THING, threshold=0.85)
    outputs = {
        "pred_logits": torch.from_numpy(logits)[None],
        "pred_masks": torch.from_numpy(masks)[None],
        "pred_boxes": torch.rand(1, Q, 4),
    }
    ref = ref_pp(outputs, processed_sizes=[(H, W)],
                 target_sizes=[target])[0]
    from PIL import Image
    import io

    ref_ids = _rgb2id(np.asarray(
        Image.open(io.BytesIO(ref["png_string"])).convert("RGB")))
    got = pano.post_process_panoptic(
        logits, masks, (H, W), IS_THING, target_size=target,
        threshold=0.85)
    np.testing.assert_array_equal(got["id_map"], ref_ids)
    assert [s["area"] for s in got["segments_info"]] == [
        s["area"] for s in ref["segments_info"]]


def test_pq_perfect_match():
    ids = np.zeros((20, 20), np.int64)
    ids[:10] = 1
    ids[10:] = 2
    info = [{"id": 1, "category_id": 3}, {"id": 2, "category_id": 4}]
    cats = {3: {"isthing": True}, 4: {"isthing": False}}
    r = pano.pq_compute([(ids, info)], [(ids, info)], cats)
    assert r["All"]["pq"] == pytest.approx(1.0)
    assert r["Things"]["n"] == 1 and r["Stuff"]["n"] == 1


def test_pq_miss_and_fp():
    gt = np.zeros((10, 10), np.int64)
    gt[:, :5] = 1
    gt_info = [{"id": 1, "category_id": 3}]
    pr = np.zeros((10, 10), np.int64)
    pr[:, 5:] = 7                      # no overlap with the gt segment
    pr_info = [{"id": 7, "category_id": 3}]
    cats = {3: {"isthing": True}}
    r = pano.pq_compute([(gt, gt_info)], [(pr, pr_info)], cats)
    # TP=0, FP=1, FN=1 → PQ = 0
    assert r["All"]["pq"] == 0.0


def test_pq_iou_accounting():
    """One matched pair: PQ = SQ*RQ with the VOID-corrected union."""
    gt = np.zeros((10, 8), np.int64)
    gt[:8] = 1                          # 64 px
    pr = np.zeros((10, 8), np.int64)
    pr[2:10] = 1
    # overlap 48; VOID∩pred = 16 → union = 64+64-48-16 = 64 (panopticapi
    # subtracts the prediction's VOID overlap) → IoU = 0.75
    info = [{"id": 1, "category_id": 2}]
    cats = {2: {"isthing": True}}
    r = pano.pq_compute([(gt, info)], [(pr, info)], cats)
    assert r["All"]["sq"] == pytest.approx(0.75)
    assert r["All"]["rq"] == pytest.approx(1.0)
    assert r["All"]["pq"] == pytest.approx(0.75)


def test_pq_void_and_crowd():
    """Predictions mostly covering VOID / same-class crowd are not FP;
    crowd gts are never FN."""
    gt = np.zeros((10, 10), np.int64)   # all VOID except a crowd region
    gt[:5] = 9
    gt_info = [{"id": 9, "category_id": 2, "iscrowd": 1}]
    pr = np.zeros((10, 10), np.int64)
    pr[:6] = 1                          # 50 px on crowd + 10 px void
    pr_info = [{"id": 1, "category_id": 2}]
    cats = {2: {"isthing": True}}
    r = pano.pq_compute([(gt, gt_info)], [(pr, pr_info)], cats)
    # no scoreable segments at all → category never enters the average
    assert r["All"]["n"] == 0 and r["All"]["pq"] == 0.0


def test_to_pq_format_roundtrip():
    """Regression: post_process ids are 0-based with -1 empty; the PQ
    convention is 1-based with 0=VOID — the adapter must shift both
    the map and segments_info, and a perfect prediction must score
    PQ=1.0 through the adapter."""
    from transformer_mm_explainability_tpu.harness.panoptic import (
        pq_compute, to_pq_format)

    id_map = np.zeros((8, 8), np.int64)
    id_map[:, 4:] = 1
    id_map[0, 0] = -1  # no-segment pixel
    result = {"id_map": id_map,
              "segments_info": [
                  {"id": 0, "isthing": True, "category_id": 1, "area": 31},
                  {"id": 1, "isthing": False, "category_id": 2, "area": 32}]}
    pq_map, segs = to_pq_format(result)
    assert pq_map[0, 0] == 0          # VOID
    assert sorted(s["id"] for s in segs) == [1, 2]
    cats = {1: {"isthing": True}, 2: {"isthing": False}}
    out = pq_compute([(pq_map, segs)], [(pq_map, segs)], cats)
    assert out["All"]["pq"] == pytest.approx(1.0)
    assert out["Things"]["n"] == 1 and out["Stuff"]["n"] == 1
