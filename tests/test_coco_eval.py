"""COCOeval-faithful evaluator: hand-derived goldens for the exact
pycocotools semantics (greedy matching, ignore handling, crowd IoU,
area ranges, maxDets truncation, 101-point interpolation)."""

import numpy as np

from transformer_mm_explainability_tpu.harness.coco_eval import (
    CocoEval, bbox_iou, mask_iou)


def box_mask(h, w, y0, x0, y1, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_mask_iou_crowd_semantics():
    d = np.stack([box_mask(10, 10, 0, 0, 5, 10)])     # area 50
    g = np.stack([box_mask(10, 10, 0, 0, 10, 10)])    # area 100
    plain = mask_iou(d, g, np.asarray([False]))
    crowd = mask_iou(d, g, np.asarray([True]))
    assert plain[0, 0] == 0.5          # 50 / 100
    assert crowd[0, 0] == 1.0          # 50 / det area 50


def test_bbox_iou_matches_mask_iou():
    d = np.asarray([[1.0, 2.0, 4.0, 5.0]])            # xywh
    g = np.asarray([[2.0, 3.0, 6.0, 6.0]])
    got = bbox_iou(d, g, np.asarray([False]))[0, 0]
    dm = np.stack([box_mask(20, 20, 2, 1, 7, 5)])
    gm = np.stack([box_mask(20, 20, 3, 2, 9, 8)])
    want = mask_iou(dm, gm, np.asarray([False]))[0, 0]
    assert abs(got - want) < 1e-9


def _eval(gts, dts, **kw):
    ev = CocoEval(iou_type="bbox", **kw)
    if isinstance(gts[0], list):  # multi-image
        for g, d in zip(gts, dts):
            ev.add_image(g, d)
    else:
        ev.add_image(gts, dts)
    ev.accumulate()
    return ev.summarize()


def test_perfect_detection():
    gts = [{"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 50, 50]}]
    dts = [{"category_id": 1, "score": 0.9, "bbox": [0, 0, 50, 50]}]
    s = _eval(gts, dts)
    # pycocotools' np.spacing(1) epsilon keeps "perfect" AP just below 1
    assert abs(s["AP"] - 1.0) < 1e-9 and abs(s["AP50"] - 1.0) < 1e-9
    assert s["AR_100"] == 1.0
    # 50x50 = 2500: a "small"-range object (< 32^2=1024? no: 2500>1024,
    # <9216 → medium)
    assert abs(s["AP_medium"] - 1.0) < 1e-9
    assert s["AP_small"] == -1.0 and s["AP_large"] == -1.0


def test_duplicate_detection_is_fp():
    """One gt, two overlapping dets: at IoU .5 the higher-scored one
    (IoU .6) matches and the duplicate is a FP → precision envelope
    keeps AP=1; at .75 only the lower-scored (IoU 1.0) matches after a
    miss → AP=0.5 (precision 1/2 at every recall point)."""
    gts = [{"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 10, 10]}]
    dts = [
        # IoU vs gt: 6*10 / (100+60-60) = 0.6
        {"category_id": 1, "score": 0.9, "bbox": [0, 0, 6, 10]},
        {"category_id": 1, "score": 0.8, "bbox": [0, 0, 10, 10]},
    ]
    s = _eval(gts, dts, iou_thrs=[0.5])
    assert abs(s["AP"] - 1.0) < 1e-9
    s = _eval(gts, dts, iou_thrs=[0.75])
    assert abs(s["AP"] - 0.5) < 1e-9


def test_crowd_gt_never_counts():
    """A detection matched only to a crowd gt is ignored (not FP), and
    the crowd gt itself is not a required recall target."""
    gts = [
        {"category_id": 1, "iscrowd": 1, "bbox": [0, 0, 100, 100]},
        {"category_id": 1, "iscrowd": 0, "bbox": [200, 200, 10, 10]},
    ]
    dts = [
        # inside the crowd region, IoU(crowd)=1 via det-area denominator
        {"category_id": 1, "score": 0.95, "bbox": [10, 10, 5, 5]},
        {"category_id": 1, "score": 0.90, "bbox": [200, 200, 10, 10]},
    ]
    s = _eval(gts, dts)
    # the real gt is matched perfectly; the crowd-matched det is ignored
    assert abs(s["AP"] - 1.0) < 1e-9 and s["AR_100"] == 1.0


def test_unmatched_out_of_area_det_ignored():
    """In the 'small' cell, a large unmatched detection is ignored
    rather than counted as FP."""
    gts = [{"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 10, 10],
            "area": 100.0}]
    dts = [
        {"category_id": 1, "score": 0.95, "bbox": [300, 300, 90, 90]},
        {"category_id": 1, "score": 0.90, "bbox": [0, 0, 10, 10]},
    ]
    s = _eval(gts, dts)
    assert abs(s["AP_small"] - 1.0) < 1e-9  # big det ignored in small cell
    assert s["AP"] < 1.0           # but is a genuine FP in 'all'


def test_max_dets_truncation():
    """With maxDet=1 only the top-scored det per image survives."""
    gts = [{"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 10, 10]}]
    dts = [
        {"category_id": 1, "score": 0.9, "bbox": [500, 500, 10, 10]},
        {"category_id": 1, "score": 0.8, "bbox": [0, 0, 10, 10]},
    ]
    s = _eval(gts, dts)
    assert s["AR_1"] == 0.0        # the only kept det misses
    assert s["AR_100"] == 1.0      # rank-2 det recovered


def test_category_averaging_and_missing_class():
    """AP averages only over categories with ground truth."""
    gts = [
        {"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 10, 10]},
        {"category_id": 2, "iscrowd": 0, "bbox": [50, 50, 10, 10]},
    ]
    dts = [
        {"category_id": 1, "score": 0.9, "bbox": [0, 0, 10, 10]},
        # nothing for class 2; a spurious class-3 det (no gt) is excluded
        {"category_id": 3, "score": 0.9, "bbox": [0, 0, 10, 10]},
    ]
    s = _eval(gts, dts)
    assert abs(s["AP"] - 0.5) < 1e-9   # (1.0 + 0.0) / 2


def test_interpolation_101_points():
    """Two gts, three dets: TP, FP, TP → rc=[.5,.5,1],
    pr=[1,.5,2/3] → envelope [1,2/3,2/3]; q(r)=1 for r<=0.5,
    2/3 for 0.5<r<=1 → AP = (51*1 + 50*2/3)/101."""
    gts = [{"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 10, 10]},
           {"category_id": 1, "iscrowd": 0, "bbox": [50, 50, 10, 10]}]
    dts = [
        {"category_id": 1, "score": 0.9, "bbox": [0, 0, 10, 10]},
        {"category_id": 1, "score": 0.8, "bbox": [200, 200, 10, 10]},
        {"category_id": 1, "score": 0.7, "bbox": [50, 50, 10, 10]},
    ]
    s = _eval(gts, dts, iou_thrs=[0.5])
    want = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    assert abs(s["AP"] - want) < 1e-9


def test_multi_image_accumulation():
    """Detections pool across images before the PR curve is built."""
    gts = [
        [{"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 10, 10]}],
        [{"category_id": 1, "iscrowd": 0, "bbox": [0, 0, 10, 10]}],
    ]
    dts = [
        [{"category_id": 1, "score": 0.9, "bbox": [0, 0, 10, 10]}],
        [{"category_id": 1, "score": 0.8, "bbox": [300, 300, 10, 10]}],
    ]
    s = _eval(gts, dts, iou_thrs=[0.5])
    # rc=[.5,.5], pr=[1,.5] → q = 1 for r<=0.5 else 0 → 51/101
    assert abs(s["AP"] - 51 / 101) < 1e-9
    assert s["AR_100"] == 0.5


def test_segm_type_end_to_end():
    ev = CocoEval(iou_type="segm", iou_thrs=[0.5])
    gts = [{"category_id": 7, "iscrowd": 0,
            "mask": box_mask(50, 50, 0, 0, 20, 20)}]
    dts = [{"category_id": 7, "score": 0.6,
            "mask": box_mask(50, 50, 0, 0, 20, 18)}]  # IoU 0.9
    ev.add_image(gts, dts)
    ev.accumulate()
    s = ev.summarize()
    assert abs(s["AP"] - 1.0) < 1e-9
