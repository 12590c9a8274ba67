"""Differential fuzz of harness.coco_eval.CocoEval against a scalar
oracle.

pycocotools is absent from this image, so the vectorized CocoEval can't
be diffed against the real thing. Instead this file carries an
INDEPENDENT scalar transcription of COCOeval's published algorithm
(cocoeval.py evaluateImg/accumulate: greedy score-order matching with
the crowd re-match rule and the ignored-gt early break, unmatched
out-of-area ignoring, score-merged cumulative PR with the right-to-left
precision envelope and left-searchsorted 101-point interpolation) —
plain per-detection loops, no vectorization, structured like the
original — and fuzzes both over randomized scenarios: crowds, explicit
and defaulted areas, score ties, empty images, det-only / gt-only
categories, both iou_types, standard and lowered IoU bands, and
non-default maxDets. Full precision/recall/scores tensors must match,
not just the 12-stat summary.
"""

import numpy as np
import pytest

from transformer_mm_explainability_tpu.harness.coco_eval import (
    AREA_RANGES,
    CocoEval,
    bbox_iou,
    mask_iou,
)

# ---------------------------------------------------------------------------
# oracle: literal scalar transcription of the COCOeval algorithm
# ---------------------------------------------------------------------------


def _oracle_area(ann, iou_type):
    if ann.get("area") is not None:
        return float(ann["area"])
    if iou_type == "segm":
        return float(np.asarray(ann["mask"]).astype(bool).sum())
    return float(ann["bbox"][2] * ann["bbox"][3])


def _oracle_iou(dts, gts, iou_type):
    """Per-pair IoU via the (separately unit-tested) iou kernels, with
    gt order preserved; crowd denominators use the detection area."""
    crowd = np.asarray([int(g.get("iscrowd", 0)) for g in gts], bool)
    if iou_type == "segm":
        d = (np.asarray([np.asarray(x["mask"]) for x in dts])
             if dts else np.zeros((0, 1, 1)))
        g = (np.asarray([np.asarray(x["mask"]) for x in gts])
             if gts else np.zeros((0, 1, 1)))
        return mask_iou(d, g, crowd)
    d = np.asarray([x["bbox"] for x in dts], np.float64).reshape(-1, 4)
    g = np.asarray([x["bbox"] for x in gts], np.float64).reshape(-1, 4)
    return bbox_iou(d, g, crowd)


def _oracle_eval_img(gts, dts, iou_thrs, area_rng, max_det, iou_type):
    """COCOeval.evaluateImg for one (image, category, area range)."""
    if not gts and not dts:
        return None
    for g in gts:
        a = _oracle_area(g, iou_type)
        g["_ignore"] = 1 if (g.get("iscrowd", 0)
                             or a < area_rng[0] or a > area_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[:max_det]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    ious_full = _oracle_iou(dts, [g for g in gts], iou_type)

    T, G, D = len(iou_thrs), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts], np.float64)
    dt_ig = np.zeros((T, D))
    if D and G:
        for tind, t in enumerate(iou_thrs):
            for dind in range(D):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if (m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1):
                        break
                    if ious_full[dind, gind] < iou:
                        continue
                    iou = ious_full[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1
                gtm[tind, m] = 1
    a = np.array([_oracle_area(d, iou_type) < area_rng[0]
                  or _oracle_area(d, iou_type) > area_rng[1]
                  for d in dts]).reshape(1, -1)
    dt_ig = np.logical_or(
        dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": np.asarray([d["score"] for d in dts], np.float64),
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def _oracle_accumulate(per_image, iou_thrs, rec_thrs, max_dets,
                       area_ranges, iou_type):
    """COCOeval.evaluate + accumulate over a list of per-image
    (gts, dts) annotation pairs."""
    cats = sorted({int(a["category_id"])
                   for gts, dts in per_image for a in gts + dts})
    T, R = len(iou_thrs), len(rec_thrs)
    K, A, M = len(cats), len(area_ranges), len(max_dets)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    scores_out = -np.ones((T, R, K, A, M))
    for ki, cat in enumerate(cats):
        for ai, (lo, hi) in enumerate(area_ranges.values()):
            E = []
            for gts, dts in per_image:
                e = _oracle_eval_img(
                    [dict(g) for g in gts
                     if int(g["category_id"]) == cat],
                    [dict(d) for d in dts
                     if int(d["category_id"]) == cat],
                    iou_thrs, (lo, hi), max_dets[-1], iou_type)
                if e is not None:
                    E.append(e)
            if not E:
                continue
            npig = int(sum((e["gtIgnore"] == 0).sum() for e in E))
            if npig == 0:
                continue
            for mi, max_det in enumerate(max_dets):
                dt_scores = np.concatenate(
                    [e["dtScores"][:max_det] for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dt_scores_sorted = dt_scores[inds]
                dtm = np.concatenate(
                    [e["dtMatches"][:, :max_det] for e in E],
                    axis=1)[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, :max_det] for e in E],
                    axis=1)[:, inds]
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for tind in range(T):
                    tp, fp = tp_sum[tind], fp_sum[tind]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    ss = np.zeros(R)
                    recall[tind, ki, ai, mi] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    idx = np.searchsorted(rc, rec_thrs, side="left")
                    try:
                        for ri, pi in enumerate(idx):
                            q[ri] = pr[pi]
                            ss[ri] = dt_scores_sorted[pi]
                    except IndexError:
                        pass
                    precision[tind, :, ki, ai, mi] = q
                    scores_out[tind, :, ki, ai, mi] = ss
    return precision, recall, scores_out


# ---------------------------------------------------------------------------
# scenario generator
# ---------------------------------------------------------------------------

H = W = 24


def _rand_mask(rng):
    m = np.zeros((H, W), bool)
    for _ in range(rng.randint(1, 3)):
        y, x = rng.randint(0, H - 2), rng.randint(0, W - 2)
        h, w = rng.randint(2, 12), rng.randint(2, 12)
        m[y:y + h, x:x + w] = True
    return m


def _rand_ann(rng, iou_type, cats, is_dt):
    ann = {"category_id": int(rng.choice(cats))}
    if iou_type == "segm":
        ann["mask"] = _rand_mask(rng)
    else:
        ann["bbox"] = [float(rng.uniform(0, 60)), float(rng.uniform(0, 60)),
                       float(rng.uniform(1, 40)), float(rng.uniform(1, 40))]
    if is_dt:
        # coarse scores force ties → exercises stable-sort agreement
        ann["score"] = float(np.round(rng.uniform(0, 1), 1))
    else:
        ann["iscrowd"] = int(rng.rand() < 0.2)
    if rng.rand() < 0.3:
        # explicit area independent of the geometry (as in real COCO
        # jsons, where area is the polygon area, not the box area)
        ann["area"] = float(rng.uniform(1, 110 ** 2))
    return ann


def _rand_scenario(rng, iou_type):
    cats = list(range(1, rng.randint(2, 5)))
    per_image = []
    for _ in range(rng.randint(1, 5)):
        gts = [_rand_ann(rng, iou_type, cats, False)
               for _ in range(rng.randint(0, 7))]
        dts = [_rand_ann(rng, iou_type, cats, True)
               for _ in range(rng.randint(0, 9))]
        per_image.append((gts, dts))
    return per_image


# small area bands so 24×24 masks / 60px boxes actually straddle them
FUZZ_AREAS = {"all": (0.0, 1e10), "small": (0.0, 24.0 ** 2),
              "medium": (24.0 ** 2, 48.0 ** 2), "large": (48.0 ** 2, 1e10)}

BANDS = {
    "std": None,                                  # 0.50:0.05:0.95
    "lowered": np.linspace(0.2, 0.95, 16),        # DETR expl-segm band
}


@pytest.mark.parametrize("iou_type", ["bbox", "segm"])
@pytest.mark.parametrize("band", sorted(BANDS))
def test_fuzz_matches_scalar_oracle(iou_type, band):
    rng = np.random.RandomState(0 if iou_type == "bbox" else 1)
    for trial in range(25):
        per_image = _rand_scenario(rng, iou_type)
        max_dets = (1, 10, 100) if trial % 2 == 0 else (2, 5)
        ev = CocoEval(iou_type=iou_type, iou_thrs=BANDS[band],
                      max_dets=max_dets, area_ranges=FUZZ_AREAS)
        for gts, dts in per_image:
            ev.add_image(gts, dts)
        got = ev.accumulate()
        want_p, want_r, want_s = _oracle_accumulate(
            per_image, ev.iou_thrs, ev.rec_thrs, max_dets,
            FUZZ_AREAS, iou_type)
        np.testing.assert_allclose(
            got["precision"], want_p, atol=1e-12,
            err_msg=f"trial {trial} precision")
        np.testing.assert_allclose(
            got["recall"], want_r, atol=1e-12,
            err_msg=f"trial {trial} recall")
        np.testing.assert_allclose(
            got["scores"], want_s, atol=1e-12,
            err_msg=f"trial {trial} scores")


def test_fuzz_summary_stats_finite_and_bounded():
    rng = np.random.RandomState(7)
    for _ in range(5):
        per_image = _rand_scenario(rng, "bbox")
        ev = CocoEval(iou_type="bbox", area_ranges=FUZZ_AREAS)
        for gts, dts in per_image:
            ev.add_image(gts, dts)
        ev.accumulate()
        stats = ev.summarize()
        for k, v in stats.items():
            assert v == -1.0 or 0.0 <= v <= 1.0, (k, v)
