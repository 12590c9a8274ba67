"""DETR explanation-segmentation evaluation loop (engine.evaluate's
--masks path, C17 end-to-end wiring).

Drives data/coco.CocoDetection through harness/detr_segm.explain_image
and scores with the COCOeval-faithful evaluator (harness/coco_eval —
the reference protocol's pycocotools ``CocoEvaluator``,
DETR/engine.py:153-216; ``iou_thresholds`` lets the band be lowered).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from transformer_mm_explainability_tpu.data.coco import CocoDetection
from transformer_mm_explainability_tpu.harness import detr_segm
from transformer_mm_explainability_tpu.models import detr as detr_model
from transformer_mm_explainability_tpu.ops import image as img_ops


def prepare_image(raw: np.ndarray, shortest: int = 800,
                  longest: int = 1333,
                  size_divisor: int = 32) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DETR val preprocessing: resize shortest edge, ImageNet normalise,
    pad bottom/right to a /32 bucket (static-shape friendly).
    Returns (padded image, valid mask)."""
    img = jnp.asarray(raw, jnp.float32) / 255.0
    img = img_ops.resize_shortest_edge(img, shortest, longest)
    img = img_ops.normalize(img, img_ops.IMAGENET_MEAN, img_ops.IMAGENET_STD)
    h, w = img.shape[:2]
    ph = (h + size_divisor - 1) // size_divisor * size_divisor
    pw = (w + size_divisor - 1) // size_divisor * size_divisor
    return img_ops.pad_to(img, ph, pw)


def evaluate(
    params,
    dataset: CocoDetection,
    cfg: detr_model.DETRConfig = detr_model.DETR_R50,
    segm_cfg: detr_segm.SegmConfig = detr_segm.SegmConfig(),
    max_images: Optional[int] = None,
    shortest: int = 800,
    iou_thresholds: Optional[np.ndarray] = None,
    printer=print,
) -> Dict[str, float]:
    """Per-image: preprocess → detect → batched per-query relevancy →
    Otsu masks → COCOeval-faithful scoring. Returns the 12-stat dict."""
    from transformer_mm_explainability_tpu.harness.coco_eval import CocoEval

    evaluator = CocoEval(iou_type="segm", iou_thrs=iou_thresholds)
    ids = dataset.image_ids[:max_images]
    for n, image_id in enumerate(ids):
        raw = dataset.load_image(image_id)
        target = dataset.target(image_id)
        img, valid = prepare_image(raw, shortest)
        out = detr_segm.explain_image(params, img, cfg, segm_cfg,
                                      pad_valid=valid, pack_masks=True)
        k = out["valid"]
        H, W = raw.shape[:2]
        # GT masks were rasterised at the original size; resize pred
        # masks back from the padded/resized grid. Masks cross the
        # device boundary as bit-planes (pack_mask_bits: 32x smaller
        # transfer) and the crop + nearest resize runs on the host —
        # the old dense path re-uploaded 348 MB per protocol image
        # just to run a nearest-neighbour gather on device
        scale = shortest / min(H, W)
        if max(H, W) * scale > 1333:
            scale = 1333 / max(H, W)
        rh, rw = int(round(H * scale)), int(round(W * scale))
        dense = detr_segm.unpack_mask_bits(out["masks_packed"],
                                           out["mask_hw"][1])
        dense = dense[:, :rh, :rw]
        # floor((i+0.5)·scale) == jax.image.resize 'nearest' (the path
        # this host gather replaced); np.round(x-0.5) banker's-rounds
        # exact-integer x down, shifting tie rows by one pixel
        yi = np.clip(np.floor((np.arange(H) + 0.5) * rh / H)
                     .astype(np.int64), 0, rh - 1)
        xi = np.clip(np.floor((np.arange(W) + 0.5) * rw / W)
                     .astype(np.int64), 0, rw - 1)
        pred_masks = dense[:, yi[:, None], xi[None, :]][k]
        # evaluator-side GT: non-crowd AND crowd annotations (the
        # training target() drops crowds per the reference loader, but
        # pycocotools scores against the full GT — crowds become
        # ignore regions in CocoEval)
        from transformer_mm_explainability_tpu.data.coco import (
            eval_ground_truths)
        gts = []
        for entry in eval_ground_truths(dataset, image_id):
            gt = {"category_id": int(entry["category_id"]),
                  "iscrowd": entry["iscrowd"],
                  "area": float(entry["area"])}
            if "mask" in entry:
                gt["mask"] = entry["mask"]
            else:
                gt["mask"] = np.zeros((H, W), np.uint8)
            gts.append(gt)
        dts = [{"category_id": int(c), "score": float(s), "mask": m}
               for c, s, m in zip(out["classes"][k], out["scores"][k],
                                  pred_masks)]
        evaluator.add_image(gts, dts, image_id=int(image_id))
        if (n + 1) % 50 == 0:
            printer(f"[{n + 1}/{len(ids)}] images explained")
    evaluator.accumulate()
    stats = evaluator.summarize()
    printer(f"segm AP: {stats['AP']:.4f}  AP50: {stats['AP50']:.4f}  "
            f"AP75: {stats['AP75']:.4f}")
    return stats
