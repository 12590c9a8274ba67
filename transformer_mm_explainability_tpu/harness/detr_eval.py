"""DETR explanation-segmentation evaluation loop (engine.evaluate's
--masks path, C17 end-to-end wiring).

Drives data/coco.CocoDetection through harness/detr_segm.explain_image
and scores with the pycocotools-free segm mAP (IoU band lowered to
0.2:0.95 per the reference protocol, README.rst:116-145).
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
    Otsu masks → match against GT instance masks. Returns segm mAP."""
    detections: List[Dict] = []
    ids = dataset.image_ids[:max_images]
    for n, image_id in enumerate(ids):
        raw = dataset.load_image(image_id)
        target = dataset.target(image_id)
        img, valid = prepare_image(raw, shortest)
        out = detr_segm.explain_image(params, img, cfg, segm_cfg,
                                      pad_valid=valid)
        k = out["valid"]
        H, W = raw.shape[:2]
        # GT masks were rasterised at the original size; resize pred
        # masks back from the padded/resized grid
        ph, pw = img.shape[:2]
        # portion of the padded canvas covered by the resized image
        scale = shortest / min(H, W)
        if max(H, W) * scale > 1333:
            scale = 1333 / max(H, W)
        rh, rw = int(round(H * scale)), int(round(W * scale))
        pred_masks = out["masks"][:, :rh, :rw]
        import jax

        pred_masks = np.asarray(jax.image.resize(
            jnp.asarray(pred_masks), (pred_masks.shape[0], H, W),
            method="nearest"))
        gt_masks = target.get("masks", np.zeros((0, H, W), np.uint8))
        iou = detr_segm.mask_iou(pred_masks[k], gt_masks)
        detections.append({
            "scores": out["scores"][k],
            "classes": out["classes"][k],
            "iou": iou,
            "gt_classes": target["labels"],
        })
        if (n + 1) % 50 == 0:
            printer(f"[{n + 1}/{len(ids)}] images explained")
    result = detr_segm.segm_map(detections, iou_thresholds)
    printer(f"segm mAP (IoU 0.2:0.95): {result['segm_mAP']:.4f}")
    return result
