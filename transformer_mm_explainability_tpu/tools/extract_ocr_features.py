"""OCR-region Faster R-CNN features for M4C/TextVQA (C34 tooling).

Re-design of
``VisualBERT/projects/m4c/scripts/extract_ocr_frcn_feature.py``: for
every imdb entry, take its OCR boxes (normalized xyxy × image size),
extract ROI features for EXACTLY those boxes (no RPN — the boxes are
forced, like the reference's ``input_boxes=`` path :93-113), and save
``<feature_path>.npy`` (features) + ``_info.npy`` ({ocr_boxes,
ocr_tokens}) per image (:165-189).

The feature head is the TPU-native VG Faster R-CNN
(``models/frcnn``): res4 backbone → roi_pool → res5 → mean-pool,
yielding 2048-d vectors.  (The reference pulls ``fc6`` activations
from the pythia *detectron* FPN checkpoint — a different published
backbone for the same role; this framework standardises on the VG
C4 model that the rest of the LXMERT/M4C pipeline uses.)

Box scaling follows extract_ocr_frcn_feature.py:50-56: scale the
shortest edge to ``target`` capped so the longest stays ≤ ``cap``,
and multiply the input boxes by the same scalar.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional, Tuple

import numpy as np


def image_scale(h: int, w: int, target: int = 800,
                cap: int = 1333) -> float:
    """The shortest-edge scale with longest-edge cap, matching
    ``ops/image.resize_shortest_edge`` EXACTLY (the image below is
    resized through it, so boxes must share its scale decision).
    Divergence pinned: extract_ocr_frcn_feature.py:50-56 applies
    ``np.round`` before comparing against the cap, which near the
    boundary (e.g. 600×1000 → scale·max = 1333.33 → round 1333) can
    pick a different branch than the resize itself."""
    scale = float(target) / float(min(h, w))
    if cap and max(h, w) * scale > cap:
        scale = float(cap) / float(max(h, w))
    return scale


def ocr_roi_features(params, image_u8: np.ndarray, boxes_xyxy: np.ndarray,
                     cfg=None, target: int = 800, cap: int = 1333):
    """[K, 4] pixel boxes on the raw image → [K, 2048] ROI features."""
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.models import frcnn

    cfg = cfg or frcnn.FRCNN_VG
    if boxes_xyxy.shape[0] == 0:
        return np.zeros((0, 2048), np.float32)
    h, w = int(image_u8.shape[0]), int(image_u8.shape[1])
    scale = image_scale(h, w, target, cap)
    img = frcnn.preprocess(jnp.asarray(image_u8), target_shortest=target,
                           longest_cap=cap)
    feats = frcnn._res4_features(params, img[None], cfg)[0]
    rois = frcnn.roi_pool(feats,
                          jnp.asarray(boxes_xyxy, jnp.float32) * scale,
                          cfg.pooler_resolution, 1.0 / cfg.feat_stride)
    return np.asarray(frcnn._res5_head(params, rois, cfg))


def dedupe_imdb(imdb) -> List[dict]:
    """extract_ocr_frcn_feature.py:166-168: one entry per image_id,
    sorted by id."""
    image_id2info = {info["image_id"]: info for info in imdb}
    return [image_id2info[k] for k in sorted(image_id2info)]


def extract_from_imdb(params, imdb, image_dir: str, save_dir: str,
                      cfg=None, target: int = 800, cap: int = 1333,
                      load_image=None) -> List[str]:
    """The reference main loop (:170-189).  Returns written feature
    paths.  ``load_image``: path → RGB uint8 array (defaults to PIL)."""
    if load_image is None:
        from PIL import Image

        def load_image(p):
            return np.asarray(Image.open(p).convert("RGB"))

    written = []
    for info in dedupe_imdb(imdb):
        image_path = os.path.join(image_dir, info["image_path"])
        save_feat_path = os.path.join(save_dir, info["feature_path"])
        save_info_path = save_feat_path.replace(".npy", "_info.npy")
        os.makedirs(os.path.dirname(save_feat_path), exist_ok=True)

        w = info["image_width"]
        h = info["image_height"]
        ocr_boxes = (np.array(info["ocr_normalized_boxes"],
                              np.float32).reshape(-1, 4) * [w, h, w, h])
        ocr_tokens = info["ocr_tokens"]
        if len(ocr_boxes) > 0:
            feat = ocr_roi_features(params, load_image(image_path),
                                    ocr_boxes, cfg, target, cap)
        else:
            feat = np.zeros((0, 2048), np.float32)
        np.save(save_info_path,
                {"ocr_boxes": ocr_boxes, "ocr_tokens": ocr_tokens})
        np.save(save_feat_path, feat)
        written.append(save_feat_path)
    return written


def main(argv: Optional[List[str]] = None) -> None:
    import jax

    from transformer_mm_explainability_tpu.models import frcnn
    from transformer_mm_explainability_tpu.utils import convert

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="frcnn-vg-finetuned state dict (.bin); "
                        "random weights if omitted (smoke runs)")
    parser.add_argument("--imdb_file", type=str, required=True)
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--save_dir", type=str, required=True)
    args = parser.parse_args(argv)

    if args.checkpoint:
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu")
        params = convert.frcnn_from_state_dict(sd)
    else:
        params = frcnn.init_params(jax.random.PRNGKey(0))

    imdb = np.load(args.imdb_file, allow_pickle=True)[1:]
    written = extract_from_imdb(params, imdb, args.image_dir,
                                args.save_dir)
    print(f"wrote {len(written)} feature files to {args.save_dir}")


if __name__ == "__main__":
    main()
