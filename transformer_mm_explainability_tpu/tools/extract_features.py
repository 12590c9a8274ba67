"""FRCNN feature extraction → object TSV (C10/C19 tooling).

Re-design of the reference's caffe/BUTD extraction scripts
(``data/mscoco_imgfeat/extract_coco_image.py``,
``data/vg_gqa_imgfeat/extract_gqa_image.py``,
``data/nlvr2_imgfeat/extract_nlvr2_image.py``): run the TPU-native
Faster R-CNN frontend (``models/frcnn``) over a folder of images and
write the FIELDNAMES base64 TSV (``lxmert/src/utils.py:12-29``) that
the LXMERT datasets consume — the exact store our native C++ reader
parses back.

TPU notes: detection is jitted per padded input shape; images bucket
to the preprocessing target so one compile serves the whole folder.
"""

from __future__ import annotations

import argparse
import base64
import csv
import os
import sys
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

FIELDNAMES = ["img_id", "img_h", "img_w", "objects_id", "objects_conf",
              "attrs_id", "attrs_conf", "num_boxes", "boxes", "features"]

csv.field_size_limit(sys.maxsize)


def _b64(arr: np.ndarray, dtype) -> str:
    return base64.b64encode(
        np.ascontiguousarray(arr, dtype).tobytes()).decode("ascii")


def encode_row(img_id: str, img_h: int, img_w: int,
               out: Dict[str, np.ndarray]) -> Dict[str, object]:
    """One detection output → one TSV row (utils.py FIELDNAMES)."""
    valid = np.asarray(out["valid"]).astype(bool)
    n = int(valid.sum())
    return {
        "img_id": img_id,
        "img_h": img_h,
        "img_w": img_w,
        "objects_id": _b64(np.asarray(out["obj_ids"])[valid], np.int64),
        "objects_conf": _b64(np.asarray(out["obj_probs"])[valid],
                             np.float32),
        "attrs_id": _b64(np.asarray(out["attr_ids"])[valid], np.int64),
        "attrs_conf": _b64(np.asarray(out["attr_probs"])[valid],
                           np.float32),
        "num_boxes": n,
        "boxes": _b64(np.asarray(out["boxes"])[valid], np.float32),
        "features": _b64(np.asarray(out["roi_features"])[valid],
                         np.float32),
    }


def extract_to_tsv(images: Iterable[Tuple[str, np.ndarray]],
                   out_path: str, params=None, cfg=None,
                   target_shortest: int = 800,
                   seed: int = 0) -> int:
    """Run FRCNN over ``(img_id, RGB uint8 HWC)`` pairs, append rows to
    ``out_path``.  Random weights unless ``params`` given (converted
    real weights via utils/convert.frcnn_from_state_dict)."""
    import jax
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.models import frcnn

    cfg = cfg or frcnn.FRCNN_VG
    if params is None:
        params = frcnn.init_params(jax.random.PRNGKey(seed), cfg)

    fwd = jax.jit(lambda p, im: frcnn.forward(p, im, cfg))
    n_rows = 0
    with open(out_path, "a", newline="") as f:
        writer = csv.DictWriter(f, FIELDNAMES, delimiter="\t")
        for img_id, rgb in images:
            h, w = int(rgb.shape[0]), int(rgb.shape[1])
            pre = frcnn.preprocess(jnp.asarray(rgb),
                                   target_shortest=target_shortest)
            out = fwd(params, pre)
            # boxes come back in preprocessed pixels; rescale to the
            # original image like the BUTD scripts do
            sy = h / float(pre.shape[0])
            sx = w / float(pre.shape[1])
            boxes = np.asarray(out["boxes"]) * np.asarray(
                [sx, sy, sx, sy], np.float32)
            row_out = dict(out)
            row_out["boxes"] = boxes
            writer.writerow(encode_row(str(img_id), h, w, row_out))
            n_rows += 1
    return n_rows


def iter_image_dir(img_root: str) -> Iterable[Tuple[str, np.ndarray]]:
    """BUTD load_image_ids convention: the stem is the image id."""
    from PIL import Image

    for name in sorted(os.listdir(img_root)):
        if not name.lower().endswith((".jpg", ".jpeg", ".png")):
            continue
        img_id = name.split(".")[0]
        yield img_id, np.asarray(
            Image.open(os.path.join(img_root, name)).convert("RGB"))


def main(argv: Optional[Sequence[str]] = None):
    p = argparse.ArgumentParser(
        description="Extract FRCNN object features into an object TSV")
    p.add_argument("--img-root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="frcnn-vg-finetuned state dict (.npz/.pth)")
    p.add_argument("--target-shortest", type=int, default=800)
    args = p.parse_args(argv)
    params = None
    if args.checkpoint:
        import torch

        from transformer_mm_explainability_tpu.models import frcnn
        from transformer_mm_explainability_tpu.utils.convert import (
            frcnn_from_state_dict)
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=False)
        params = frcnn_from_state_dict(sd, frcnn.FRCNN_VG)
    n = extract_to_tsv(iter_image_dir(args.img_root), args.out,
                       params=params,
                       target_shortest=args.target_shortest)
    print(f"wrote {n} rows to {args.out}")


if __name__ == "__main__":
    main()
