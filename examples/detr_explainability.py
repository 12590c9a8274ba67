"""DETR per-detection relevancy demo — DETR.ipynb as a script.

    python examples/detr_explainability.py IMAGE [--checkpoint detr.pth]
        [--method ours_no_lrp]

For every confident detection: a heatmap over the encoder feature grid
showing which image regions drove that query, plus the Otsu-binarised
mask (notebook cell 5 / mask_generator pipeline). All kept queries are
explained in ONE batched fwd+bwd.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--method", default="ours_no_lrp",
                    help="any explain.detr.DETR_METHODS name "
                         "(ours_no_lrp, ours_with_lrp, raw_attn, rollout, "
                         "attn_gradcam, partial_lrp, transformer_att, ...)")
    ap.add_argument("--output-prefix", default="detr_expl")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from transformer_mm_explainability_tpu.harness import (detr_eval,
                                                           detr_segm)
    from transformer_mm_explainability_tpu.models import detr as jdetr
    from transformer_mm_explainability_tpu.utils import visualization as viz

    if args.checkpoint:
        from transformer_mm_explainability_tpu.utils.clip_loader import (
            load_detr)

        params, cfg = load_detr(args.checkpoint)
        shortest, longest, max_det = 512, 800, 8
    else:
        print("note: no --checkpoint; tiny random model (smoke mode)")
        cfg = jdetr.DETRConfig(num_classes=91, num_queries=20, d_model=64,
                               nheads=8, num_encoder_layers=2,
                               num_decoder_layers=2, dim_feedforward=128)
        params = jdetr.init_params(jax.random.PRNGKey(0), cfg)
        shortest, longest, max_det = 128, 256, 4

    raw = np.asarray(Image.open(args.image).convert("RGB"))
    img, valid = detr_eval.prepare_image(raw, shortest=shortest,
                                         longest=longest)
    out = detr_segm.explain_image(
        params, img, cfg,
        detr_segm.SegmConfig(method=args.method, max_detections=max_det,
                             confidence_threshold=0.5),
        pad_valid=valid)
    kept = out["valid"]
    print(f"{int(kept.sum())} detections above threshold")
    H, W = img.shape[:2]
    overlay = viz.mask_overlay(
        np.asarray((img - img.min()) / (img.max() - img.min()) * 255),
        out["masks"][kept])
    Image.fromarray(overlay).save(f"{args.output_prefix}_masks.png")
    print(f"masks -> {args.output_prefix}_masks.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
