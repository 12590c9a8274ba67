"""ViT-B/16 relevancy demo — the Transformer_MM_explainability_ViT
notebook as a script.

    python examples/vit_explainability.py IMAGE [--checkpoint VIT.pth]
                                           [--class-index N]

Produces a JET-overlay heatmap of which patches drove the predicted
(or given) class — cell 7/8 of the notebook, in one jitted program.
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
    ap.add_argument("--class-index", type=int, default=None)
    ap.add_argument("--output", default="vit_relevancy.png")
    args = ap.parse_args()

    from transformer_mm_explainability_tpu import cli

    return cli.main([
        "explain-vit", args.image, "--output", args.output,
        *(["--checkpoint", args.checkpoint] if args.checkpoint else []),
        *(["--class-index", str(args.class_index)]
          if args.class_index is not None else []),
    ])


if __name__ == "__main__":
    sys.exit(main())
