"""CLIP bi-modal relevancy demo — CLIP_explainability.ipynb as a script.

    python examples/clip_explainability.py IMAGE "a dog" "a cat" \
        [--checkpoint ViT-B-32.pt] [--start-layer -1]

For each text prompt: an image heatmap (which patches supported the
match) and a per-token text heatmap (HTML), plus the match
probabilities — notebook cells 5-8.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("texts", nargs="+")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--start-layer", type=int, default=-1)
    ap.add_argument("--start-layer-text", type=int, default=-1)
    ap.add_argument("--output-prefix", default="clip_relevancy")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from transformer_mm_explainability_tpu import cli
    from transformer_mm_explainability_tpu.data import bpe
    from transformer_mm_explainability_tpu.utils import visualization as viz

    rc = cli.main([
        "explain-clip", args.image, *args.texts,
        "--start-layer", str(args.start_layer),
        "--start-layer-text", str(args.start_layer_text),
        "--output-prefix", args.output_prefix,
        *(["--checkpoint", args.checkpoint] if args.checkpoint else []),
    ])

    # text heatmaps (show_heatmap_on_text equivalent) as HTML
    import jax

    from transformer_mm_explainability_tpu.explain import clip as eclip
    from transformer_mm_explainability_tpu.models import clip as mclip
    from transformer_mm_explainability_tpu.ops import image as img_ops

    if args.checkpoint:
        from transformer_mm_explainability_tpu.utils.clip_loader import (
            load_clip)

        params, cfg = load_clip(args.checkpoint)
    else:
        cfg = mclip.CLIP_VIT_B_32
        params = mclip.init_params(jax.random.PRNGKey(1234), cfg)
    raw = np.asarray(Image.open(args.image).convert("RGB"))
    img = img_ops.clip_preprocess(jnp.asarray(raw), cfg.image_resolution)
    tokens = bpe.tokenize(args.texts, cfg.context_length)
    R_txt, _, _ = eclip.interpret(params, img, jnp.asarray(tokens), cfg,
                                  args.start_layer, args.start_layer_text)
    tok = bpe.ClipTokenizer()
    rows = eclip.text_token_relevance(R_txt, jnp.asarray(tokens))
    html = []
    for i, text in enumerate(args.texts):
        n = int((tokens[i] != 0).sum())
        words = [tok.decode([int(t)]) for t in tokens[i][1:n - 1]]
        scores = np.asarray(rows[i][1:n - 1])
        html.append(viz.text_heatmap_html(words, scores, title=text))
    out = f"{args.output_prefix}_text.html"
    with open(out, "w") as f:
        f.write("\n".join(html))
    print(f"text heatmaps -> {out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
