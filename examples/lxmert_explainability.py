"""LXMERT bi-modal explainability demo — the reference's flagship
notebook (lxmert/src/.ipynb_checkpoints/Untitled-checkpoint.ipynb /
the paper's LXMERT.PNG figure) as a script.

    python examples/lxmert_explainability.py IMAGE "what is the question?"
        [--frcnn-checkpoint pytorch_model.bin]
        [--checkpoint lxmert_vqa.pth --bert-vocab vocab.txt
         --label2ans trainval_label2ans.json]
        [--method ours_no_lrp]

Pipeline (end to end on device):
  image → Faster R-CNN visual frontend (36 boxes + 2048-d features)
        → LXMERT VQA forward + one fused bwd (models/lxmert.capture)
        → bi-modal relevancy for the PREDICTED answer
        → per-box image heatmap painted onto the photo + per-token
          text heatmap (utils/visualization).

Without checkpoints it runs tiny random models end-to-end (smoke
mode): the wiring, shapes and rendering are all real; only the
weights are not.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def boxes_to_pixel_cam(boxes_xyxy: np.ndarray, rel: np.ndarray,
                       h: int, w: int) -> np.ndarray:
    """Per-box relevancy → [H, W] map: each box painted with its
    score, max where boxes overlap (the notebook paints box scores
    onto the image the same way)."""
    cam = np.zeros((h, w), np.float32)
    for box, r in zip(boxes_xyxy, rel):
        x1, y1, x2, y2 = [int(round(float(v))) for v in box]
        x1, y1 = max(x1, 0), max(y1, 0)
        x2, y2 = min(x2, w), min(y2, h)
        if x2 > x1 and y2 > y1:
            cam[y1:y2, x1:x2] = np.maximum(cam[y1:y2, x1:x2], float(r))
    if cam.max() > cam.min():
        cam = (cam - cam.min()) / (cam.max() - cam.min())
    return cam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("question")
    ap.add_argument("--method", default="ours_no_lrp",
                    help="any harness.pert_runner.LXMERT_METHODS name")
    ap.add_argument("--frcnn-checkpoint", default=None,
                    help="unc-nlp/frcnn-vg-finetuned pytorch_model.bin")
    ap.add_argument("--checkpoint", default=None,
                    help="LXMERT VQA torch checkpoint")
    ap.add_argument("--bert-vocab", default=None,
                    help="bert-base-uncased vocab.txt (required with "
                         "--checkpoint)")
    ap.add_argument("--label2ans", default=None,
                    help="trainval_label2ans.json (answer strings)")
    ap.add_argument("--output-prefix", default="lxmert_expl")
    args = ap.parse_args()

    import jax
    from PIL import Image

    from transformer_mm_explainability_tpu.data import vqa as vqa_data
    from transformer_mm_explainability_tpu.data.tokenization import (
        BertTokenizer)
    from transformer_mm_explainability_tpu.harness.pert_runner import (
        LxmertPerturbationRunner)
    from transformer_mm_explainability_tpu.models import frcnn
    from transformer_mm_explainability_tpu.models import lxmert as lx
    from transformer_mm_explainability_tpu.utils import visualization as viz

    rgb = np.asarray(Image.open(args.image).convert("RGB"))
    h, w = rgb.shape[:2]

    # --- visual frontend (modeling_frcnn.GeneralizedRCNN equivalent) ----
    if args.frcnn_checkpoint:
        import torch

        from transformer_mm_explainability_tpu.utils import convert

        fcfg = frcnn.FRCNN_VG
        fparams = convert.frcnn_from_state_dict(
            torch.load(args.frcnn_checkpoint, map_location="cpu"), fcfg)
        shortest = 800
    else:
        print("note: no --frcnn-checkpoint; tiny random FRCNN "
              "(smoke mode)")
        fcfg = frcnn.FrcnnConfig(
            stages=(1, 1, 1, 1), anchor_sizes=(32, 64),
            aspect_ratios=(1.0,), pre_nms_topk=50, post_nms_topk=12,
            pooler_resolution=4, num_classes=9, num_attrs=5,
            max_detections=8,
            # random weights rarely clear the VG confidence threshold;
            # keep every box so the smoke run exercises the image path
            score_thresh=0.0)
        fparams = frcnn.init_params(jax.random.PRNGKey(0), fcfg)
        shortest = 128

    pre = frcnn.preprocess(rgb, target_shortest=shortest)
    det = jax.jit(lambda p, im: frcnn.forward(p, im, fcfg))(fparams, pre)
    valid = np.asarray(det["valid"]).astype(bool)
    n = int(valid.sum())
    print(f"FRCNN: {n} detections")
    # boxes back in original-image pixels for display
    sy, sx = h / float(pre.shape[0]), w / float(pre.shape[1])
    boxes_px = (np.asarray(det["boxes"])
                * np.asarray([sx, sy, sx, sy], np.float32))
    if n == 0:
        # random weights can leave no NMS-surviving proposal; fall back
        # to a box grid so the rendering path still shows something
        print("note: no surviving proposals; using a 2x4 box grid")
        gy, gx = 2, 4
        grid = np.asarray(
            [[j * w / gx, i * h / gy, (j + 1) * w / gx, (i + 1) * h / gy]
             for i in range(gy) for j in range(gx)], np.float32)
        m = det["roi_features"].shape[0]
        boxes_px = np.zeros((m, 4), np.float32)
        boxes_px[: gy * gx] = grid
        det = dict(det)
        det["normalized_boxes"] = boxes_px / np.asarray(
            [w, h, w, h], np.float32)
        valid = np.arange(m) < gy * gx
        n = gy * gx

    # pad/clip to the LXMERT visual span (36), like the TSV pipeline
    max_boxes = 36
    feats = np.zeros((max_boxes, 2048), np.float32)
    pos = np.zeros((max_boxes, 4), np.float32)
    k = min(n, max_boxes)
    roi = np.asarray(det["roi_features"])[valid][:k]
    feats[:k, :roi.shape[1]] = roi
    pos[:k] = np.asarray(det["normalized_boxes"])[valid][:k]

    # --- language side ---------------------------------------------------
    if args.bert_vocab:
        tok = BertTokenizer(vocab_path=args.bert_vocab)
    else:
        words = args.question.lower().replace("?", " ?").split()
        vocab = {t: i for i, t in enumerate(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
            + sorted(set(words)))}
        tok = BertTokenizer(vocab=vocab)
    enc = tok.encode_vqa(args.question, max_len=20)
    st = int(enc["input_mask"].sum())
    tokens = [tok.inv.get(int(i), "?") for i in enc["input_ids"][:st]]

    # --- LXMERT + relevancy ----------------------------------------------
    label2ans = (json.load(open(args.label2ans))
                 if args.label2ans else None)
    num_labels = len(label2ans) if label2ans else 3129
    cfg = __import__("dataclasses").replace(
        lx.LXMERT_VQA, num_qa_labels=num_labels)
    if args.checkpoint:
        from transformer_mm_explainability_tpu.harness.pert_runner import (
            _load_lx)

        params = _load_lx(args.checkpoint, cfg)
    else:
        print("note: no --checkpoint; random LXMERT (smoke mode)")
        params = lx.init_params(jax.random.PRNGKey(1), cfg)

    runner = LxmertPerturbationRunner(params, cfg, args.method,
                                      positive=False, text_pert=False)
    batch = {
        "input_ids": enc["input_ids"][None],
        "attention_mask": enc["input_mask"][None],
        "visual_feats": feats[None],
        "visual_pos": pos[None],
        "visual_mask": (np.arange(max_boxes) < k)[None].astype(np.int32),
    }
    scores, cam_text, cam_image = runner.explain_batched(batch)
    pred = int(np.argmax(scores[0]))
    answer = label2ans[pred] if label2ans else f"label #{pred}"
    print(f"Q: {args.question}")
    print(f"A: {answer}")

    # --- render ------------------------------------------------------------
    cam = boxes_to_pixel_cam(boxes_px[valid][:k], cam_image[0][:k], h, w)
    img01 = rgb.astype(np.float32) / 255.0
    overlay = (viz.show_cam_on_image(img01, cam) * 255).astype(np.uint8)
    top = np.argsort(cam_image[0][:k])[::-1][: min(5, k)]
    overlay = viz.draw_boxes(overlay, boxes_px[valid][:k][top],
                             scores=cam_image[0][:k][top])
    Image.fromarray(overlay).save(f"{args.output_prefix}_image.png")
    print(f"image relevancy -> {args.output_prefix}_image.png")

    html = viz.text_heatmap_html(tokens, cam_text[0][:st],
                                 title=f"{args.question} → {answer} "
                                       f"({args.method})")
    with open(f"{args.output_prefix}_text.html", "w") as f:
        f.write(html)
    print(f"text relevancy  -> {args.output_prefix}_text.html")
    return 0


if __name__ == "__main__":
    sys.exit(main())
