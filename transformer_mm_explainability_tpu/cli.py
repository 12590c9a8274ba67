"""Command-line entry points (the reference's CLI surface, C23).

Mirrors the flag families of VisualBERT/run.py + mmf/utils/flags.py
(--method / --num-samples / --is-positive-pert / --is-text-pert +
``opts`` dotlist overrides), DETR/main.py (--eval --masks --method) and
lxmert/perturbation.py, unified over one config system.

    python -m transformer_mm_explainability_tpu.cli explain-vit IMG ...
    python -m transformer_mm_explainability_tpu.cli perturbation \
        --model visual_bert --method ours_no_lrp --num-samples 100 \
        --is-text-pert false --is-positive-pert true ...
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

import numpy as np


def str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y")


# union of the per-model method families; each runner validates its own
# surface (pert_runner.VISUALBERT_METHODS / LXMERT_METHODS + aliases)
METHODS = ["ours_with_lrp", "ours_no_lrp", "transformer_att",
           "transformer_attribution", "partial_lrp", "raw_attn",
           "attn_gradcam", "rollout", "ours_no_lrp_no_norm",
           "ours_no_lrp_no_normalization",
           "ours_with_lrp_no_normalization", "ablation_no_self_in_10",
           "ablation_no_aggregation"]


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tmmx")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--method", default="ours_no_lrp", choices=METHODS,
                        help="explanation method (reference --method)")
        sp.add_argument("--checkpoint", default=None,
                        help="torch/orbax checkpoint to convert+load")
        sp.add_argument("--seed", type=int, default=1234)
        sp.add_argument("opts", nargs="*", default=[],
                        help="config dotlist overrides key=value")

    sp = sub.add_parser("explain-vit", help="ViT-B/16 relevancy map")
    sp.add_argument("image", help="image path (png/jpg)")
    sp.add_argument("--class-index", type=int, default=None)
    sp.add_argument("--output", default="vit_relevancy.png")
    common(sp)

    sp = sub.add_parser("explain-clip", help="CLIP bi-modal relevancy")
    sp.add_argument("image")
    sp.add_argument("texts", nargs="+")
    sp.add_argument("--start-layer", type=int, default=-1)
    sp.add_argument("--start-layer-text", type=int, default=-1)
    sp.add_argument("--output-prefix", default="clip_relevancy")
    common(sp)

    sp = sub.add_parser("perturbation",
                        help="pos/neg perturbation benchmark")
    sp.add_argument("--model", choices=["visual_bert", "lxmert"],
                    default="visual_bert")
    sp.add_argument("--num-samples", type=int, default=10000)
    sp.add_argument("--batch-size", type=int, default=8,
                    help="samples per jitted explain+perturb program "
                         "(protocol results are batch-size invariant)")
    sp.add_argument("--is-positive-pert", type=str2bool, default=False)
    sp.add_argument("--is-text-pert", type=str2bool, default=False)
    sp.add_argument("--questions", default=None, help="VQA questions json")
    sp.add_argument("--features", default=None, help="object-features TSV")
    sp.add_argument("--ans2label", default=None)
    sp.add_argument("--label2ans", default=None)
    sp.add_argument("--bert-vocab", default=None,
                    help="vocab.txt (bert-base-uncased layout)")
    common(sp)

    sp = sub.add_parser("lxmert-finetune",
                        help="LXMERT task finetune loop "
                             "(lxmert/src/tasks/vqa.py + "
                             "run/vqa_finetune.bash surface)")
    sp.add_argument("--task", choices=["vqa", "gqa", "nlvr2"],
                    default="vqa")
    sp.add_argument("--train-questions", default=None)
    sp.add_argument("--valid-questions", default=None)
    sp.add_argument("--features", default=None, help="object TSV")
    sp.add_argument("--ans2label", default=None)
    sp.add_argument("--label2ans", default=None)
    sp.add_argument("--bert-vocab", default=None)
    sp.add_argument("--llayers", type=int, default=9)
    sp.add_argument("--xlayers", type=int, default=5)
    sp.add_argument("--rlayers", type=int, default=5)
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--lr", type=float, default=5e-5)
    sp.add_argument("--epochs", type=int, default=4)
    sp.add_argument("--checkpoint", default=None)
    sp.add_argument("--seed", type=int, default=9595)

    sp = sub.add_parser("detr-eval",
                        help="DETR explanation-segmentation eval")
    sp.add_argument("--coco-path", default=None,
                    help="dir containing annotations json + images")
    sp.add_argument("--annotations", default=None,
                    help="instances json (defaults to "
                         "<coco-path>/annotations/instances_val2017.json)")
    sp.add_argument("--masks", action="store_true")
    sp.add_argument("--max-images", type=int, default=None)
    sp.add_argument("--shortest", type=int, default=800)
    common(sp)

    sp = sub.add_parser("predict",
                        help="prediction run -> EvalAI-style report "
                             "files (mmf_cli/predict.py flow)")
    sp.add_argument("--dataset", default="vqa2",
                    help="registered builder name")
    sp.add_argument("--annotations", required=True,
                    help="imdb .npy/.json annotation db")
    sp.add_argument("--features", required=True,
                    help="feature dir or .lmdb store")
    sp.add_argument("--bert-vocab", default=None,
                    help="vocab.txt (bert-base-uncased layout)")
    sp.add_argument("--label2ans", default=None,
                    help="answer-vocab txt (one answer per line) to "
                         "map class indices to strings")
    sp.add_argument("--report-folder", default="./reports")
    sp.add_argument("--file-format", choices=["json", "csv"],
                    default="json")
    sp.add_argument("--batch-size", type=int, default=32)
    sp.add_argument("--max-samples", type=int, default=None)
    sp.add_argument("--max-seq-length", type=int, default=128)
    sp.add_argument("--max-features", type=int, default=100)
    common(sp)

    sp = sub.add_parser("bench", help="run the ViT-B throughput bench")

    sp = sub.add_parser(
        "verify-parity",
        help="executable <1e-4 parity check vs reference fixtures "
             "(pass --weights the day the published checkpoint exists)")
    sp.add_argument("--family", required=True,
                    help="vit | clip | visual_bert | lxmert | detr")
    sp.add_argument("--weights", default=None,
                    help="published torch checkpoint to convert+verify")
    sp.add_argument("--reference", default="/root/reference",
                    help="reference checkout (for --weights re-runs)")
    sp.add_argument("--generate", action="store_true",
                    help="(re)generate the fixture from the in-process "
                         "reference generator")
    sp.add_argument("--device", default="cpu", choices=("cpu", "default"),
                    help="'cpu' (default) forces the CPU backend so a "
                         "parity run cannot wedge behind an exclusive "
                         "chip grant; 'default' keeps the process "
                         "backend (TPU when available)")

    sp = sub.add_parser(
        "protocol-rehearsal",
        help="protocol-scale rehearsal of the quantitative harnesses")
    sp.add_argument("--protocol", default="all",
                    choices=["all", "visualbert", "lxmert", "detr"])
    sp.add_argument("--out", default=None)
    return p


def cmd_explain_vit(args) -> int:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from transformer_mm_explainability_tpu.models import vit
    from transformer_mm_explainability_tpu.ops import image as img_ops
    from transformer_mm_explainability_tpu.utils import visualization as viz
    from transformer_mm_explainability_tpu.utils import convert

    cfg = vit.VIT_B_16
    if args.checkpoint:
        import torch

        sd = torch.load(args.checkpoint, map_location="cpu")
        params, cfg = convert.vit_from_state_dict(sd)
    else:
        print("note: no --checkpoint; using random weights (smoke mode)")
        params = vit.init_params(jax.random.PRNGKey(args.seed), cfg)

    raw = np.asarray(Image.open(args.image).convert("RGB"))
    # timm vit_base_patch16_224 transform: bicubic resize + center crop,
    # 0.5/0.5 normalisation
    img = img_ops.normalize(
        img_ops.center_crop(
            img_ops.resize_shortest_edge(
                jnp.asarray(raw, jnp.float32) / 255.0, cfg.image_size,
                method="bicubic"),
            cfg.image_size),
        (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    logits, _ = vit.forward(params, img[None], cfg)
    target = (int(np.argmax(np.asarray(logits[0])))
              if args.class_index is None else args.class_index)
    rel = vit.relevancy(params, img[None], jnp.asarray([target]), cfg)[0]
    fig = viz.relevancy_figure(np.asarray(img), np.asarray(rel),
                               (cfg.grid, cfg.grid))
    from PIL import Image as PILImage

    PILImage.fromarray(fig).save(args.output)
    print(json.dumps({"class_index": target, "output": args.output}))
    return 0


def cmd_explain_clip(args) -> int:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from transformer_mm_explainability_tpu.data import bpe
    from transformer_mm_explainability_tpu.explain import clip as expl_clip
    from transformer_mm_explainability_tpu.models import clip as clip_model
    from transformer_mm_explainability_tpu.ops import image as img_ops
    from transformer_mm_explainability_tpu.utils import (convert,
                                                         visualization as viz)

    if args.checkpoint:
        from transformer_mm_explainability_tpu.utils.clip_loader import (
            load_clip)

        params, cfg = load_clip(args.checkpoint)
    else:
        print("note: no --checkpoint; using random weights (smoke mode)")
        cfg = clip_model.CLIP_VIT_B_32
        params = clip_model.init_params(jax.random.PRNGKey(args.seed), cfg)

    raw = np.asarray(Image.open(args.image).convert("RGB"))
    img = img_ops.clip_preprocess(jnp.asarray(raw), cfg.image_resolution)
    tokens = jnp.asarray(bpe.tokenize(args.texts, cfg.context_length))
    R_txt, R_img, logits = expl_clip.interpret(
        params, img, tokens, cfg,
        start_layer=args.start_layer,
        start_layer_text=args.start_layer_text)
    grid = cfg.image_resolution // cfg.vision_patch_size
    probs = np.asarray(jax.nn.softmax(logits, -1))[0]
    outputs = []
    for i, text in enumerate(args.texts):
        fig = viz.relevancy_figure(np.asarray(img), np.asarray(R_img[i]),
                                   (grid, grid))
        out = f"{args.output_prefix}_{i}.png"
        Image.fromarray(fig).save(out)
        outputs.append(out)
    print(json.dumps({"probs": probs.tolist(), "outputs": outputs}))
    return 0


def cmd_perturbation(args) -> int:
    from transformer_mm_explainability_tpu.harness import pert_runner

    try:
        return pert_runner.run_from_args(args)
    except ValueError as e:
        if "perturbation method" in str(e):
            print(f"perturbation: {e}")
            return 2
        raise


def cmd_detr_eval(args) -> int:
    import os

    if not args.coco_path:
        print("detr-eval: pass --coco-path DIR (images) and "
              "--annotations instances.json; see harness/detr_eval.py "
              "for the programmatic API.")
        return 0

    import jax

    from transformer_mm_explainability_tpu.data.coco import CocoDetection
    from transformer_mm_explainability_tpu.harness import (detr_eval,
                                                           detr_segm)
    from transformer_mm_explainability_tpu.models import detr as jdetr

    ann = args.annotations or os.path.join(
        args.coco_path, "annotations", "instances_val2017.json")
    dataset = CocoDetection(ann, image_root=args.coco_path)
    if args.checkpoint:
        from transformer_mm_explainability_tpu.utils.clip_loader import (
            load_detr)

        params, cfg = load_detr(args.checkpoint)
    else:
        print("note: no --checkpoint; random weights (protocol smoke)")
        cfg = jdetr.DETR_R50
        params = jdetr.init_params(jax.random.PRNGKey(args.seed), cfg)
    result = detr_eval.evaluate(
        params, dataset, cfg,
        detr_segm.SegmConfig(method=args.method),
        max_images=args.max_images, shortest=args.shortest)
    print(json.dumps(result))
    return 0


def cmd_predict(args) -> int:
    import jax

    from transformer_mm_explainability_tpu.core.env import setup_imports
    from transformer_mm_explainability_tpu.core.registry import registry
    from transformer_mm_explainability_tpu.harness import predict
    from transformer_mm_explainability_tpu.models import (
        visual_bert as vb)

    setup_imports()  # register the builder/processor zoo

    if not args.bert_vocab:
        print("predict: pass --bert-vocab vocab.txt "
              "(bert-base-uncased layout)")
        return 2

    dcfg = {
        "annotations": args.annotations,
        "features": args.features,
        "max_features": args.max_features,
        "processors": {
            "text_processor": {
                "type": "bert_tokenizer",
                "params": {
                    "tokenizer_config": {"vocab_path": args.bert_vocab},
                    "max_seq_length": args.max_seq_length}},
        },
    }
    builder = registry.get("builder", args.dataset)()
    dataset = builder.load(dcfg, "test")

    cfg = vb.VISUAL_BERT_VQA2
    if args.checkpoint:
        from transformer_mm_explainability_tpu.utils.mmf_loader import (
            load_visual_bert)

        params, cfg = load_visual_bert(args.checkpoint, cfg)
    else:
        params = vb.init_params(jax.random.PRNGKey(args.seed), cfg)

    label2ans = None
    if args.label2ans:
        with open(args.label2ans, encoding="utf-8") as f:
            label2ans = [ln.rstrip("\n") for ln in f if ln.strip()]

    written = predict.predict_visual_bert(
        params, cfg, dataset, args.report_folder,
        dataset_name=args.dataset, batch_size=args.batch_size,
        label2ans=label2ans, max_samples=args.max_samples,
        file_format=args.file_format)
    for path in written:
        print(path)
    return 0


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "explain-vit":
        return cmd_explain_vit(args)
    if args.command == "explain-clip":
        return cmd_explain_clip(args)
    if args.command == "perturbation":
        return cmd_perturbation(args)
    if args.command == "lxmert-finetune":
        from transformer_mm_explainability_tpu.train import lxmert_tasks

        return lxmert_tasks.run_from_args(args)
    if args.command == "detr-eval":
        return cmd_detr_eval(args)
    if args.command == "predict":
        return cmd_predict(args)
    if args.command == "bench":
        import bench

        bench.main()
        return 0
    if args.command == "verify-parity":
        from transformer_mm_explainability_tpu.tools import verify_parity

        vp_args = ["--family", args.family, "--reference", args.reference,
                   "--device", args.device]
        if args.weights:
            vp_args += ["--weights", args.weights]
        if args.generate:
            vp_args.append("--generate")
        return verify_parity.main(vp_args)
    if args.command == "protocol-rehearsal":
        from transformer_mm_explainability_tpu.tools import (
            protocol_rehearsal)

        pr_args = ["--protocol", args.protocol]
        if args.out:
            pr_args += ["--out", args.out]
        return protocol_rehearsal.main(pr_args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
