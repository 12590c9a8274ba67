"""Perturbation benchmark driver (the ``mmf_pert`` trainer /
lxmert perturbation.py main-loop equivalent).

Streams VQA samples, computes the chosen method's relevancy via ONE
jitted capture+generate program, runs the step-batched perturbation
forward, and prints running per-step accuracies exactly like the
reference (evaluation_loop.py:167-169, perturbation.py:250-251).
"""

from __future__ import annotations

import json
from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from transformer_mm_explainability_tpu.harness import perturbation as pert


class VisualBertPerturbationRunner:
    """Per-sample pipeline for MMF-style VisualBERT VQA batches."""

    def __init__(self, params, cfg, method: str = "ours_no_lrp",
                 positive: bool = False, text_pert: bool = False):
        from transformer_mm_explainability_tpu.explain import (
            visual_bert as evb)
        from transformer_mm_explainability_tpu.models import (
            visual_bert as vb)

        self.params = params
        self.cfg = cfg
        self.method = method
        self.positive = positive
        self.text_pert = text_pert
        self.steps = (pert.TEXT_STEPS if text_pert
                      else pert.IMAGE_STEPS_VISUALBERT)
        self._vb = vb
        self._evb = evb

        @jax.jit
        def explain(params, batch, target):
            scores, attn, grads = vb.capture(params, batch, target, cfg)
            cls_index = batch["input_mask"].sum(axis=1) - 2
            if method in ("ours_no_lrp", "ours_with_lrp"):
                if method == "ours_with_lrp":
                    out = vb.forward(
                        params, batch["input_ids"], batch["input_mask"],
                        batch.get("visual_embeddings"), cfg=cfg,
                        return_tape=True)
                    one_hot = jax.nn.one_hot(target, cfg.num_labels)
                    _, cams = vb.relprop(params, out["tape"], one_hot, cfg)
                    return scores, evb.generate_ours(cams, grads, cls_index)
                return scores, evb.generate_ours(attn, grads, cls_index)
            if method == "raw_attn":
                return scores, evb.generate_raw_attn(attn, cls_index)
            if method == "rollout":
                return scores, evb.generate_rollout(attn, cls_index)
            if method == "attn_gradcam":
                return scores, evb.generate_attn_gradcam(attn, grads,
                                                         cls_index)
            raise ValueError(method)

        self._explain = explain

        @jax.jit
        def run_pert(params, batch, cam, targets, text_len):
            def fwd_scores(b):
                out = vb.forward(params, b["input_ids"], b["input_mask"],
                                 b.get("visual_embeddings"),
                                 visual_mask=b.get("visual_mask"), cfg=cfg)
                return out["scores"]

            if text_pert:
                S_text = batch["input_ids"].shape[1]
                always = jnp.zeros((S_text,), bool)
                # protect [CLS](0), '?' (len-2) and [SEP](len-1)
                always = always.at[0].set(True)
                always = jnp.where(
                    jnp.arange(S_text) >= text_len - 2, True, always)
                return pert.run_text_perturbation(
                    fwd_scores, batch, cam[:S_text], targets, self.steps,
                    positive, always, text_len)
            S_text = batch["input_ids"].shape[1]
            return pert.run_image_perturbation(
                fwd_scores, batch, cam[S_text:], targets, self.steps,
                positive)

        self._run_pert = run_pert

    def run_sample(self, batch: Dict[str, jnp.ndarray],
                   soft_targets: jnp.ndarray) -> np.ndarray:
        scores, cam = self._explain(
            self.params, batch,
            jnp.argmax(jnp.asarray(soft_targets))[None])
        text_len = batch["input_mask"].sum(axis=1)[0]
        accs = self._run_pert(self.params, batch, cam[0],
                              jnp.asarray(soft_targets), text_len)
        return np.asarray(accs)

    def run_samples_batched(self, batch: Dict[str, jnp.ndarray],
                            soft_targets: jnp.ndarray) -> np.ndarray:
        """Image-perturbation fast path: N samples explained in one
        capture and perturbed in one (N·steps)-batched forward.
        ``batch`` leaves have a leading N axis; ``soft_targets``
        [N, num_labels]. Returns [N, n_steps]."""
        assert not self.text_pert, "batched mode implements image pert"
        if not hasattr(self, "_batched"):
            vb, evb = self._vb, self._evb
            cfg, method, positive = self.cfg, self.method, self.positive
            steps = self.steps

            @jax.jit
            def batched(params, batch, targets_soft):
                targets = jnp.argmax(targets_soft, axis=-1)
                scores, attn, grads = vb.capture(params, batch, targets, cfg)
                cls_index = batch["input_mask"].sum(axis=1) - 2
                if method == "ours_no_lrp":
                    cam = evb.generate_ours(attn, grads, cls_index)
                elif method == "raw_attn":
                    cam = evb.generate_raw_attn(attn, cls_index)
                elif method == "rollout":
                    cam = evb.generate_rollout(attn, cls_index)
                elif method == "attn_gradcam":
                    cam = evb.generate_attn_gradcam(attn, grads, cls_index)
                else:
                    raise ValueError(method)
                S_text = batch["input_ids"].shape[1]

                def fwd_scores(b):
                    out = vb.forward(
                        params, b["input_ids"], b["input_mask"],
                        b.get("visual_embeddings"),
                        visual_mask=b.get("visual_mask"), cfg=cfg)
                    return out["scores"]

                return pert.run_image_perturbation_batch(
                    fwd_scores, batch, cam[:, S_text:], targets_soft,
                    steps, positive)

            self._batched = batched
        return np.asarray(self._batched(self.params, batch,
                                        jnp.asarray(soft_targets)))


def run_loop(runner, samples: Iterable, max_samples: int,
             printer=print) -> np.ndarray:
    """Accumulate per-step accuracies with the reference's running
    printout. Returns the final per-step accuracy vector."""
    totals = None
    n = 0
    for batch, soft_targets in samples:
        accs = runner.run_sample(batch, soft_targets)
        totals = accs if totals is None else totals + accs
        n += 1
        if n % 100 == 0 or n == max_samples:
            running = totals / n
            printer(f"[{n}/{max_samples}] step accuracies: "
                    + " ".join(f"{a*100:.2f}" for a in running))
        if n >= max_samples:
            break
    running = totals / max(n, 1)
    printer(json.dumps({
        "num_samples": n,
        "steps": list(runner.steps),
        "step_accuracies": [float(a) for a in running],
        "auc": pert.auc(running, runner.steps),
    }))
    return running


class LxmertPerturbationRunner:
    """Per-sample pipeline for LXMERT VQA batches
    (lxmert/perturbation.py's ModelPert, TPU-shaped).

    Consumes precomputed FRCNN features (the reference recomputes the
    CNN per step on the SAME image — identical features; here they're
    computed once, or loaded from TSV)."""

    def __init__(self, params, cfg, method: str = "ours_no_lrp",
                 positive: bool = False, text_pert: bool = False):
        from transformer_mm_explainability_tpu.explain import (
            lxmert as elx)
        from transformer_mm_explainability_tpu.models import (
            lxmert as lx)

        self.params = params
        self.cfg = cfg
        self.positive = positive
        self.text_pert = text_pert
        self.steps = pert.LXMERT_STEPS

        @jax.jit
        def explain(params, batch, target):
            scores, attn, grads = lx.capture(params, batch, target, cfg)
            if method in ("ours_no_lrp", "ours_with_lrp"):
                if method == "ours_with_lrp":
                    from transformer_mm_explainability_tpu.models import (
                        lxmert_lrp)

                    out = lx.forward(
                        params, batch["input_ids"],
                        batch["attention_mask"], batch["visual_feats"],
                        batch["visual_pos"], cfg=cfg, return_tape=True)
                    one_hot = jax.nn.one_hot(target, cfg.num_qa_labels)
                    _, _, cams = lxmert_lrp.relprop(
                        params, out["tape"], one_hot,
                        out["tape"]["lang_mask"], out["tape"]["visn_mask"],
                        cfg)
                    tt, ti = elx.generate_ours(cams, grads)
                else:
                    tt, ti = elx.generate_ours(attn, grads)
            elif method == "transformer_att":
                from transformer_mm_explainability_tpu.models import (
                    lxmert_lrp)

                out = lx.forward(
                    params, batch["input_ids"], batch["attention_mask"],
                    batch["visual_feats"], batch["visual_pos"], cfg=cfg,
                    return_tape=True)
                one_hot = jax.nn.one_hot(target, cfg.num_qa_labels)
                _, _, cams = lxmert_lrp.relprop(
                    params, out["tape"], one_hot, out["tape"]["lang_mask"],
                    out["tape"]["visn_mask"], cfg)
                tt, ti = elx.generate_transformer_att(cams, grads)
            elif method == "raw_attn":
                tt, ti = elx.generate_raw_attn(attn)
            elif method == "rollout":
                tt, ti = elx.generate_rollout(attn)
            elif method == "attn_gradcam":
                tt, ti = elx.generate_attn_gradcam(attn, grads)
            else:
                raise ValueError(method)
            # text relevancy: CLS row; image: CLS row of R_t_i
            # (perturbation.py cam_text/cam_image extraction)
            cam_text = tt[:, 0]
            cam_image = ti[:, 0]
            return scores, cam_text, cam_image

        self._explain = explain

        @jax.jit
        def run_pert(params, batch, cam_text, cam_image, targets, text_len):
            def fwd_scores(b):
                out = lx.forward(params, b["input_ids"],
                                 b["attention_mask"], b["visual_feats"],
                                 b["visual_pos"],
                                 visual_mask=b.get("visual_mask"), cfg=cfg)
                return out["qa_scores"]

            if text_pert:
                S_text = batch["input_ids"].shape[1]
                always = jnp.zeros((S_text,), bool).at[0].set(True)
                always = jnp.where(
                    jnp.arange(S_text) == text_len - 1, True, always)
                return pert.run_text_perturbation(
                    fwd_scores, batch, cam_text, targets, self.steps,
                    positive, always, text_len,
                    input_ids_key="input_ids",
                    input_mask_key="attention_mask")
            return pert.run_image_perturbation(
                fwd_scores, batch, cam_image, targets, self.steps,
                positive)

        self._run_pert = run_pert

    def run_sample(self, batch, soft_targets) -> np.ndarray:
        scores, cam_text, cam_image = self._explain(
            self.params, batch,
            jnp.argmax(jnp.asarray(soft_targets))[None])
        text_len = batch["attention_mask"].sum(axis=1)[0]
        accs = self._run_pert(self.params, batch, cam_text[0], cam_image[0],
                              jnp.asarray(soft_targets), text_len)
        return np.asarray(accs)


def run_from_args(args) -> int:
    """CLI adapter (transformer_mm_explainability_tpu.cli perturbation)."""
    from transformer_mm_explainability_tpu.data import vqa as vqa_data
    from transformer_mm_explainability_tpu.models import visual_bert as vb

    if not (args.questions and args.features and args.ans2label):
        print("perturbation: needs --questions/--features/--ans2label "
              "(and optionally --checkpoint). Without data this command "
              "validates the pipeline on synthetic samples.")
        return _smoke(args)

    vocab = vqa_data.AnswerVocab(args.ans2label, args.label2ans)
    dataset = vqa_data.VQADataset([args.questions], vocab)
    feats = vqa_data.FeatureStore(
        vqa_data.load_obj_tsv(args.features), max_boxes=100)
    import dataclasses

    cfg = dataclasses.replace(vb.VISUAL_BERT_VQA2, num_labels=len(vocab))
    import jax

    params = (vb.init_params(jax.random.PRNGKey(args.seed), cfg)
              if not args.checkpoint else _load_vb(args.checkpoint, cfg))
    runner = VisualBertPerturbationRunner(
        params, cfg, args.method, args.is_positive_pert, args.is_text_pert)

    from transformer_mm_explainability_tpu.data.tokenization import (
        BertTokenizer)

    if not getattr(args, "bert_vocab", None):
        print("perturbation: --bert-vocab vocab.txt is required with "
              "--questions (WordPiece vocabulary)")
        return 2
    tok = BertTokenizer(vocab_path=args.bert_vocab)

    def gen():
        for item in dataset.sampled(args.num_samples, args.seed):
            if item["img_id"] not in feats:
                continue
            f = feats[item["img_id"]]
            enc = tok.encode_vqa(item["sent"], max_len=128)
            batch = {
                "input_ids": jnp.asarray(enc["input_ids"][None]),
                "input_mask": jnp.asarray(enc["input_mask"][None]),
                "visual_embeddings": jnp.asarray(f["features"][None]),
            }
            yield batch, vocab.soft_scores(item.get("label", {}))

    run_loop(runner, gen(), args.num_samples)
    return 0


def _load_vb(path, cfg):
    from transformer_mm_explainability_tpu.utils.mmf_loader import (
        load_visual_bert)

    params, _ = load_visual_bert(path, cfg)
    return params


def _smoke(args) -> int:
    import jax

    from transformer_mm_explainability_tpu.models import bert as jbert
    from transformer_mm_explainability_tpu.models import visual_bert as vb

    cfg = vb.VisualBERTConfig(
        bert=jbert.BertConfig(vocab_size=100, hidden_size=64,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=128,
                              max_position_embeddings=40),
        visual_embedding_dim=32, num_labels=13)
    params = vb.init_params(jax.random.PRNGKey(args.seed), cfg)
    runner = VisualBertPerturbationRunner(
        params, cfg, args.method, args.is_positive_pert, args.is_text_pert)
    rng = np.random.RandomState(args.seed)

    def gen():
        for _ in range(min(args.num_samples, 4)):
            batch = {
                "input_ids": jnp.asarray(rng.randint(1, 99, (1, 12))),
                "input_mask": jnp.asarray(np.ones((1, 12), np.int32)),
                "visual_embeddings": jnp.asarray(
                    rng.randn(1, 9, 32).astype(np.float32)),
            }
            soft = np.zeros(13, np.float32)
            soft[rng.randint(13)] = 1.0
            yield batch, soft

    run_loop(runner, gen(), min(args.num_samples, 4))
    return 0
