"""Perturbation benchmark driver (the ``mmf_pert`` trainer /
lxmert perturbation.py main-loop equivalent).

Streams VQA samples, computes the chosen method's relevancy for the
model's PREDICTED answer (both reference pipelines resolve
``index=None → argmax(output)``: ExplanationGenerator.py:28/76,
lxmert/src/ExplanationGenerator.py), runs the step-batched perturbation
forward, and prints running per-step accuracies exactly like the
reference (evaluation_loop.py:167-169, perturbation.py:250-251).

Method surfaces match the reference dispatch tables exactly:
  * VisualBERT — 6 names (evaluation_loop.py:82-87);
  * LXMERT     — 11 names (perturbation.py:217-240).

TPU shape: N samples × n_steps ride ONE batch axis through one jitted
explain+perturb program per runner (the reference runs 1 sample × 9
sequential forwards); ``run_loop`` collates to a fixed batch so the
program compiles once.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transformer_mm_explainability_tpu.harness import perturbation as pert

# VisualBERT method → how its relevancy is built
# (reference: evaluation_loop.py:82-87 → SelfAttentionGenerator.*)
#   attn:      (A, ∇A) from capture          lrp: relprop cams
VISUALBERT_METHODS = (
    "transformer_attribution", "ours_no_lrp", "partial_lrp",
    "raw_attn", "attn_gradcam", "rollout",
)
_VISUALBERT_ALIASES = {
    # the LXMERT pipeline's name for the same baseline
    "transformer_att": "transformer_attribution",
}
_VB_NEEDS_LRP = {"transformer_attribution", "partial_lrp", "ours_with_lrp"}

# LXMERT method names (reference: perturbation.py:217-240)
LXMERT_METHODS = (
    "ours_no_lrp", "ours_no_lrp_no_norm", "ours_with_lrp",
    "ours_with_lrp_no_normalization", "ablation_no_self_in_10",
    "ablation_no_aggregation", "transformer_att", "partial_lrp",
    "raw_attn", "rollout", "attn_gradcam",
)
_LXMERT_ALIASES = {
    "transformer_attribution": "transformer_att",
    "ours_no_lrp_no_normalization": "ours_no_lrp_no_norm",
}
_LX_NEEDS_LRP = {"ours_with_lrp", "ours_with_lrp_no_normalization",
                 "transformer_att", "partial_lrp"}


def _resolve(method: str, table, aliases, model: str) -> str:
    method = aliases.get(method, method)
    if method not in table:
        raise ValueError(
            f"unknown {model} perturbation method {method!r}; "
            f"valid: {sorted(table)}")
    return method


def _as_2d(soft_targets) -> np.ndarray:
    soft = np.asarray(soft_targets)
    return soft[None] if soft.ndim == 1 else soft


class VisualBertPerturbationRunner:
    """MMF-style VisualBERT VQA pipeline. All leaves carry a leading
    sample axis N (N=1 for the reference's per-sample protocol)."""

    def __init__(self, params, cfg, method: str = "ours_no_lrp",
                 positive: bool = False, text_pert: bool = False):
        from transformer_mm_explainability_tpu.explain import (
            visual_bert as evb)
        from transformer_mm_explainability_tpu.models import (
            visual_bert as vb)

        # "ours_with_lrp" kept as a documented extension beyond the
        # reference's 6-name table (generate_ours over relprop cams)
        method = _resolve(method, VISUALBERT_METHODS + ("ours_with_lrp",),
                          _VISUALBERT_ALIASES, "visual_bert")
        self.params = params
        self.cfg = cfg
        self.method = method
        self.positive = positive
        self.text_pert = text_pert
        self.steps = (pert.TEXT_STEPS if text_pert
                      else pert.IMAGE_STEPS_VISUALBERT)

        def explain(params, batch):
            """(scores, cam[N, S]) for the predicted answer."""
            if method == "ours_no_lrp":
                # streamed row-fold (models/visual_bert.relevancy_row):
                # per-layer VJPs fold r ← r + r·Ê directly, so the
                # [L, N, H, S, S] A/∇A stacks (2×239 MB at N=8 protocol
                # shape) never exist — the explain step's HBM working
                # set drops to O(N·H·S²). == capture + generate_ours
                # (tests/test_visual_bert.py parity).
                return vb.relevancy_row(params, batch, None, cfg)
            scores, attn, grads = vb.capture(params, batch, None, cfg)
            cls_index = batch["input_mask"].sum(axis=1) - 2
            if method in _VB_NEEDS_LRP:
                out = vb.forward(
                    params, batch["input_ids"], batch["input_mask"],
                    batch.get("visual_embeddings"),
                    visual_mask=batch.get("visual_mask"), cfg=cfg,
                    return_tape=True)
                one_hot = jax.nn.one_hot(
                    jnp.argmax(scores, axis=-1), cfg.num_labels)
                _, cams = vb.relprop(params, out["tape"], one_hot, cfg)
                if method == "transformer_attribution":
                    cam = evb.generate_transformer_att(cams, grads,
                                                       cls_index)
                elif method == "partial_lrp":
                    cam = evb.generate_partial_lrp(cams, cls_index)
                else:  # ours_with_lrp
                    cam = evb.generate_ours(cams, grads, cls_index)
            elif method == "ours_no_lrp":
                cam = evb.generate_ours(attn, grads, cls_index)
            elif method == "raw_attn":
                cam = evb.generate_raw_attn(attn, cls_index)
            elif method == "rollout":
                cam = evb.generate_rollout(attn, cls_index)
            else:  # attn_gradcam
                cam = evb.generate_attn_gradcam(attn, grads, cls_index)
            return scores, cam

        self._explain = jax.jit(explain)

        def fwd_scores(params, b):
            out = vb.forward(params, b["input_ids"], b["input_mask"],
                             b.get("visual_embeddings"),
                             visual_mask=b.get("visual_mask"), cfg=cfg)
            return out["scores"]

        @jax.jit
        def program(params, batch, targets_soft):
            """explain + N×steps perturbation in one program.
            Returns [N, n_steps] per-step accuracies."""
            _, cam = explain(params, batch)
            fwd = lambda b: fwd_scores(params, b)
            S_text = batch["input_ids"].shape[1]
            if text_pert:
                text_len = batch["input_mask"].sum(axis=1)
                ar = jnp.arange(S_text)[None, :]
                # protect [CLS](0), '?'(len-2), [SEP](len-1)
                always = (ar == 0) | (ar >= (text_len - 2)[:, None])
                return pert.run_text_perturbation_batch(
                    fwd, batch, cam[:, :S_text], targets_soft,
                    self.steps, positive, always, text_len)
            return pert.run_image_perturbation_batch(
                fwd, batch, cam[:, S_text:], targets_soft, self.steps,
                positive, num_boxes=batch.get("num_boxes"))

        self._program = program

    def explain_batched(self, batch):
        scores, cam = self._explain(self.params, batch)
        return np.asarray(scores), np.asarray(cam)

    def submit_batched(self, batch: Dict[str, jnp.ndarray],
                       soft_targets) -> jnp.ndarray:
        """Dispatch the batched program; returns the DEVICE array so
        callers can overlap the next batch's host work with it."""
        return self._program(self.params, batch,
                             jnp.asarray(_as_2d(soft_targets)))

    def run_samples_batched(self, batch: Dict[str, jnp.ndarray],
                            soft_targets) -> np.ndarray:
        """N samples explained + perturbed in one program → [N, steps]."""
        return np.asarray(self.submit_batched(batch, soft_targets))

    def run_sample(self, batch: Dict[str, jnp.ndarray],
                   soft_targets) -> np.ndarray:
        return self.run_samples_batched(batch, soft_targets)[0]


class LxmertPerturbationRunner:
    """LXMERT VQA pipeline (lxmert/perturbation.py's ModelPert,
    TPU-shaped).

    Consumes precomputed FRCNN features (the reference recomputes the
    CNN per step on the SAME image — identical features; here they're
    computed once, or loaded from TSV)."""

    def __init__(self, params, cfg, method: str = "ours_no_lrp",
                 positive: bool = False, text_pert: bool = False):
        from transformer_mm_explainability_tpu.explain import (
            lxmert as elx)
        from transformer_mm_explainability_tpu.models import (
            lxmert as lx)
        from transformer_mm_explainability_tpu.models import lxmert_lrp

        method = _resolve(method, LXMERT_METHODS, _LXMERT_ALIASES,
                          "lxmert")
        self.params = params
        self.cfg = cfg
        self.method = method
        self.positive = positive
        self.text_pert = text_pert
        self.steps = pert.LXMERT_STEPS

        def explain(params, batch):
            """(scores, cam_text [N, St], cam_image [N, Sv]) for the
            predicted answer."""
            scores, attn, grads = lx.capture(params, batch, None, cfg)
            cams = None
            if method in _LX_NEEDS_LRP:
                out = lx.forward(
                    params, batch["input_ids"], batch["attention_mask"],
                    batch["visual_feats"], batch["visual_pos"],
                    visual_mask=batch.get("visual_mask"), cfg=cfg,
                    return_tape=True)
                one_hot = jax.nn.one_hot(
                    jnp.argmax(scores, axis=-1), cfg.num_qa_labels)
                _, _, cams = lxmert_lrp.relprop(
                    params, out["tape"], one_hot,
                    out["tape"]["lang_mask"], out["tape"]["visn_mask"],
                    cfg)
            # static-shape padding masks: without them one padded
            # token/box NaN-poisons the normalized bi-modal chain
            tv = batch["attention_mask"]
            vv = batch.get("visual_mask")
            if method == "ours_no_lrp":
                tt, ti = elx.generate_ours(attn, grads,
                                           text_valid=tv, visual_valid=vv)
            elif method == "ours_no_lrp_no_norm":
                tt, ti = elx.generate_ours(
                    attn, grads, normalize_self_attention=False,
                    text_valid=tv, visual_valid=vv)
            elif method == "ablation_no_self_in_10":
                tt, ti = elx.generate_ours(
                    attn, grads, apply_self_in_rule_10=False,
                    text_valid=tv, visual_valid=vv)
            elif method == "ablation_no_aggregation":
                tt, ti = elx.generate_ours_no_agg(
                    attn, grads, normalize_self_attention=False,
                    text_valid=tv, visual_valid=vv)
            elif method == "ours_with_lrp":
                tt, ti = elx.generate_ours_lrp(cams, grads,
                                               text_valid=tv,
                                               visual_valid=vv)
            elif method == "ours_with_lrp_no_normalization":
                tt, ti = elx.generate_ours_lrp(
                    cams, grads, normalize_self_attention=False,
                    text_valid=tv, visual_valid=vv)
            elif method == "transformer_att":
                tt, ti = elx.generate_transformer_att(cams, grads)
            elif method == "partial_lrp":
                tt, ti = elx.generate_partial_lrp(cams)
            elif method == "raw_attn":
                tt, ti = elx.generate_raw_attn(attn)
            elif method == "rollout":
                tt, ti = elx.generate_rollout(attn)
            else:  # attn_gradcam
                tt, ti = elx.generate_attn_gradcam(attn, grads)
            # text relevancy: CLS row; image: CLS row of R_t_i
            # (perturbation.py cam_text/cam_image extraction)
            return scores, tt[:, 0], ti[:, 0]

        self._explain = jax.jit(explain)

        def fwd_scores(params, b):
            out = lx.forward(params, b["input_ids"],
                             b["attention_mask"], b["visual_feats"],
                             b["visual_pos"],
                             visual_mask=b.get("visual_mask"), cfg=cfg)
            return out["qa_scores"]

        @jax.jit
        def program(params, batch, targets_soft):
            _, cam_text, cam_image = explain(params, batch)
            fwd = lambda b: fwd_scores(params, b)
            if text_pert:
                S_text = batch["input_ids"].shape[1]
                text_len = batch["attention_mask"].sum(axis=1)
                ar = jnp.arange(S_text)[None, :]
                # protect [CLS](0) and [SEP](len-1)
                always = (ar == 0) | (ar == (text_len - 1)[:, None])
                return pert.run_text_perturbation_batch(
                    fwd, batch, cam_text, targets_soft, self.steps,
                    positive, always, text_len,
                    input_ids_key="input_ids",
                    input_mask_key="attention_mask")
            return pert.run_image_perturbation_batch(
                fwd, batch, cam_image, targets_soft, self.steps,
                positive, num_boxes=batch.get("num_boxes"))

        self._program = program

    def explain_batched(self, batch):
        scores, cam_text, cam_image = self._explain(self.params, batch)
        return (np.asarray(scores), np.asarray(cam_text),
                np.asarray(cam_image))

    def submit_batched(self, batch, soft_targets) -> jnp.ndarray:
        """Device-array variant of run_samples_batched (see the
        VisualBERT runner) — enables pipelined eval loops."""
        return self._program(self.params, batch,
                             jnp.asarray(_as_2d(soft_targets)))

    def run_samples_batched(self, batch, soft_targets) -> np.ndarray:
        return np.asarray(self.submit_batched(batch, soft_targets))

    def run_sample(self, batch, soft_targets) -> np.ndarray:
        return self.run_samples_batched(batch, soft_targets)[0]


def _collate(buf):
    """Stack single-sample (batch, soft) pairs into one N-batch.

    Host (numpy) samples — the real data-pipeline case — are stacked
    on the host: one upload per key per batch instead of N small
    device buffers plus a device-side concatenate. Samples that are
    ALREADY device arrays are concatenated on-device: pulling them
    back through np.asarray would round-trip every sample over the
    interconnect."""
    batches, softs = zip(*buf)
    keys = batches[0].keys()
    big = {}
    for k in keys:
        leaves = [b[k] for b in batches]
        # decide per LEAF, not per first sample: a mixed buffer must
        # not pull device arrays back to the host (np path) nor upload
        # host samples one at a time (jnp path)
        xp = np if all(isinstance(x, np.ndarray) for x in leaves) else jnp
        big[k] = xp.concatenate(leaves, axis=0)
    return big, np.stack([np.asarray(s).reshape(-1) for s in softs])


def run_loop(runner, samples: Iterable, max_samples: int,
             printer=print, batch_size: int = 8) -> np.ndarray:
    """Accumulate per-step accuracies with the reference's running
    printout. Collates ``batch_size`` samples per jitted program call
    (the protocol-default fast path; the last chunk is padded to keep
    one compiled shape). Returns the final per-step accuracy vector."""
    totals = None
    n = 0
    buf = []
    last_print = 0
    pending = None  # (device accs, k) — one batch kept in flight

    def settle():
        """Materialise the in-flight batch's accuracies."""
        nonlocal totals, n, pending, last_print
        if pending is None:
            return
        dev, k = pending
        pending = None
        accs = np.asarray(dev)[:k]
        totals = (accs.sum(axis=0) if totals is None
                  else totals + accs.sum(axis=0))
        n += k
        if n - last_print >= 100 or n >= max_samples:
            last_print = n
            running = totals / n
            printer(f"[{n}/{max_samples}] step accuracies: "
                    + " ".join(f"{a*100:.2f}" for a in running))

    def flush():
        """Submit the buffered samples, then settle the PREVIOUS batch
        — the device computes batch i while the host collates and
        uploads batch i+1 (double buffering)."""
        nonlocal buf, pending
        if not buf:
            return
        k = len(buf)
        padded = buf + [buf[-1]] * (batch_size - k)
        big, softs = _collate(padded)
        # duck-typed runners without submit_batched run synchronously
        submit = (runner.submit_batched
                  if hasattr(runner, "submit_batched")
                  else runner.run_samples_batched)
        dev = submit(big, softs)
        settle()
        pending = (dev, k)
        buf = []

    admitted = 0
    for sample in samples:
        # never admit more than max_samples into the protocol — the
        # reference's loop is exact on --num-samples
        if admitted >= max_samples:
            break
        buf.append(sample)
        admitted += 1
        if len(buf) == batch_size:
            flush()
    flush()
    settle()
    if totals is None:
        # zero usable samples (e.g. every img_id missing from the
        # features store) — report that instead of crashing
        import numpy as _np

        running = _np.zeros((len(runner.steps),), _np.float64)
    else:
        running = totals / max(n, 1)
    printer(json.dumps({
        "num_samples": n,
        "steps": list(runner.steps),
        "step_accuracies": [float(a) for a in running],
        "auc": pert.auc(running, runner.steps),
    }))
    return running


def methods_for(model: str):
    return (LXMERT_METHODS if model == "lxmert"
            else VISUALBERT_METHODS)


def run_from_args(args) -> int:
    """CLI adapter (transformer_mm_explainability_tpu.cli perturbation)."""
    from transformer_mm_explainability_tpu.data import vqa as vqa_data

    model = getattr(args, "model", "visual_bert")
    batch_size = getattr(args, "batch_size", 8) or 8

    if not (args.questions and args.features and args.ans2label):
        print("perturbation: needs --questions/--features/--ans2label "
              "(and optionally --checkpoint). Without data this command "
              "validates the pipeline on synthetic samples.")
        return _smoke(args)

    vocab = vqa_data.AnswerVocab(args.ans2label, args.label2ans)
    dataset = vqa_data.VQADataset([args.questions], vocab)

    from transformer_mm_explainability_tpu.data.tokenization import (
        BertTokenizer)

    if not getattr(args, "bert_vocab", None):
        print("perturbation: --bert-vocab vocab.txt is required with "
              "--questions (WordPiece vocabulary)")
        return 2
    tok = BertTokenizer(vocab_path=args.bert_vocab)
    import dataclasses

    import jax as _jax

    if model == "lxmert":
        from transformer_mm_explainability_tpu.models import lxmert as lx

        feats = vqa_data.FeatureStore(
            vqa_data.load_obj_tsv(args.features), max_boxes=36)
        cfg = dataclasses.replace(lx.LXMERT_VQA, num_qa_labels=len(vocab))
        params = (lx.init_params(_jax.random.PRNGKey(args.seed), cfg)
                  if not args.checkpoint
                  else _load_lx(args.checkpoint, cfg))
        runner = LxmertPerturbationRunner(
            params, cfg, args.method, args.is_positive_pert,
            args.is_text_pert)

        def gen():
            for item in dataset.sampled(args.num_samples, args.seed):
                if item["img_id"] not in feats:
                    continue
                f = feats[item["img_id"]]
                enc = tok.encode_vqa(item["sent"], max_len=20)
                # host (numpy) samples: _collate stacks them on the
                # host, one device upload per key per batch
                batch = {
                    "input_ids": np.asarray(enc["input_ids"][None]),
                    "attention_mask": np.asarray(enc["input_mask"][None]),
                    "visual_feats": np.asarray(f["features"][None]),
                    "visual_pos": np.asarray(f["boxes"][None]),
                    "num_boxes": np.asarray([f["num_boxes"]], np.int32),
                    "visual_mask": (np.arange(36) < f["num_boxes"])[None]
                    .astype(np.int32),
                }
                yield batch, vocab.soft_scores(item.get("label", {}))
    else:
        from transformer_mm_explainability_tpu.models import (
            visual_bert as vb)

        feats = vqa_data.FeatureStore(
            vqa_data.load_obj_tsv(args.features), max_boxes=100)
        cfg = dataclasses.replace(vb.VISUAL_BERT_VQA2,
                                  num_labels=len(vocab))
        params = (vb.init_params(_jax.random.PRNGKey(args.seed), cfg)
                  if not args.checkpoint else _load_vb(args.checkpoint, cfg))
        runner = VisualBertPerturbationRunner(
            params, cfg, args.method, args.is_positive_pert,
            args.is_text_pert)

        def gen():
            for item in dataset.sampled(args.num_samples, args.seed):
                if item["img_id"] not in feats:
                    continue
                f = feats[item["img_id"]]
                enc = tok.encode_vqa(item["sent"], max_len=128)
                # host (numpy) samples — see the LXMERT branch above
                batch = {
                    "input_ids": np.asarray(enc["input_ids"][None]),
                    "input_mask": np.asarray(enc["input_mask"][None]),
                    "visual_embeddings": np.asarray(f["features"][None]),
                    "num_boxes": np.asarray([f["num_boxes"]], np.int32),
                    "visual_mask": (np.arange(100) < f["num_boxes"])[None]
                    .astype(np.int32),
                }
                yield batch, vocab.soft_scores(item.get("label", {}))

    run_loop(runner, gen(), args.num_samples, batch_size=batch_size)
    return 0


def _load_vb(path, cfg):
    from transformer_mm_explainability_tpu.utils.mmf_loader import (
        load_visual_bert)

    params, _ = load_visual_bert(path, cfg)
    return params


def _load_lx(path, cfg):
    from transformer_mm_explainability_tpu.utils import convert

    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return convert.lxmert_from_state_dict(sd, cfg)


def _smoke(args) -> int:
    import jax as _jax

    model = getattr(args, "model", "visual_bert")
    rng = np.random.RandomState(args.seed)
    n = min(args.num_samples, 4)

    if model == "lxmert":
        from transformer_mm_explainability_tpu.models import lxmert as lx

        cfg = lx.LxmertConfig(
            vocab_size=100, hidden_size=64, num_attention_heads=4,
            intermediate_size=128, l_layers=2, x_layers=2, r_layers=2,
            num_qa_labels=13, visual_feat_dim=32, max_position_embeddings=40)
        params = lx.init_params(_jax.random.PRNGKey(args.seed), cfg)
        runner = LxmertPerturbationRunner(
            params, cfg, args.method, args.is_positive_pert,
            args.is_text_pert)

        def gen():
            for _ in range(n):
                yield ({
                    "input_ids": jnp.asarray(rng.randint(1, 99, (1, 12))),
                    "attention_mask": jnp.asarray(
                        np.ones((1, 12), np.int32)),
                    "visual_feats": jnp.asarray(
                        rng.randn(1, 9, 32).astype(np.float32)),
                    "visual_pos": jnp.asarray(
                        rng.rand(1, 9, 4).astype(np.float32)),
                }, _soft(rng, 13))
    else:
        from transformer_mm_explainability_tpu.models import bert as jbert
        from transformer_mm_explainability_tpu.models import (
            visual_bert as vb)

        cfg = vb.VisualBERTConfig(
            bert=jbert.BertConfig(vocab_size=100, hidden_size=64,
                                  num_hidden_layers=2,
                                  num_attention_heads=4,
                                  intermediate_size=128,
                                  max_position_embeddings=40),
            visual_embedding_dim=32, num_labels=13)
        params = vb.init_params(_jax.random.PRNGKey(args.seed), cfg)
        runner = VisualBertPerturbationRunner(
            params, cfg, args.method, args.is_positive_pert,
            args.is_text_pert)

        def gen():
            for _ in range(n):
                yield ({
                    "input_ids": jnp.asarray(rng.randint(1, 99, (1, 12))),
                    "input_mask": jnp.asarray(np.ones((1, 12), np.int32)),
                    "visual_embeddings": jnp.asarray(
                        rng.randn(1, 9, 32).astype(np.float32)),
                }, _soft(rng, 13))

    run_loop(runner, gen(), n, batch_size=min(4, n))
    return 0


def _soft(rng, num_labels):
    soft = np.zeros(num_labels, np.float32)
    soft[rng.randint(num_labels)] = 1.0
    return soft
