"""LXMERT per-task finetune loops (C36: lxmert/src/tasks/{vqa,gqa}.py).

Reproduces the reference VQA finetune protocol (tasks/vqa.py:33-140,
the task heads of tasks/vqa_model.py:11-50 / gqa_model.py / 
nlvr2_model.py, +
run/vqa_finetune.bash hyperparameters):

  * model: LXMERT encoder (``--llayers 9 --xlayers 5 --rlayers 5``) +
    the GELU answer head sized to the task's answer vocabulary;
  * loss: ``BCEWithLogitsLoss()(logit, target) * num_answers``
    (tasks/vqa.py:96-97) on soft VQA targets;
  * optimizer: BertAdam (no bias correction, decoupled weight decay,
    warmup_linear schedule with warmup=0.1 over
    ``epochs * batches_per_epoch`` total steps, lr 5e-5, batch 32);
  * grad clipping: global norm 5.0 BEFORE the optimizer
    (tasks/vqa.py:100 ``clip_grad_norm_(…, 5.)``);
  * per-epoch train/valid accuracy via the VQAEvaluator semantics
    (soft score of the argmax answer), best-checkpoint tracking.

The GQA loop (tasks/gqa.py) is the same protocol over the GQA reader;
``task="gqa"`` switches only the dataset plumbing.

TPU shape: one jitted train step (loss+grads+BertAdam update fused);
the epoch loop feeds padded fixed-size batches so the step compiles
once.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from transformer_mm_explainability_tpu.models import lxmert as lx
from transformer_mm_explainability_tpu.ops.attention import gelu, layer_norm
from transformer_mm_explainability_tpu.train import steps


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    """The run/vqa_finetune.bash surface."""
    llayers: int = 9
    xlayers: int = 5
    rlayers: int = 5
    batch_size: int = 32
    lr: float = 5e-5
    epochs: int = 4
    warmup: float = 0.1
    grad_clip: float = 5.0     # tasks/vqa.py:100
    max_text_len: int = 20
    task: str = "vqa"


def bce_vqa_loss(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """BCEWithLogitsLoss (mean over all elements) * num_answers
    (tasks/vqa.py:96-97) == per-sample sum of BCE, batch-averaged."""
    per_elem = optax.sigmoid_binary_cross_entropy(logits, targets)
    return per_elem.mean() * logits.shape[-1]


class LxmertTaskTrainer:
    """tasks/vqa.py's VQA class, TPU-shaped."""

    def __init__(self, num_answers: int,
                 ft: FinetuneConfig = FinetuneConfig(),
                 model_cfg: Optional[lx.LxmertConfig] = None,
                 batches_per_epoch: int = 1000,
                 params: Optional[Dict[str, Any]] = None,
                 seed: int = 9595):
        self.ft = ft
        self.cfg = model_cfg or dataclasses.replace(
            lx.LXMERT_VQA, l_layers=ft.llayers, x_layers=ft.xlayers,
            r_layers=ft.rlayers, num_qa_labels=num_answers)
        assert self.cfg.num_qa_labels == num_answers
        if params is None:
            params = lx.init_params(jax.random.PRNGKey(seed), self.cfg)
        t_total = ft.epochs * batches_per_epoch
        self.tx = steps.make_bert_adam(
            ft.lr, warmup=ft.warmup, total_steps=max(t_total, 1),
            grad_clip=ft.grad_clip)
        self.state = steps.init_state(params, self.tx)
        self.best_valid = 0.0
        self.best_params = None
        cfg = self.cfg

        def loss_fn(p, batch):
            out = lx.forward(p, batch["input_ids"],
                             batch["attention_mask"],
                             batch["visual_feats"], batch["visual_pos"],
                             visual_mask=batch.get("visual_mask"), cfg=cfg)
            logits = out["qa_scores"]
            return bce_vqa_loss(logits, batch["target"]), logits

        @jax.jit
        def train_step(state, batch):
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return (state._replace(params=params, opt_state=opt_state,
                                   step=state.step + 1),
                    loss, logits)

        self._train_step = train_step

        @jax.jit
        def predict(params, batch):
            out = lx.forward(params, batch["input_ids"],
                             batch["attention_mask"],
                             batch["visual_feats"], batch["visual_pos"],
                             visual_mask=batch.get("visual_mask"), cfg=cfg)
            return out["qa_scores"]

        self._predict = predict

    # -- protocol pieces ---------------------------------------------------

    def train_epoch(self, batches: Iterable[Dict[str, jnp.ndarray]],
                    printer=print) -> Tuple[float, float]:
        """One epoch → (mean loss, train accuracy) with the evaluator's
        soft-score-of-argmax semantics (tasks/vqa.py:104-109)."""
        losses: List[float] = []
        score_sum, n = 0.0, 0
        for batch in batches:
            self.state, loss, logits = self._train_step(self.state, batch)
            losses.append(float(loss))
            pred = np.asarray(jnp.argmax(logits, -1))
            tgt = np.asarray(batch["target"])
            valid = np.asarray(batch.get(
                "sample_valid", jnp.ones(tgt.shape[0], bool)))
            score_sum += float(tgt[np.arange(len(pred)), pred][valid].sum())
            n += int(valid.sum())
        return float(np.mean(losses)), score_sum / max(n, 1)

    def evaluate(self, batches: Iterable[Dict[str, jnp.ndarray]]) -> float:
        score_sum, n = 0.0, 0
        for batch in batches:
            logits = self._predict(self.state.params, batch)
            pred = np.asarray(jnp.argmax(logits, -1))
            tgt = np.asarray(batch["target"])
            valid = np.asarray(batch.get(
                "sample_valid", jnp.ones(tgt.shape[0], bool)))
            score_sum += float(tgt[np.arange(len(pred)), pred][valid].sum())
            n += int(valid.sum())
        return score_sum / max(n, 1)

    def fit(self, train_batches_fn: Callable[[], Iterable],
            valid_batches_fn: Optional[Callable[[], Iterable]] = None,
            printer=print) -> Dict[str, List[float]]:
        """The reference epoch loop with best-checkpoint tracking
        (tasks/vqa.py:81-127)."""
        log: Dict[str, List[float]] = {"loss": [], "train_acc": [],
                                       "valid_acc": []}
        for epoch in range(self.ft.epochs):
            # reshuffle per epoch like the reference's
            # DataLoader(shuffle=True) — the fn may take the epoch.
            # Inspect the signature instead of probing with a call: a
            # TypeError raised INSIDE the fn must not trigger a silent
            # zero-arg retry (re-running side effects, epoch-0 shuffle)
            import inspect

            takes_epoch = bool(
                inspect.signature(train_batches_fn).parameters)
            batches = (train_batches_fn(epoch) if takes_epoch
                       else train_batches_fn())
            loss, train_acc = self.train_epoch(batches, printer)
            line = f"Epoch {epoch}: Train {train_acc * 100:.2f}"
            log["loss"].append(loss)
            log["train_acc"].append(train_acc)
            if valid_batches_fn is not None:
                valid = self.evaluate(valid_batches_fn())
                log["valid_acc"].append(valid)
                if valid > self.best_valid:
                    self.best_valid = valid
                    self.best_params = jax.tree_util.tree_map(
                        lambda x: x, self.state.params)
                line += (f"  Valid {valid * 100:.2f}  "
                         f"Best {self.best_valid * 100:.2f}")
            printer(line)
        return log


def make_batches(dataset, feats, tokenizer, vocab, ft: FinetuneConfig,
                 max_boxes: int = 36, shuffle_seed: Optional[int] = None,
                 drop_last: bool = False):
    """Collate VQA items into fixed-shape padded batches (the
    DataLoader/VQATorchDataset equivalent). ``drop_last=True`` matches
    the reference's train loader (tasks/vqa.py:37); otherwise the tail
    is padded and masked via ``sample_valid``."""
    items = [it for it in dataset.data if it["img_id"] in feats]
    if shuffle_seed is not None:
        rng = np.random.RandomState(shuffle_seed)
        rng.shuffle(items)
    B = ft.batch_size
    batches = []
    for start in range(0, len(items), B):
        chunk = items[start:start + B]
        k = len(chunk)
        if k < B and drop_last:
            break
        pad = chunk + [chunk[-1]] * (B - k)
        enc = [tokenizer.encode_vqa(it["sent"], max_len=ft.max_text_len)
               for it in pad]
        f = [feats[it["img_id"]] for it in pad]
        batches.append({
            "input_ids": jnp.asarray(
                np.stack([e["input_ids"] for e in enc])),
            "attention_mask": jnp.asarray(
                np.stack([e["input_mask"] for e in enc])),
            "visual_feats": jnp.asarray(
                np.stack([x["features"] for x in f])),
            "visual_pos": jnp.asarray(np.stack([x["boxes"] for x in f])),
            "visual_mask": jnp.asarray(np.stack(
                [(np.arange(max_boxes) < x["num_boxes"]).astype(np.int32)
                 for x in f])),
            "target": jnp.asarray(np.stack(
                [vocab.soft_scores(it.get("label", {})) for it in pad])),
            "sample_valid": jnp.asarray(np.arange(B) < k),
        })
    return batches


def run_from_args(args) -> int:
    """CLI adapter (``tmmx lxmert-finetune`` — the run/vqa_finetune.bash
    surface)."""
    ft = FinetuneConfig(
        llayers=args.llayers, xlayers=args.xlayers, rlayers=args.rlayers,
        batch_size=args.batch_size, lr=args.lr, epochs=args.epochs,
        task=args.task)

    needs_ans = ft.task != "nlvr2"   # NLVR2 is binary, no answer vocab
    if not (args.train_questions and args.features
            and (args.ans2label or not needs_ans)):
        print("lxmert-finetune: no --train-questions/--features"
              + ("/--ans2label" if needs_ans else "")
              + "; running the synthetic smoke protocol")
        return (_smoke_nlvr2(ft, args.seed) if ft.task == "nlvr2"
                else _smoke(ft, args.seed))

    from transformer_mm_explainability_tpu.data import vqa as vqa_data
    from transformer_mm_explainability_tpu.data.tokenization import (
        BertTokenizer)

    if not getattr(args, "bert_vocab", None):
        print("lxmert-finetune: --bert-vocab vocab.txt required")
        return 2

    if ft.task == "nlvr2":
        return _run_nlvr2(args, ft, vqa_data, BertTokenizer)
    vocab = vqa_data.AnswerVocab(args.ans2label, args.label2ans)
    reader = (vqa_data.GQADataset if ft.task == "gqa"
              else vqa_data.VQADataset)
    train_set = reader([args.train_questions], vocab)
    valid_set = (reader([args.valid_questions], vocab)
                 if args.valid_questions else None)
    feats = vqa_data.FeatureStore(
        vqa_data.load_obj_tsv(args.features), max_boxes=36)
    tok = BertTokenizer(vocab_path=args.bert_vocab)

    n_train = len([it for it in train_set.data if it["img_id"] in feats])
    trainer = LxmertTaskTrainer(
        len(vocab), ft, batches_per_epoch=max(n_train // ft.batch_size, 1),
        params=None if not args.checkpoint
        else _load_params(args.checkpoint, ft, len(vocab)),
        seed=args.seed)

    def train_batches(epoch: int = 0):
        return make_batches(train_set, feats, tok, vocab, ft,
                            shuffle_seed=args.seed + epoch,
                            drop_last=True)

    valid_batches = (None if valid_set is None else
                     (lambda: make_batches(valid_set, feats, tok, vocab,
                                           ft)))
    log = trainer.fit(train_batches, valid_batches)
    import json

    print(json.dumps({"loss": log["loss"],
                      "train_acc": log["train_acc"],
                      "valid_acc": log["valid_acc"],
                      "best_valid": trainer.best_valid}))
    return 0


def _load_params(path, ft, num_answers):
    import torch

    from transformer_mm_explainability_tpu.utils import convert

    sd = torch.load(path, map_location="cpu")
    cfg = dataclasses.replace(
        lx.LXMERT_VQA, l_layers=ft.llayers, x_layers=ft.xlayers,
        r_layers=ft.rlayers, num_qa_labels=num_answers)
    return convert.lxmert_from_state_dict(sd, cfg)


def _smoke(ft: FinetuneConfig, seed: int) -> int:
    """Tiny-config end-to-end training demo (protocol validation)."""
    import json

    cfg = lx.LxmertConfig(
        vocab_size=60, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=24,
        l_layers=2, x_layers=1, r_layers=1, visual_feat_dim=16,
        num_qa_labels=5)
    ft = dataclasses.replace(ft, batch_size=4, epochs=3)
    rng = np.random.RandomState(seed)
    N = 8
    batches = []
    for s in range(0, N, ft.batch_size):
        tgt = np.zeros((ft.batch_size, 5), np.float32)
        tgt[np.arange(ft.batch_size),
            rng.randint(0, 5, ft.batch_size)] = 1.0
        batches.append({
            "input_ids": jnp.asarray(
                rng.randint(1, 59, (ft.batch_size, 8))),
            "attention_mask": jnp.asarray(
                np.ones((ft.batch_size, 8), np.int32)),
            "visual_feats": jnp.asarray(
                rng.randn(ft.batch_size, 6, 16).astype(np.float32)),
            "visual_pos": jnp.asarray(
                rng.rand(ft.batch_size, 6, 4).astype(np.float32)),
            "target": jnp.asarray(tgt),
        })
    trainer = LxmertTaskTrainer(5, ft, model_cfg=cfg,
                                batches_per_epoch=len(batches), seed=seed)
    log = trainer.fit(lambda: batches, lambda: batches)
    ok = log["loss"][-1] < log["loss"][0]
    print(json.dumps({"loss": log["loss"], "valid_acc": log["valid_acc"],
                      "loss_decreased": bool(ok)}))
    return 0 if ok else 1


# ---------------------------------------------------------------------------
# NLVR2 (tasks/nlvr2.py + tasks/nlvr2_model.py)
# ---------------------------------------------------------------------------

def init_nlvr2_head(key: jax.Array, hidden: int,
                    dtype=jnp.float32) -> Dict[str, Any]:
    """nlvr2_model.NLVR2Model.logit_fc (:19-24): Linear(2h,2h) -> GeLU
    -> LayerNorm(eps 1e-12) -> Linear(2h,2), bert-initialised
    (normal 0.02 / zero bias, init_bert_weights applied at :25)."""
    k1, k2 = jax.random.split(key)
    h2 = hidden * 2
    nrm = lambda k, s: (jax.random.normal(k, s) * 0.02).astype(dtype)
    return {
        "fc1": {"w": nrm(k1, (h2, h2)), "b": jnp.zeros((h2,), dtype)},
        "ln": {"scale": jnp.ones((h2,), dtype),
               "bias": jnp.zeros((h2,), dtype)},
        "fc2": {"w": nrm(k2, (h2, 2)), "b": jnp.zeros((2,), dtype)},
    }


def nlvr2_logits(params: Dict[str, Any], batch: Dict[str, jnp.ndarray],
                 cfg: lx.LxmertConfig) -> jnp.ndarray:
    """NLVR2Model.forward (:27-52): each sentence is paired with both
    images ([B,2,O,f] flattened to [2B,O,f], the sentence repeated),
    the two pooled cross-modal CLS vectors are concatenated per sample
    and classified to 2 logits."""
    B, two, O, F = batch["visual_feats"].shape
    feats = batch["visual_feats"].reshape(B * 2, O, F)
    pos = batch["visual_pos"].reshape(B * 2, O, 4)
    vmask = (batch["visual_mask"].reshape(B * 2, O)
             if batch.get("visual_mask") is not None else None)
    rep = lambda t: jnp.repeat(t, 2, axis=0)
    out = lx.forward(params["lxmert"], rep(batch["input_ids"]),
                     rep(batch["attention_mask"]), feats, pos,
                     visual_mask=vmask, cfg=cfg)
    x = out["pooled"].reshape(B, -1)                    # [B, 2h]
    head = params["head"]
    h = gelu(x @ head["fc1"]["w"] + head["fc1"]["b"])
    h = layer_norm(h, head["ln"]["scale"], head["ln"]["bias"], 1e-12)
    return h @ head["fc2"]["w"] + head["fc2"]["b"]     # [B, 2]


def nlvr2_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """CrossEntropyLoss(ignore_index=-1) (tasks/nlvr2.py:58)."""
    valid = labels >= 0
    safe = jnp.clip(labels, 0)
    per = -jax.nn.log_softmax(logits)[jnp.arange(logits.shape[0]), safe]
    return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1)


class Nlvr2TaskTrainer:
    """tasks/nlvr2.py NLVR2 class: same BertAdam/warmup/clip protocol
    as VQA (run/nlvr2_finetune.bash: batch 32, lr 5e-5, 4 epochs),
    exact-match accuracy instead of soft VQA scores."""

    def __init__(self, ft: FinetuneConfig = FinetuneConfig(task="nlvr2"),
                 model_cfg: Optional[lx.LxmertConfig] = None,
                 batches_per_epoch: int = 1000,
                 lxmert_params: Optional[Dict[str, Any]] = None,
                 seed: int = 9595):
        self.ft = ft
        self.cfg = model_cfg or dataclasses.replace(
            lx.LXMERT_VQA, l_layers=ft.llayers, x_layers=ft.xlayers,
            r_layers=ft.rlayers)
        key = jax.random.PRNGKey(seed)
        if lxmert_params is None:
            lxmert_params = lx.init_params(key, self.cfg)
        params = {"lxmert": lxmert_params,
                  "head": init_nlvr2_head(jax.random.fold_in(key, 1),
                                          self.cfg.hidden_size)}
        t_total = ft.epochs * batches_per_epoch
        self.tx = steps.make_bert_adam(
            ft.lr, warmup=ft.warmup, total_steps=max(t_total, 1),
            grad_clip=ft.grad_clip)
        self.state = steps.init_state(params, self.tx)
        self.best_valid = 0.0
        self.best_params = None
        cfg = self.cfg

        def loss_fn(p, batch):
            logits = nlvr2_logits(p, batch, cfg)
            return nlvr2_loss(logits, batch["label"]), logits

        @jax.jit
        def train_step(state, batch):
            (loss, logits), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch)
            updates, opt_state = self.tx.update(grads, state.opt_state,
                                                state.params)
            params = optax.apply_updates(state.params, updates)
            return (state._replace(params=params, opt_state=opt_state,
                                   step=state.step + 1),
                    loss, logits)

        self._train_step = train_step
        self._predict = jax.jit(
            lambda p, batch: nlvr2_logits(p, batch, cfg))

    def _acc(self, logits, batch) -> Tuple[float, int]:
        pred = np.asarray(jnp.argmax(logits, -1))
        lbl = np.asarray(batch["label"])
        valid = lbl >= 0
        return float((pred[valid] == lbl[valid]).sum()), int(valid.sum())

    def train_epoch(self, batches) -> Tuple[float, float]:
        losses, hits, n = [], 0.0, 0
        for batch in batches:
            self.state, loss, logits = self._train_step(self.state, batch)
            losses.append(float(loss))
            h, k = self._acc(logits, batch)
            hits += h
            n += k
        return float(np.mean(losses)), hits / max(n, 1)

    def evaluate(self, batches) -> float:
        hits, n = 0.0, 0
        for batch in batches:
            h, k = self._acc(self._predict(self.state.params, batch),
                             batch)
            hits += h
            n += k
        return hits / max(n, 1)

    def fit(self, train_batches_fn, valid_batches_fn=None,
            printer=print) -> Dict[str, List[float]]:
        log: Dict[str, List[float]] = {"loss": [], "train_acc": [],
                                       "valid_acc": []}
        for epoch in range(self.ft.epochs):
            import inspect

            takes_epoch = bool(
                inspect.signature(train_batches_fn).parameters)
            batches = (train_batches_fn(epoch) if takes_epoch
                       else train_batches_fn())
            loss, train_acc = self.train_epoch(batches)
            line = f"Epoch {epoch}: Train {train_acc * 100:.2f}"
            log["loss"].append(loss)
            log["train_acc"].append(train_acc)
            if valid_batches_fn is not None:
                valid = self.evaluate(valid_batches_fn())
                log["valid_acc"].append(valid)
                if valid > self.best_valid:
                    self.best_valid = valid
                    self.best_params = jax.tree_util.tree_map(
                        lambda x: x, self.state.params)
                line += (f"  Valid {valid * 100:.2f}  "
                         f"Best {self.best_valid * 100:.2f}")
            printer(line)
        return log


def make_nlvr2_batches(dataset, feats, tokenizer, ft: FinetuneConfig,
                       max_boxes: int = 36,
                       shuffle_seed: Optional[int] = None,
                       drop_last: bool = False):
    """Collate NLVR2 records ({uid, img0, img1, sent, label}) into
    [B, 2, O, ...] padded batches (tasks/nlvr2_data.py pairing)."""
    items = [it for it in dataset.data
             if it["img0"] in feats and it["img1"] in feats]
    if shuffle_seed is not None:
        np.random.RandomState(shuffle_seed).shuffle(items)
    B = ft.batch_size
    batches = []
    for start in range(0, len(items), B):
        chunk = items[start:start + B]
        k = len(chunk)
        if k < B and drop_last:
            break
        pad = chunk + [chunk[-1]] * (B - k)
        enc = [tokenizer.encode_vqa(it["sent"], max_len=ft.max_text_len)
               for it in pad]
        pair = lambda it, f: np.stack(
            [feats[it["img0"]][f], feats[it["img1"]][f]])
        labels = np.asarray(
            [int(it["label"]) if i < k else -1
             for i, it in enumerate(pad)], np.int32)
        batches.append({
            "input_ids": jnp.asarray(
                np.stack([e["input_ids"] for e in enc])),
            "attention_mask": jnp.asarray(
                np.stack([e["input_mask"] for e in enc])),
            "visual_feats": jnp.asarray(
                np.stack([pair(it, "features") for it in pad])),
            "visual_pos": jnp.asarray(
                np.stack([pair(it, "boxes") for it in pad])),
            "visual_mask": jnp.asarray(np.stack(
                [np.stack([(np.arange(max_boxes)
                            < feats[it[s]]["num_boxes"]).astype(np.int32)
                           for s in ("img0", "img1")]) for it in pad])),
            "label": jnp.asarray(labels),  # padded tail → ignore_index -1
        })
    return batches


def _run_nlvr2(args, ft: FinetuneConfig, vqa_data, BertTokenizer) -> int:
    """The tasks/nlvr2.py file-driven loop (run/nlvr2_finetune.bash)."""
    import json

    train_set = vqa_data.NLVR2Dataset([args.train_questions])
    valid_set = (vqa_data.NLVR2Dataset([args.valid_questions])
                 if args.valid_questions else None)
    feats = vqa_data.FeatureStore(
        vqa_data.load_obj_tsv(args.features), max_boxes=36)
    tok = BertTokenizer(vocab_path=args.bert_vocab)

    n_train = len([it for it in train_set.data
                   if it["img0"] in feats and it["img1"] in feats])
    trainer = Nlvr2TaskTrainer(
        ft, batches_per_epoch=max(n_train // ft.batch_size, 1),
        seed=args.seed)

    def train_batches(epoch: int = 0):
        return make_nlvr2_batches(train_set, feats, tok, ft,
                                  shuffle_seed=args.seed + epoch,
                                  drop_last=True)

    valid_batches = (None if valid_set is None else
                     (lambda: make_nlvr2_batches(valid_set, feats, tok,
                                                 ft)))
    log = trainer.fit(train_batches, valid_batches)
    print(json.dumps({"loss": log["loss"],
                      "train_acc": log["train_acc"],
                      "valid_acc": log["valid_acc"],
                      "best_valid": trainer.best_valid}))
    return 0


def _smoke_nlvr2(ft: FinetuneConfig, seed: int) -> int:
    """Tiny-config NLVR2 end-to-end training demo."""
    import json

    cfg = lx.LxmertConfig(
        vocab_size=60, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=24,
        l_layers=2, x_layers=1, r_layers=1, visual_feat_dim=16,
        num_qa_labels=5)
    ft = dataclasses.replace(ft, batch_size=4, epochs=3)
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(2):
        batches.append({
            "input_ids": jnp.asarray(rng.randint(1, 59, (4, 8))),
            "attention_mask": jnp.asarray(np.ones((4, 8), np.int32)),
            "visual_feats": jnp.asarray(
                rng.randn(4, 2, 6, 16).astype(np.float32)),
            "visual_pos": jnp.asarray(
                rng.rand(4, 2, 6, 4).astype(np.float32)),
            "visual_mask": jnp.asarray(np.ones((4, 2, 6), np.int32)),
            "label": jnp.asarray(rng.randint(0, 2, (4,)), jnp.int32),
        })
    trainer = Nlvr2TaskTrainer(ft, model_cfg=cfg,
                               batches_per_epoch=len(batches), seed=seed)
    log = trainer.fit(lambda: batches, lambda: batches)
    ok = log["loss"][-1] < log["loss"][0]
    print(json.dumps({"loss": log["loss"], "valid_acc": log["valid_acc"],
                      "loss_decreased": bool(ok)}))
    return 0 if ok else 1
