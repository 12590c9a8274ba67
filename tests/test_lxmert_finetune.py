"""LXMERT task finetune loop (C36): protocol pieces vs the reference
tasks/vqa.py + lxrt/optimization.py, and the end-to-end loop."""

import json

import numpy as np
import pytest

from conftest import REFERENCE, load_reference_module, requires_reference

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu import cli
from transformer_mm_explainability_tpu.train import lxmert_tasks, steps


def test_bce_vqa_loss_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(6, 11).astype(np.float32)
    targets = (rng.rand(6, 11) < 0.2).astype(np.float32) * 0.9
    want = (torch.nn.BCEWithLogitsLoss()(
        torch.from_numpy(logits), torch.from_numpy(targets)) * 11).item()
    got = float(lxmert_tasks.bce_vqa_loss(jnp.asarray(logits),
                                          jnp.asarray(targets)))
    assert got == pytest.approx(want, rel=1e-5)


@requires_reference
def test_bert_adam_schedule_matches_reference():
    """Our warmup_linear lr multiplier == lxrt/optimization.py's at
    sampled progress points."""
    ref = load_reference_module("lxmert/lxmert/src/lxrt/optimization.py",
                                "ref_lxrt_optim")
    total, warmup, lr = 200, 0.1, 5e-5

    tx = steps.make_bert_adam(lr, warmup=warmup, total_steps=total)
    # extract the applied lr by running one synthetic update with a
    # fixed unit gradient on a zero param at a given step count
    for step in (0, 5, 19, 20, 21, 100, 199):
        params = {"w": jnp.zeros((1,))}
        state = tx.init(params)
        # fast-forward the inner optimizer's step counter
        inner = state[1]
        inner = dict(inner)
        inner["step"] = jnp.asarray(step, jnp.int32)
        state = (state[0], inner)
        updates, _ = tx.update({"w": jnp.ones((1,))}, state, params)
        # with m=v=0 → m=(1-b1)g, v=(1-b2)g² → update = -lr_sched *
        # (m/(sqrt(v)+eps) + 0) ≈ -lr_sched * (1-b1)/sqrt(1-b2)
        got_lr = -float(updates["w"][0]) / (0.1 / np.sqrt(0.001))
        want = lr * ref.warmup_linear(step / total, warmup)
        assert got_lr == pytest.approx(want, rel=1e-3), f"step {step}"


def test_finetune_smoke_cli(capsys):
    rc = cli.main(["lxmert-finetune"])
    out = capsys.readouterr().out
    payload = json.loads([l for l in out.splitlines()
                          if l.startswith("{")][-1])
    assert rc == 0
    assert payload["loss_decreased"]
    assert len(payload["loss"]) == 3


def test_finetune_files_end_to_end(tmp_path, capsys):
    """run/vqa_finetune.bash surface driven from real files: VQA json +
    TSV features + WordPiece vocab → per-epoch train/valid accuracy."""
    import base64

    rng = np.random.RandomState(0)
    questions = [
        {"question_id": i, "img_id": f"img_{i % 2}",
         "sent": "what color is the dog?",
         "label": {"brown": 1.0} if i % 2 == 0 else {"black": 0.9}}
        for i in range(6)
    ]
    (tmp_path / "q.json").write_text(json.dumps(questions))
    (tmp_path / "ans2label.json").write_text(
        json.dumps({"brown": 0, "black": 1, "yes": 2}))
    (tmp_path / "label2ans.json").write_text(
        json.dumps(["brown", "black", "yes"]))
    rows = []
    for i in range(2):
        n = 5
        b64 = lambda a: base64.b64encode(a.tobytes()).decode()
        rows.append("\t".join([
            f"img_{i}", "480", "640",
            b64(rng.randint(0, 9, n).astype(np.int64)),
            b64(rng.rand(n).astype(np.float32)),
            b64(rng.randint(0, 9, n).astype(np.int64)),
            b64(rng.rand(n).astype(np.float32)),
            str(n),
            b64((rng.rand(n, 4) * 100).astype(np.float32)),
            b64(rng.randn(n, 2048).astype(np.float32)),
        ]))
    (tmp_path / "f.tsv").write_text("\n".join(rows) + "\n")
    (tmp_path / "vocab.txt").write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "what", "color", "is",
         "the", "dog", "?"]) + "\n")

    rc = cli.main([
        "lxmert-finetune", "--task", "vqa",
        "--train-questions", str(tmp_path / "q.json"),
        "--valid-questions", str(tmp_path / "q.json"),
        "--features", str(tmp_path / "f.tsv"),
        "--ans2label", str(tmp_path / "ans2label.json"),
        "--label2ans", str(tmp_path / "label2ans.json"),
        "--bert-vocab", str(tmp_path / "vocab.txt"),
        "--llayers", "1", "--xlayers", "1", "--rlayers", "1",
        "--batch-size", "2", "--epochs", "2", "--lr", "1e-4",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    payload = json.loads([l for l in out.splitlines()
                          if l.startswith("{")][-1])
    assert len(payload["loss"]) == 2
    assert len(payload["valid_acc"]) == 2
    assert 0.0 <= payload["best_valid"] <= 1.0


def test_trainer_memorizes_tiny_set():
    """The protocol trains: a tiny model overfits 4 samples (loss
    decreases monotonically-ish and train accuracy reaches 1)."""
    from transformer_mm_explainability_tpu.models import lxmert as lx

    cfg = lx.LxmertConfig(
        vocab_size=30, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=16,
        l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=8,
        num_qa_labels=4)
    ft = lxmert_tasks.FinetuneConfig(batch_size=4, epochs=12, lr=2e-3)
    rng = np.random.RandomState(1)
    tgt = np.zeros((4, 4), np.float32)
    tgt[np.arange(4), [0, 1, 2, 3]] = 1.0
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 29, (4, 7))),
        "attention_mask": jnp.asarray(np.ones((4, 7), np.int32)),
        "visual_feats": jnp.asarray(rng.randn(4, 5, 8).astype(np.float32)),
        "visual_pos": jnp.asarray(rng.rand(4, 5, 4).astype(np.float32)),
        "target": jnp.asarray(tgt),
    }
    trainer = lxmert_tasks.LxmertTaskTrainer(
        4, ft, model_cfg=cfg, batches_per_epoch=1, seed=1)
    log = trainer.fit(lambda: [batch], lambda: [batch],
                      printer=lambda *a: None)
    assert log["loss"][-1] < log["loss"][0]
    assert log["valid_acc"][-1] == 1.0
    assert trainer.best_valid == 1.0 and trainer.best_params is not None


def test_nlvr2_trainer_memorizes_tiny_set():
    """NLVR2 protocol (tasks/nlvr2.py + nlvr2_model.py): paired-image
    pooled concat -> 2-way head; CE ignore_index=-1; tiny model
    overfits 4 samples."""
    from transformer_mm_explainability_tpu.models import lxmert as lx

    cfg = lx.LxmertConfig(
        vocab_size=30, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=16,
        l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=8,
        num_qa_labels=4)
    ft = lxmert_tasks.FinetuneConfig(batch_size=4, epochs=15, lr=2e-3,
                                     task="nlvr2")
    rng = np.random.RandomState(2)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 29, (4, 7))),
        "attention_mask": jnp.asarray(np.ones((4, 7), np.int32)),
        "visual_feats": jnp.asarray(
            rng.randn(4, 2, 5, 8).astype(np.float32)),
        "visual_pos": jnp.asarray(
            rng.rand(4, 2, 5, 4).astype(np.float32)),
        "visual_mask": jnp.asarray(np.ones((4, 2, 5), np.int32)),
        "label": jnp.asarray([0, 1, 1, 0], jnp.int32),
    }
    trainer = lxmert_tasks.Nlvr2TaskTrainer(
        ft, model_cfg=cfg, batches_per_epoch=1, seed=2)
    log = trainer.fit(lambda: [batch], lambda: [batch],
                      printer=lambda *a: None)
    assert log["loss"][-1] < log["loss"][0]
    assert log["valid_acc"][-1] == 1.0


def test_nlvr2_loss_ignore_index():
    """Padded samples (label -1) contribute nothing (CE ignore_index)."""
    logits = jnp.asarray([[3.0, -3.0], [0.5, 0.2], [9.0, -9.0]])
    labels = jnp.asarray([0, 1, -1])
    full = lxmert_tasks.nlvr2_loss(logits, labels)
    sub = lxmert_tasks.nlvr2_loss(logits[:2], labels[:2])
    np.testing.assert_allclose(float(full), float(sub), rtol=1e-6)


def test_nlvr2_batching_pairs_images(tmp_path):
    """make_nlvr2_batches pairs img0/img1 per record and pads the tail
    with label -1."""
    from transformer_mm_explainability_tpu.data import vqa as vqa_data
    from transformer_mm_explainability_tpu.data.tokenization import (
        BertTokenizer)

    records = [
        {"uid": f"u{i}", "img0": f"im{i}a", "img1": f"im{i}b",
         "sent": "two dogs", "label": i % 2} for i in range(3)]
    import json
    p = tmp_path / "train.json"
    p.write_text(json.dumps(records))
    ds = vqa_data.NLVR2Dataset([str(p)])
    rng = np.random.RandomState(0)
    items = []
    for r in records:
        for key in ("img0", "img1"):
            items.append({"img_id": r[key], "num_boxes": 4,
                          "features": rng.randn(4, 8).astype(np.float32),
                          "boxes": rng.rand(4, 4).astype(np.float32) * 50,
                          "img_h": 100, "img_w": 100})
    feats = vqa_data.FeatureStore(items, max_boxes=6)
    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "two", "dogs"])}
    tok = BertTokenizer(vocab=vocab)
    ft = lxmert_tasks.FinetuneConfig(batch_size=4, task="nlvr2",
                                     max_text_len=8)
    batches = lxmert_tasks.make_nlvr2_batches(ds, feats, tok, ft,
                                              max_boxes=6)
    assert len(batches) == 1
    b = batches[0]
    assert b["visual_feats"].shape == (4, 2, 6, 8)
    assert list(np.asarray(b["label"])) == [0, 1, 0, -1]  # tail padded
    np.testing.assert_array_equal(
        np.asarray(b["visual_feats"][0, 0, :4]),
        feats["im0a"]["features"][:4])
    np.testing.assert_array_equal(
        np.asarray(b["visual_feats"][0, 1, :4]),
        feats["im0b"]["features"][:4])
