"""BertAdam optimizer + DETR train step."""

import json
import pathlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.models import detr as jdetr
from transformer_mm_explainability_tpu.train import detr_train, steps


def test_bert_adam_matches_reference_formula():
    """One BertAdam update vs the hand-computed formula (no bias
    correction, decoupled wd, warmup_linear lr)."""
    lr, warmup, total, wd, eps = 0.1, 0.5, 10, 0.01, 1e-6
    tx = steps.make_bert_adam(lr, warmup, total, wd, grad_clip=1e9, eps=eps)
    p = {"w": jnp.asarray([1.0, -2.0])}
    g = {"w": jnp.asarray([0.5, 0.25])}
    state = tx.init(p)
    updates, state = tx.update(g, state, p)
    m = 0.1 * np.asarray([0.5, 0.25])
    v = 0.001 * np.asarray([0.5, 0.25]) ** 2
    lr0 = lr * (0.0 / total) / warmup  # step 0 → lr 0 (linear warmup)
    want = -lr0 * (m / (np.sqrt(v) + eps) + wd * np.asarray([1.0, -2.0]))
    np.testing.assert_allclose(np.asarray(updates["w"]), want, atol=1e-8)
    # second step: lr = lr * (0.1/0.5)
    updates, state = tx.update(g, state, p)
    m2 = 0.9 * m + 0.1 * np.asarray([0.5, 0.25])
    v2 = 0.999 * v + 0.001 * np.asarray([0.5, 0.25]) ** 2
    lr1 = lr * (0.1 / 0.5)
    want = -lr1 * (m2 / (np.sqrt(v2) + eps) + wd * np.asarray([1.0, -2.0]))
    np.testing.assert_allclose(np.asarray(updates["w"]), want, rtol=1e-6)


def test_bert_adam_decays_after_warmup():
    tx = steps.make_bert_adam(0.1, warmup=0.1, total_steps=10,
                              grad_clip=1e9)
    p = {"w": jnp.ones(2)}
    g = {"w": jnp.ones(2)}
    state = tx.init(p)
    mags = []
    for _ in range(10):
        updates, state = tx.update(g, state, p)
        mags.append(float(jnp.abs(updates["w"][0])))
    assert mags[1] > mags[0]          # warming up
    assert mags[9] < mags[2]          # decaying after warmup


def test_detr_train_step_decreases_loss():
    cfg = jdetr.DETRConfig(num_classes=5, num_queries=4, d_model=32,
                           nheads=4, num_encoder_layers=1,
                           num_decoder_layers=1, dim_feedforward=64)
    params = jdetr.init_params(jax.random.PRNGKey(0), cfg)
    tx = steps.make_adamw(1e-4)
    state = steps.init_state(params, tx)
    predict, step = detr_train.make_detr_train_step(cfg, tx)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    tgt_labels = jnp.asarray([[1, 2], [3, 0]])
    boxes = np.stack([
        [[0.3, 0.3, 0.2, 0.2], [0.7, 0.7, 0.2, 0.3]],
        [[0.5, 0.5, 0.4, 0.4], [0.0, 0.0, 0.0, 0.0]],
    ]).astype(np.float32)
    tgt_boxes = jnp.asarray(boxes)
    n_valid = np.asarray([2, 1])

    losses_first = None
    for i in range(8):
        state, losses = detr_train.train_batch(
            state, images, tgt_labels, tgt_boxes, n_valid, predict, step)
        if losses_first is None:
            losses_first = losses
    assert float(losses["loss"]) < float(losses_first["loss"])
    for k in ("loss_ce", "loss_bbox", "loss_giou"):
        assert np.isfinite(float(losses[k]))


def test_bert_no_decay_mask_and_multiplier():
    """mmf/utils/modeling.py:18-67 semantics: bias/LayerNorm leaves
    exempt from weight decay; non-classifier subtrees get lr ×
    finetune_lr_multiplier."""
    import optax
    from transformer_mm_explainability_tpu.train import steps

    params = {
        "encoder": {"attn": {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)},
                    "attn_ln": {"scale": jnp.ones(4),
                                "bias": jnp.zeros(4)}},
        "classifier": {"w": jnp.ones((4, 2)), "b": jnp.zeros(2)},
    }
    mask = steps.bert_no_decay_mask(params)
    assert mask["encoder"]["attn"]["w"] is True
    assert mask["encoder"]["attn"]["b"] is False
    assert mask["encoder"]["attn_ln"]["scale"] is False
    assert mask["classifier"]["w"] is True

    tx = steps.make_bert_optimizer(params, learning_rate=1.0,
                                   weight_decay=0.0,
                                   finetune_lr_multiplier=0.0)
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(g, state, params)
    # backbone lr multiplied by 0 → zero updates; classifier moves
    assert float(jnp.abs(updates["encoder"]["attn"]["w"]).max()) == 0.0
    assert float(jnp.abs(updates["classifier"]["w"]).max()) > 0.0


def test_process_answers_vocab(tmp_path):
    """process_answers.py:10-104: score table, filtering, vocab file."""
    from transformer_mm_explainability_tpu.tools import process_answers

    assert process_answers.get_score(0) == 0.0
    assert process_answers.get_score(2) == 0.6
    assert process_answers.get_score(7) == 1.0

    ann = {"annotations": [
        {"question_id": 1, "multiple_choice_answer": "Two, dogs?"},
        {"question_id": 2, "multiple_choice_answer": "two dogs"},
        {"question_id": 3, "multiple_choice_answer": "a cat"},
        {"question_id": 4, "multiple_choice_answer": "the cat"},
        # same qid → one occurrence only
        {"question_id": 1, "multiple_choice_answer": "two dogs"},
    ]}
    f = tmp_path / "train.json"
    f.write_text(json.dumps(ann))
    out = process_answers.build_answer_vocab(str(f), out_dir=str(tmp_path),
                                             min_freq=2)
    words = pathlib.Path(out).read_text().split()
    assert words[0] == "<unk>"
    assert "2 dogs" in " ".join(words)  # EvalAI-normalized
    assert "cat" in words  # "a" article stripped


def test_set_criterion_pad_rows_do_not_clobber_query_zero():
    """Regression: pad targets (assignment -1) used to scatter class C
    at query 0, nondeterministically overwriting a real assignment to
    query 0 (JAX duplicate-scatter order is unspecified)."""
    from transformer_mm_explainability_tpu.models import matcher

    B, Q, C = 1, 4, 5
    rs = np.random.RandomState(0)
    logits = jnp.asarray(rs.randn(B, Q, C + 1).astype(np.float32))
    boxes = jnp.asarray(rs.rand(B, Q, 4).astype(np.float32))
    # one real target assigned to QUERY 0, one pad row
    assignment = jnp.asarray([[0, -1]])
    tgt_labels = jnp.asarray([[2, 0]])
    tgt_boxes = jnp.asarray(rs.rand(B, 2, 4).astype(np.float32))
    losses = matcher.set_criterion_losses(
        logits, boxes, tgt_labels, tgt_boxes, assignment)
    # recompute CE by hand with query 0 = class 2, rest no-object
    tc = np.full((B, Q), C)
    tc[0, 0] = 2
    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    w = np.where(tc == C, 0.1, 1.0)
    ce = -np.take_along_axis(logp, tc[..., None], -1)[..., 0]
    want = (ce * w).sum() / w.sum()
    assert float(losses["loss_ce"]) == pytest.approx(float(want),
                                                     rel=1e-5)
