"""BertAdam optimizer + DETR train step."""

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
