"""The semantic-validation tool (tools/semantic_validation.py): the
causal task must actually be causal, and the assertion logic must
demand the properties the perturbation harness exists to measure.
The full trained-weights run is recorded as the SEMANTIC_r05.json
artifact; tiny untrained smoke here."""

import numpy as np
import pytest

from transformer_mm_explainability_tpu.tools import semantic_validation as sv


def test_task_batch_shapes_and_causality():
    task = sv.CausalVQATask(seed=0)
    rng = np.random.RandomState(1)
    b = task.batch(rng, 32)
    n = 32
    assert b["input_ids"].shape == (n, sv.TEXT_LEN)
    assert b["visual_feats"].shape == (n, sv.NUM_BOXES, sv.VIS_DIM)
    assert b["labels"].min() >= 0 and b["labels"].max() < sv.NUM_COLORS
    # protected positions hold CLS / '?' / SEP
    assert (b["input_ids"][:, 0] == sv.CLS_ID).all()
    assert (b["input_ids"][:, -2] == sv.QMARK_ID).all()
    assert (b["input_ids"][:, -1] == sv.SEP_ID).all()
    # exactly one marker token per question, at the recorded position
    marker_band = ((b["input_ids"] >= sv.MARKER_ID0)
                   & (b["input_ids"] < sv.MARKER_ID0 + sv.NUM_MARKERS))
    assert (marker_band.sum(axis=1) == 1).all()
    assert marker_band[np.arange(n), b["causal_token"]].all()
    # the causal box's color direction matches the label: nearest
    # color vector of the named box == the answer
    feats = b["visual_feats"][np.arange(n), b["causal_box"]]
    ask = b["input_ids"][np.arange(n), b["causal_token"]] - sv.MARKER_ID0
    resid = feats - task.marker_vecs[ask + 1]
    sims = resid @ task.color_vecs.T
    assert (sims.argmax(-1) == b["labels"]).mean() > 0.95


def test_task_answer_unrecoverable_without_causal_box():
    """Zeroing ONLY the named box destroys the color evidence: the
    nearest-color readout of every remaining box matches the label at
    chance — i.e. the task is causal through exactly that box."""
    task = sv.CausalVQATask(seed=0)
    b = task.batch(np.random.RandomState(2), 64)
    n = 64
    others = []
    for i in range(n):
        idx = [j for j in range(sv.NUM_BOXES) if j != b["causal_box"][i]]
        sims = b["visual_feats"][i, idx] @ task.color_vecs.T
        others.append((sims.argmax(-1) == b["labels"][i]).mean())
    # remaining boxes carry the label's color only at the base rate
    assert np.mean(others) < 2.5 / sv.NUM_COLORS


def _sweep(method, positive, text, auc):
    return {"method": method, "positive": positive, "text_pert": text,
            "auc": auc}


def test_check_semantics_pass_and_fail():
    good = []
    for text in (False, True):
        good += [
            _sweep("ours_no_lrp", False, text, 0.9),
            _sweep("ours_no_lrp", True, text, 0.2),
            _sweep("random_control", False, text, 0.55),
            _sweep("raw_attn", False, text, 0.85),
        ]
    rec = sv.check_semantics(good, "ours_no_lrp")
    assert rec["ok"]
    hard = [c for c in rec["checks"] if c["hard"]]
    assert len(hard) == 4 and all(c["ok"] for c in hard)

    # flat curves (random weights) must FAIL: the gap is ~0
    flat = []
    for text in (False, True):
        flat += [
            _sweep("ours_no_lrp", False, text, 0.31),
            _sweep("ours_no_lrp", True, text, 0.30),
            _sweep("random_control", False, text, 0.305),
        ]
    rec = sv.check_semantics(flat, "ours_no_lrp")
    assert not rec["ok"]


@pytest.mark.slow
def test_sweeps_smoke_untrained():
    """Pipeline smoke at tiny scale: the real runners + the random
    control execute and emit well-formed entries (semantics asserted
    only on trained weights — the recorded artifact)."""
    cfg, params, _, _ = sv._vb_setup()
    task = sv.CausalVQATask()
    sweeps = sv.run_sweeps("visual_bert", params, cfg, ["raw_attn"],
                           task, num_samples=8, batch_size=8,
                           printer=lambda *a: None)
    # 1 method x pos/neg x text/image + 2 controls
    assert len(sweeps) == 6
    for e in sweeps:
        assert len(e["step_accuracies"]) == len(e["steps"])
        assert np.isfinite(e["auc"])


def test_fully_masked_keys_contribute_nothing():
    """Reference parity at the 100%-removal perturbation step: physical
    removal leaves an empty key axis and torch matmul yields zeros
    (lxmert/lxmert/perturbation.py:112-117 at step=1.0) — the additive
    -10000 bias must not fall back to a uniform average of the
    'removed' values."""
    import jax.numpy as jnp
    from transformer_mm_explainability_tpu.ops.attention import (
        attention_core)

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 2, 3, 4).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 2, 5, 4).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 2, 5, 4).astype(np.float32))
    # batch 0: all keys masked; batch 1: one key valid
    mask = np.zeros((2, 1, 1, 5), np.float32)
    mask[0, ..., :] = -10000.0
    mask[1, ..., :4] = -10000.0
    out, probs = attention_core(q, k, v, mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    # the partially-masked batch attends only the valid key
    np.testing.assert_allclose(np.asarray(out[1]),
                               np.broadcast_to(np.asarray(v[1, :, 4:5]),
                                               out[1].shape), rtol=1e-5)
