"""Perturbation runners (VisualBERT + LXMERT) + metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.core import metrics
from transformer_mm_explainability_tpu.harness.pert_runner import (
    LxmertPerturbationRunner, VisualBertPerturbationRunner, run_loop)
from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import lxmert as jlx
from transformer_mm_explainability_tpu.models import visual_bert as vb


def test_vqa_accuracy():
    """Reference semantics (metrics.py:329-362): the UNK column (index
    0) is masked before the argmax, so row 2's argmax-at-0 score does
    NOT count — its masked argmax lands on column 1 (soft 0.0)."""
    scores = jnp.asarray([[0.1, 2.0, 0.3], [5.0, 0.0, 0.0]])
    soft = jnp.asarray([[0.0, 0.6, 1.0], [0.3, 0.0, 0.0]])
    got = float(metrics.compute("vqa_accuracy", scores, soft))
    assert got == pytest.approx((0.6 + 0.0) / 2)


def test_accuracy_and_topk():
    scores = jnp.asarray([[0.1, 2.0], [5.0, 0.0]])
    t = jnp.asarray([1, 1])
    assert float(metrics.compute("accuracy", scores, t)) == 0.5
    assert float(metrics.compute("top_k_accuracy", scores, t, k=2)) == 1.0


@pytest.mark.parametrize("method", ["ours_no_lrp", "ours_with_lrp",
                                    "raw_attn", "rollout", "attn_gradcam"])
def test_visual_bert_runner_all_methods(method):
    cfg = vb.VisualBERTConfig(
        bert=jbert.BertConfig(vocab_size=80, hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=48,
                              max_position_embeddings=30),
        visual_embedding_dim=16, num_labels=9)
    params = vb.init_params(jax.random.PRNGKey(0), cfg)
    runner = VisualBertPerturbationRunner(params, cfg, method,
                                          positive=False, text_pert=False)
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 79, (1, 10))),
        "input_mask": jnp.asarray(np.ones((1, 10), np.int32)),
        "visual_embeddings": jnp.asarray(
            rng.randn(1, 7, 16).astype(np.float32)),
    }
    soft = np.zeros(9, np.float32)
    soft[3] = 1.0
    accs = runner.run_sample(batch, soft)
    assert accs.shape == (9,)
    assert np.isfinite(accs).all()


@pytest.mark.parametrize("method,text", [
    ("ours_no_lrp", False), ("ours_with_lrp", False),
    ("transformer_att", True), ("raw_attn", True),
])
def test_lxmert_runner(method, text):
    cfg = jlx.LxmertConfig(
        vocab_size=60, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=20,
        l_layers=2, x_layers=2, r_layers=2,
        visual_feat_dim=16, visual_pos_dim=4, num_qa_labels=6)
    params = jlx.init_params(jax.random.PRNGKey(1), cfg)
    runner = LxmertPerturbationRunner(params, cfg, method,
                                      positive=True, text_pert=text)
    rng = np.random.RandomState(1)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 59, (1, 9))),
        "attention_mask": jnp.asarray(np.ones((1, 9), np.int64)),
        "visual_feats": jnp.asarray(rng.randn(1, 6, 16).astype(np.float32)),
        "visual_pos": jnp.asarray(rng.rand(1, 6, 4).astype(np.float32)),
    }
    soft = np.zeros(6, np.float32)
    soft[2] = 0.9
    accs = runner.run_sample(batch, soft)
    assert accs.shape == (9,)
    assert np.isfinite(accs).all()
    # step 0 accuracy equals the unperturbed prediction's soft score
    assert accs[0] in (0.0, np.float32(0.9))


def test_run_loop_aggregates(capsys):
    class Fake:
        steps = (0.0, 0.5, 1.0)

        def run_samples_batched(self, batch, soft):
            return np.tile([1.0, 0.5, 0.0], (len(batch["x"]), 1))

    samples = [({"x": jnp.zeros((1, 2))}, np.zeros(3))] * 3
    out = run_loop(Fake(), samples, 3, batch_size=2)
    np.testing.assert_allclose(out, [1.0, 0.5, 0.0])
    text = capsys.readouterr().out
    assert "step_accuracies" in text and "auc" in text


def test_run_loop_double_buffered_async_runner():
    """run_loop keeps one batch in flight via submit_batched and must
    still trim padding, settle the final pending batch, and sum per-
    sample accuracies exactly — checked with distinct per-sample rows
    and a deliberately lazy (device-like) return object."""
    calls = []

    class Lazy:
        def __init__(self, arr):
            self.arr = arr

        def __array__(self, dtype=None, copy=None):
            return self.arr

    class Fake:
        steps = (0.0, 0.5, 1.0)

        def submit_batched(self, batch, soft):
            calls.append(len(batch["x"]))
            # row i's accuracy vector encodes its sample id (soft[i,0])
            return Lazy(np.repeat(soft[:, :1], 3, axis=1))

    # 5 samples, batch_size 2 -> batches of 2,2,1(padded to 2)
    samples = [({"x": np.zeros((1, 2))}, np.full(3, float(i)))
               for i in range(5)]
    out = run_loop(Fake(), samples, 5, batch_size=2,
                   printer=lambda *a: None)
    # padding row (repeat of sample 4) must NOT be counted:
    # mean of 0..4 = 2.0 per step
    np.testing.assert_allclose(out, [2.0, 2.0, 2.0])
    assert calls == [2, 2, 2]  # last call padded to the compiled shape


def test_visual_bert_batched_matches_per_sample():
    cfg = vb.VisualBERTConfig(
        bert=jbert.BertConfig(vocab_size=80, hidden_size=32,
                              num_hidden_layers=2, num_attention_heads=4,
                              intermediate_size=48,
                              max_position_embeddings=30),
        visual_embedding_dim=16, num_labels=9)
    params = vb.init_params(jax.random.PRNGKey(0), cfg)
    runner = VisualBertPerturbationRunner(params, cfg, "ours_no_lrp",
                                          positive=False, text_pert=False)
    rng = np.random.RandomState(4)
    N = 3
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 79, (N, 10))),
        "input_mask": jnp.asarray(np.ones((N, 10), np.int32)),
        "visual_embeddings": jnp.asarray(
            rng.randn(N, 7, 16).astype(np.float32)),
    }
    soft = np.zeros((N, 9), np.float32)
    soft[np.arange(N), [2, 5, 7]] = 1.0
    got = runner.run_samples_batched(batch, soft)
    assert got.shape == (N, 9)
    for i in range(N):
        single = {k: v[i:i + 1] for k, v in batch.items()}
        want = runner.run_sample(single, soft[i])
        np.testing.assert_allclose(got[i], want, atol=1e-6,
                                   err_msg=f"sample {i}")


def test_accuracy_singleton_target_column():
    """Regression: [B, 1] class-index targets must not broadcast into
    a [B, B] comparison (accuracy > 1)."""
    scores = jnp.asarray([[0.1, 2.0], [5.0, 0.0], [0.0, 3.0]])
    t = jnp.asarray([[1], [0], [0]])
    got = float(metrics.compute("accuracy", scores, t))
    assert got == pytest.approx(2 / 3)
