"""Perturbation harness tests: mask-vs-removal equivalence and packing."""

import numpy as np
import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.harness import perturbation as pert
from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import visual_bert as vb

CFG = vb.VisualBERTConfig(
    bert=jbert.BertConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=24),
    visual_embedding_dim=16, num_labels=7,
)


def setup():
    params = vb.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    B, S_t, N_v = 1, 8, 6
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 50, (B, S_t))),
        "input_mask": jnp.asarray(np.ones((B, S_t), np.int32)),
        "visual_embeddings": jnp.asarray(
            rng.randn(B, N_v, 16).astype(np.float32)),
    }
    return params, batch


def scores_fn(params):
    def f(b):
        out = vb.forward(params, b["input_ids"], b["input_mask"],
                         b.get("visual_embeddings"),
                         visual_mask=b.get("visual_mask"), cfg=CFG)
        return out["scores"]
    return f


def test_mask_equals_physical_removal():
    """Masking dropped boxes == physically slicing them out."""
    params, batch = setup()
    f = scores_fn(params)
    keep_idx = [0, 2, 5]
    mask = np.zeros((1, 6), np.int32)
    mask[0, keep_idx] = 1
    masked = f({**batch, "visual_mask": jnp.asarray(mask)})[0]

    sliced = dict(batch)
    sliced["visual_embeddings"] = batch["visual_embeddings"][:, keep_idx]
    removed = f(sliced)[0]
    np.testing.assert_allclose(np.asarray(masked), np.asarray(removed),
                               atol=1e-5)


def test_gather_kept_prefix():
    tokens = jnp.asarray([101, 7, 8, 9, 102, 0, 0])
    keep = jnp.asarray([True, False, True, True, True, False, False])
    packed, mask = pert.gather_kept_prefix(tokens, keep)
    np.testing.assert_array_equal(np.asarray(packed)[:4], [101, 8, 9, 102])
    np.testing.assert_array_equal(np.asarray(mask), [1, 1, 1, 1, 0, 0, 0])


def test_topk_keep_mask():
    cam = jnp.asarray([0.1, 0.9, 0.5, 0.7, 0.2])
    keep = pert.topk_keep_mask(cam, jnp.asarray(2))
    np.testing.assert_array_equal(np.asarray(keep),
                                  [False, True, False, True, False])
    # validity excludes entries from ranking
    keep = pert.topk_keep_mask(cam, jnp.asarray(2),
                               valid=jnp.asarray([1, 0, 1, 1, 1], bool))
    np.testing.assert_array_equal(np.asarray(keep),
                                  [False, False, True, True, False])


def test_image_perturbation_monotone_steps():
    """step=0 keeps everything (accuracy = unperturbed); step=1 drops all."""
    params, batch = setup()
    f = scores_fn(params)
    targets = jnp.asarray(np.eye(7, dtype=np.float32)[3])
    cam = jnp.asarray(np.random.RandomState(1).rand(6).astype(np.float32))
    accs = pert.run_image_perturbation(
        f, batch, cam, targets, pert.IMAGE_STEPS_VISUALBERT, positive=False)
    assert accs.shape == (9,)
    # step 0 must equal the unperturbed model's answer score
    full = f({**batch, "visual_mask": jnp.ones((1, 6), jnp.int32)})[0]
    want = float(targets[int(np.argmax(np.asarray(full)))])
    assert float(accs[0]) == want


def test_text_perturbation_protects_special_tokens():
    params, batch = setup()
    f = scores_fn(params)
    targets = jnp.asarray(np.eye(7, dtype=np.float32)[2])
    cam = jnp.asarray(np.random.RandomState(2).rand(8).astype(np.float32))
    always = np.zeros(8, bool)
    always[[0, 6, 7]] = True  # CLS, '?', SEP
    accs = pert.run_text_perturbation(
        f, batch, cam, targets, pert.TEXT_STEPS, positive=True,
        always_keep=jnp.asarray(always), text_len=jnp.asarray(8))
    assert accs.shape == (9,)
    assert np.isfinite(np.asarray(accs)).all()


def test_auc():
    accs = np.asarray([1.0, 0.8, 0.6, 0.4, 0.2, 0.2, 0.2, 0.1, 0.0])
    a = pert.auc(accs, pert.TEXT_STEPS)
    assert 0.0 < a < 1.0


def test_image_perturbation_batch_matches_single():
    """Batched multi-sample pert == per-sample pert."""
    params, _ = setup()
    f = scores_fn(params)
    rng = np.random.RandomState(3)
    N, S_t, N_v = 3, 8, 6
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 50, (N, S_t))),
        "input_mask": jnp.asarray(np.ones((N, S_t), np.int32)),
        "visual_embeddings": jnp.asarray(
            rng.randn(N, N_v, 16).astype(np.float32)),
    }
    cams = jnp.asarray(rng.rand(N, N_v).astype(np.float32))
    targets = jnp.asarray(np.eye(7, dtype=np.float32)[[1, 3, 5]])
    got = pert.run_image_perturbation_batch(
        f, batch, cams, targets, pert.IMAGE_STEPS_VISUALBERT, positive=True)
    assert got.shape == (N, 9)
    for i in range(N):
        single = {k: v[i:i + 1] for k, v in batch.items()}
        want = pert.run_image_perturbation(
            f, single, cams[i], targets[i], pert.IMAGE_STEPS_VISUALBERT,
            positive=True)
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=1e-6, err_msg=f"sample {i}")


def test_text_packing_equals_physical_removal():
    """Packed-prefix text perturbation == physically removing tokens
    (the reference re-sorts kept tokens so positions stay contiguous —
    perturbation.py:173-174; packing reproduces that exactly)."""
    params, _ = setup()
    f = scores_fn(params)
    rng = np.random.RandomState(7)
    ids = np.array([[49, 7, 8, 9, 10, 11, 12, 48]])  # CLS ... ? SEP
    vis = rng.randn(1, 6, 16).astype(np.float32)
    keep = np.array([True, False, True, True, False, False, True, True])

    # packed path (static length 8, mask marks the 5 kept)
    packed, mask = pert.gather_kept_prefix(jnp.asarray(ids[0]),
                                           jnp.asarray(keep))
    got = f({"input_ids": packed[None], "input_mask": mask[None],
             "visual_embeddings": jnp.asarray(vis)})[0]

    # physical removal (shorter static length 5)
    kept_ids = ids[0][keep][None]
    want = f({"input_ids": jnp.asarray(kept_ids),
              "input_mask": jnp.asarray(np.ones((1, 5), np.int32)),
              "visual_embeddings": jnp.asarray(vis)})[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_text_perturbation_batch_matches_single():
    params, _ = setup()
    f = scores_fn(params)
    rng = np.random.RandomState(9)
    N, S_t, N_v = 2, 8, 6
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 50, (N, S_t))),
        "input_mask": jnp.asarray(np.ones((N, S_t), np.int32)),
        "visual_embeddings": jnp.asarray(
            rng.randn(N, N_v, 16).astype(np.float32)),
    }
    cams = jnp.asarray(rng.rand(N, S_t).astype(np.float32))
    targets = jnp.asarray(np.eye(7, dtype=np.float32)[[2, 4]])
    always = np.zeros((N, S_t), bool)
    always[:, [0, 6, 7]] = True
    text_len = jnp.asarray([8, 8])
    got = pert.run_text_perturbation_batch(
        f, batch, cams, targets, pert.TEXT_STEPS, positive=False,
        always_keep=jnp.asarray(always), text_len=text_len)
    assert got.shape == (N, 9)
    for i in range(N):
        single = {k: v[i:i + 1] for k, v in batch.items()}
        want = pert.run_text_perturbation(
            f, single, cams[i], targets[i], pert.TEXT_STEPS, positive=False,
            always_keep=jnp.asarray(always[i]), text_len=text_len[i])
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(want),
                                   atol=1e-6, err_msg=f"sample {i}")
