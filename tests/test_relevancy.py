"""Parity tests for the relevancy rule kernels vs the PyTorch reference.

Golden values come from importing the reference's own rule functions
(torch CPU) and running them on shared random inputs; target max-abs
deviation < 1e-4 (see BASELINE.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.ops import relevancy as rl

from conftest import requires_reference, load_reference_module


@pytest.fixture(scope="module")
def ref_gen():
    # lxmert copy has the full bi-modal rule set
    return load_reference_module(
        "lxmert/lxmert/src/ExplanationGenerator.py", "ref_expl_lxmert"
    )


@pytest.fixture(scope="module")
def ref_gen_detr():
    return load_reference_module(
        "DETR/modules/ExplanationGenerator.py", "ref_expl_detr"
    )


def rand(*shape, seed=0, positive=False):
    rng = np.random.RandomState(seed)
    x = rng.randn(*shape).astype(np.float32)
    return np.abs(x) if positive else x


@requires_reference
def test_avg_heads_parity(ref_gen):
    import torch

    cam = rand(1, 12, 17, 17, seed=1, positive=True)
    grad = rand(1, 12, 17, 17, seed=2)
    want = ref_gen.avg_heads(torch.tensor(cam), torch.tensor(grad)).numpy()
    got = np.asarray(rl.avg_heads(jnp.asarray(cam), jnp.asarray(grad)))
    np.testing.assert_allclose(got, want, atol=1e-6)


@requires_reference
def test_self_attention_rules_parity(ref_gen):
    import torch

    R_ss = rand(17, 17, seed=3)
    R_sq = rand(17, 9, seed=4)
    cam = rand(17, 17, seed=5, positive=True)
    want_ss, want_sq = ref_gen.apply_self_attention_rules(
        torch.tensor(R_ss), torch.tensor(R_sq), torch.tensor(cam)
    )
    got_ss, got_sq = rl.apply_self_attention_rules(
        jnp.asarray(R_ss), jnp.asarray(R_sq), jnp.asarray(cam)
    )
    np.testing.assert_allclose(np.asarray(got_ss), want_ss.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sq), want_sq.numpy(), atol=1e-5)


@requires_reference
def test_handle_residual_parity(ref_gen):
    import torch

    # diagonal-dominant positive matrix, like accumulated relevancies
    R = rand(11, 11, seed=6, positive=True) + 3 * np.eye(11, dtype=np.float32)
    want = ref_gen.handle_residual(torch.tensor(R)).numpy()
    got = np.asarray(rl.handle_residual(jnp.asarray(R)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@requires_reference
def test_mm_attention_rules_parity_lxmert(ref_gen):
    import torch

    R_ss = rand(17, 17, seed=7, positive=True) + 2 * np.eye(17, dtype=np.float32)
    R_qq = rand(9, 9, seed=8, positive=True) + 2 * np.eye(9, dtype=np.float32)
    R_qs = rand(9, 17, seed=9)
    cam_sq = rand(17, 9, seed=10, positive=True)
    for norm in (True, False):
        for self10 in (True, False):
            want_sq, want_ss = ref_gen.apply_mm_attention_rules(
                torch.tensor(R_ss),
                torch.tensor(R_qq),
                torch.tensor(R_qs),
                torch.tensor(cam_sq),
                apply_normalization=norm,
                apply_self_in_rule_10=self10,
            )
            got_sq, got_ss = rl.apply_mm_attention_rules(
                jnp.asarray(R_ss),
                jnp.asarray(R_qq),
                jnp.asarray(cam_sq),
                R_qs=jnp.asarray(R_qs),
                apply_normalization=norm,
                apply_self_in_rule_10=self10,
            )
            np.testing.assert_allclose(
                np.asarray(got_sq), want_sq.numpy(), atol=1e-4
            )
            np.testing.assert_allclose(
                np.asarray(got_ss), want_ss.numpy(), atol=1e-4
            )


@requires_reference
def test_mm_attention_rules_parity_detr(ref_gen_detr):
    import torch

    R_ss = rand(9, 9, seed=11, positive=True) + 2 * np.eye(9, dtype=np.float32)
    R_qq = rand(13, 13, seed=12, positive=True) + 2 * np.eye(13, dtype=np.float32)
    cam_sq = rand(9, 13, seed=13, positive=True)
    want = ref_gen_detr.apply_mm_attention_rules(
        torch.tensor(R_ss), torch.tensor(R_qq), torch.tensor(cam_sq)
    ).numpy()
    got, none_out = rl.apply_mm_attention_rules(
        jnp.asarray(R_ss), jnp.asarray(R_qq), jnp.asarray(cam_sq),
        nan_to_zero=True,
    )
    assert none_out is None
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@requires_reference
def test_rollout_parity(ref_gen):
    import torch

    mats = rand(5, 17, 17, seed=14, positive=True)
    want = ref_gen.compute_rollout_attention(
        [torch.tensor(m) for m in mats], start_layer=0
    ).numpy()
    got = np.asarray(rl.compute_rollout_attention(jnp.asarray(mats)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    want1 = ref_gen.compute_rollout_attention(
        [torch.tensor(m) for m in mats], start_layer=2
    ).numpy()
    got1 = np.asarray(
        rl.compute_rollout_attention(jnp.asarray(mats), start_layer=2)
    )
    np.testing.assert_allclose(got1, want1, atol=1e-5)


@requires_reference
def test_rollout_no_normalize_visualbert():
    """VisualBERT's rollout skips row-normalisation — check that branch."""
    import torch

    ref_vb = load_reference_module(
        "VisualBERT/mmf/models/transformers/backends/ExplanationGenerator.py",
        "ref_expl_vb",
    )
    mats = rand(4, 1, 9, 9, seed=15, positive=True)  # batched [L][B,S,S]
    want = ref_vb.compute_rollout_attention(
        [torch.tensor(m) for m in mats], start_layer=0
    ).numpy()[0]
    got = np.asarray(
        rl.compute_rollout_attention(jnp.asarray(mats[:, 0]), normalize=False)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_self_attention_relevancy_matches_python_loop():
    """Scan-based chain == straight NumPy implementation of the loop."""
    L, H, S = 6, 4, 15
    cams = rand(L, H, S, S, seed=16, positive=True)
    grads = rand(L, H, S, S, seed=17)

    R = np.eye(S, dtype=np.float32)
    for l in range(L):
        e_hat = np.maximum(grads[l] * cams[l], 0).mean(0)
        R = R + e_hat @ R
    got = np.asarray(rl.self_attention_relevancy(jnp.asarray(cams), jnp.asarray(grads)))
    np.testing.assert_allclose(got, R, rtol=1e-5, atol=1e-4)


def test_self_attention_relevancy_start_layer():
    L, H, S = 4, 2, 7
    cams = rand(L, H, S, S, seed=18, positive=True)
    grads = rand(L, H, S, S, seed=19)
    R = np.eye(S, dtype=np.float32)
    for l in range(2, L):
        e_hat = np.maximum(grads[l] * cams[l], 0).mean(0)
        R = R + e_hat @ R
    got = np.asarray(
        rl.self_attention_relevancy(jnp.asarray(cams), jnp.asarray(grads), start_layer=2)
    )
    np.testing.assert_allclose(got, R, atol=1e-5)


def test_self_attention_relevancy_update_no_agg():
    L, H, S, Q = 3, 2, 7, 5
    cams = rand(L, H, S, S, seed=20, positive=True)
    grads = rand(L, H, S, S, seed=21)
    R_ss = np.eye(S, dtype=np.float32)
    R_sq = np.zeros((S, Q), dtype=np.float32) + 0.1
    exp_ss, exp_sq = R_ss, R_sq
    for l in range(L):
        e_hat = np.maximum(grads[l] * cams[l], 0).mean(0)
        exp_ss, exp_sq = e_hat @ exp_ss, e_hat @ exp_sq
    got_ss, got_sq = rl.self_attention_relevancy_update(
        jnp.asarray(R_ss), jnp.asarray(R_sq),
        jnp.asarray(cams), jnp.asarray(grads), aggregate=False,
    )
    np.testing.assert_allclose(np.asarray(got_ss), exp_ss, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sq), exp_sq, atol=1e-5)


def test_grad_cam():
    H, S = 4, 9
    cam = rand(H, S, S, seed=22, positive=True)
    grad = rand(H, S, S, seed=23)
    w = grad.reshape(H, -1).mean(1)[:, None, None]
    want = np.maximum((cam * w).mean(0), 0)
    got = np.asarray(rl.grad_cam(jnp.asarray(cam), jnp.asarray(grad)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_handle_residual_valid_mask_matches_embedded_block():
    """Padding-aware eq. 8+9: valid rows normalise exactly like the
    unpadded computation; padded rows stay identity (inert) instead of
    the 0/0 NaN that would poison downstream rule-10 matmuls."""
    S, S_pad = 5, 9
    R = rand(S, S, seed=30, positive=True) + np.eye(S, dtype=np.float32)
    want = np.asarray(rl.handle_residual(jnp.asarray(R)))
    # embed into a padded matrix: padded rows/cols are identity/zero,
    # exactly what the aggregated chain produces for padded positions
    R_pad = np.eye(S_pad, dtype=np.float32)
    R_pad[:S, :S] = R
    valid = (np.arange(S_pad) < S).astype(np.float32)
    got = np.asarray(
        rl.handle_residual(jnp.asarray(R_pad), jnp.asarray(valid)))
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got[:S, :S], want, atol=1e-6)
    np.testing.assert_allclose(got[S:], np.eye(S_pad)[S:], atol=0)
    np.testing.assert_allclose(got[:S, S:], 0.0, atol=0)


def test_handle_residual_valid_mask_keeps_reference_nan():
    """A VALID row with zero off-diagonal mass must still divide 0/0
    (reference semantics: the NaN→0 guard then wipes the addition)."""
    S = 4
    R = np.eye(S, dtype=np.float32)
    R[1, :] += [0.0, 0.0, 0.3, 0.7]          # row 1 has mass, row 0 none
    valid = np.ones(S, np.float32)
    got = np.asarray(rl.handle_residual(jnp.asarray(R), jnp.asarray(valid)))
    assert np.isnan(got[0]).all()            # identity valid row → NaN
    assert not np.isnan(got[1]).any()


def test_apply_mm_attention_rules_valid_masks():
    """Rule 10 on padded matrices + masks == rule 10 on the unpadded
    block (padded Ê columns are exact zeros, like a masked softmax)."""
    S, Q, S_pad, Q_pad = 4, 3, 7, 5
    R_ss = rand(S, S, seed=31, positive=True) + np.eye(S, dtype=np.float32)
    R_qq = rand(Q, Q, seed=32, positive=True) + np.eye(Q, dtype=np.float32)
    cam = rand(S, Q, seed=33, positive=True)
    want, _ = rl.apply_mm_attention_rules(
        jnp.asarray(R_ss), jnp.asarray(R_qq), jnp.asarray(cam))
    Rs = np.eye(S_pad, dtype=np.float32); Rs[:S, :S] = R_ss
    Rq = np.eye(Q_pad, dtype=np.float32); Rq[:Q, :Q] = R_qq
    c = np.zeros((S_pad, Q_pad), np.float32); c[:S, :Q] = cam
    sv = (np.arange(S_pad) < S).astype(np.float32)
    qv = (np.arange(Q_pad) < Q).astype(np.float32)
    got, _ = rl.apply_mm_attention_rules(
        jnp.asarray(Rs), jnp.asarray(Rq), jnp.asarray(c),
        s_valid=jnp.asarray(sv), q_valid=jnp.asarray(qv))
    got = np.asarray(got)
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got[:S, :Q], np.asarray(want), atol=1e-6)
    pad_mass = np.abs(got).sum() - np.abs(got[:S, :Q]).sum()
    assert pad_mass == 0.0
