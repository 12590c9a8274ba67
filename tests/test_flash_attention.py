"""Fused Pallas attention kernels (interpret mode on CPU, full-f32
dots): exact parity vs the XLA attention math and its autodiff."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.ops import flash_attention as fa


def xla_attn(q, k, v):
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(dh)
    a = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bhkd->bhqd", a, v,
                      preferred_element_type=jnp.float32), a


def rand(shape, seed=0, scale=0.5):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
        * scale)


@pytest.mark.parametrize("B,H,S,Dh", [(2, 4, 17, 16), (1, 2, 64, 32),
                                      (3, 2, 197, 8)])
def test_flash_fwd_matches_xla(B, H, S, Dh):
    q, k, v = (rand((B, H, S, Dh), seed=i) for i in range(3))
    want, _ = xla_attn(q, k, v)
    got = fa.flash_fwd(q, k, v, interpret=True, fast_dots=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B,H,S,Dh", [(2, 4, 17, 16), (1, 2, 33, 8)])
def test_flash_bwd_ehat_matches_autodiff(B, H, S, Dh):
    q, k, v = (rand((B, H, S, Dh), seed=i) for i in range(3))
    dout = rand((B, H, S, Dh), seed=7)
    r = jnp.abs(rand((B, S), seed=9))

    def out_fn(q, k, v):
        return xla_attn(q, k, v)[0]

    _, vjp = jax.vjp(out_fn, q, k, v)
    want_dq, want_dk, want_dv = vjp(dout)
    # e_row reference: r · mean_h relu(A ∘ dA)
    _, a = xla_attn(q, k, v)
    da = jnp.einsum("bhqd,bhkd->bhqk", dout, v)
    e = jnp.maximum(a * da, 0.0).mean(axis=1)
    want_e = jnp.einsum("bq,bqk->bk", r, e)

    dq, dk, dv, e_row = fa.flash_bwd_ehat(q, k, v, dout, r,
                                          interpret=True, fast_dots=False)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(want_dq),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(want_dk),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(want_dv),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(e_row), np.asarray(want_e),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B,H,S,D", [(2, 4, 17, 64), (1, 6, 49, 96)])
def test_qkv_layout_kernels_match_split_kernels(B, H, S, D):
    """The transpose-free [B, S, 3D] variants == the per-head variants
    == XLA, including the head-grouping path (Dh < 128)."""
    rng = np.random.RandomState(0)
    qkv = jnp.asarray(rng.randn(B, S, 3 * D).astype(np.float32) * 0.3)
    dmerged = jnp.asarray(rng.randn(B, S, D).astype(np.float32) * 0.3)
    r = jnp.asarray(rng.rand(B, S).astype(np.float32))
    Dh = D // H

    def split_heads(x):
        return x.reshape(B, S, H, Dh).transpose(0, 2, 1, 3)

    q, k, v = (split_heads(t) for t in jnp.split(qkv, 3, axis=-1))
    want_out, _ = xla_attn(q, k, v)
    got_out = fa.flash_fwd_qkv(qkv, H, interpret=True, fast_dots=False)
    np.testing.assert_allclose(
        np.asarray(got_out),
        np.asarray(want_out.transpose(0, 2, 1, 3).reshape(B, S, D)),
        rtol=1e-5, atol=1e-6)

    dout = split_heads(dmerged)
    want_dq, want_dk, want_dv, want_e = fa.flash_bwd_ehat(
        q, k, v, dout, r, interpret=True, fast_dots=False)
    got_dqkv, got_e = fa.flash_bwd_ehat_qkv(qkv, dmerged, r, H,
                                            interpret=True,
                                            fast_dots=False)
    merge = lambda x: x.transpose(0, 2, 1, 3).reshape(B, S, D)
    want_dqkv = jnp.concatenate(
        [merge(want_dq), merge(want_dk), merge(want_dv)], axis=-1)
    np.testing.assert_allclose(np.asarray(got_dqkv),
                               np.asarray(want_dqkv),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("B,H,S,D", [(2, 4, 17, 64), (1, 6, 49, 96),
                                     (2, 12, 197, 768)])
def test_attn_block_kernels_match_xla_block(B, H, S, D):
    """The layer-granular kernels (LN1 → qkv → attention → proj →
    residual, and their fused backward+Ê-fold) == the XLA composition
    and its autodiff, including the in-kernel LayerNorm VJP."""
    from transformer_mm_explainability_tpu.ops import attn_block_pallas as ab

    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    # weights at 1/√D keep attention logits O(1): saturated softmax
    # would amplify benign reduction-order noise into the comparison
    w = lambda *s: jnp.asarray(
        rng.randn(*s).astype(np.float32) / np.sqrt(D))
    x = f(B, S, D)
    wqkv, bqkv = w(D, 3 * D), 0.1 * f(3 * D)
    wout, bout = w(D, D), 0.1 * f(D)
    g1, b1 = 1.0 + 0.1 * f(D), 0.1 * f(D)
    cot = f(B, S, D)
    r = jnp.asarray(rng.rand(B, S).astype(np.float32))
    eps = 1e-6
    dh = D // H

    def xla_block(x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        xh = (xf - mu) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps)
        h1 = xh * g1 + b1
        qkv = h1 @ wqkv + bqkv
        q, k, v = (t.reshape(B, S, H, dh).transpose(0, 2, 1, 3)
                   for t in jnp.split(qkv, 3, -1))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
        a = jax.nn.softmax(s, -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        merged = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return x + merged @ wout + bout, a

    want_mid, a_probs = xla_block(x)
    got_mid = ab.attn_block_fwd(x, wqkv, bqkv, wout, bout, g1, b1, H,
                                eps, interpret=True, fast_dots=False)
    # different f32 reduction orders (per-head 2D dots vs einsum): a
    # few-ulp spread on O(10) magnitudes is expected even in interpret
    np.testing.assert_allclose(np.asarray(got_mid), np.asarray(want_mid),
                               rtol=5e-4, atol=1e-4)

    # backward: input cotangent AND the Ê fold against autodiff
    def block_with_tap(x, tap):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        xh = (xf - mu) * jax.lax.rsqrt(xf.var(-1, keepdims=True) + eps)
        h1 = xh * g1 + b1
        qkv = h1 @ wqkv + bqkv
        q, k, v = (t.reshape(B, S, H, dh).transpose(0, 2, 1, 3)
                   for t in jnp.split(qkv, 3, -1))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(dh)
        a = jax.nn.softmax(s, -1) + tap
        out = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        merged = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        return x + merged @ wout + bout

    zero_tap = jnp.zeros((B, H, S, S), jnp.float32)
    _, vjp = jax.vjp(block_with_tap, x, zero_tap)
    want_cot, grad_a = vjp(cot)
    e_hat = jnp.maximum(a_probs * grad_a, 0.0).mean(axis=1)
    want_e = jnp.einsum("bq,bqk->bk", r, e_hat)

    got_cot, got_e = ab.attn_block_bwd(x, cot, r, wqkv, bqkv, wout,
                                       g1, b1, H, eps, interpret=True,
                                       fast_dots=False)
    np.testing.assert_allclose(np.asarray(got_cot), np.asarray(want_cot),
                               rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               rtol=5e-4, atol=1e-4)


@pytest.mark.parametrize("B,S,D,I,chunks", [(2, 17, 64, 256, 4),
                                            (1, 197, 768, 3072, 8)])
def test_mlp_block_bwd_matches_autodiff(B, S, D, I, chunks):
    """The fused MLP backward (a1 recomputed in VMEM, chunked hidden
    dim) == jax.vjp of the XLA MLP residual branch."""
    from transformer_mm_explainability_tpu.ops import attn_block_pallas as ab
    from transformer_mm_explainability_tpu.ops.attention import (
        gelu, layer_norm)

    rng = np.random.RandomState(0)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    w = lambda *s: jnp.asarray(
        rng.randn(*s).astype(np.float32) / np.sqrt(D))
    x_mid, cot = f(B, S, D), f(B, S, D)
    w1, b1 = w(D, I), 0.1 * f(I)
    w2, b2 = w(I, D), 0.1 * f(D)
    g2, bb2 = 1.0 + 0.1 * f(D), 0.1 * f(D)
    eps = 1e-6

    def branch(xm):
        h2 = layer_norm(xm, g2, bb2, eps)
        return xm + gelu(h2 @ w1 + b1) @ w2 + b2

    _, vjp = jax.vjp(branch, x_mid)
    (want,) = vjp(cot)
    got = ab.mlp_block_bwd(x_mid, cot, w1, b1, w2, g2, bb2, eps,
                           chunks=chunks, interpret=True,
                           fast_dots=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=1e-4)

    want_fwd = branch(x_mid)
    got_fwd = ab.mlp_block_fwd(x_mid, w1, b1, w2, b2, g2, bb2, eps,
                               chunks=chunks, interpret=True,
                               fast_dots=False)
    np.testing.assert_allclose(np.asarray(got_fwd), np.asarray(want_fwd),
                               rtol=5e-4, atol=1e-4)


def test_relevancy_fused_block2_matches_reference_chain():
    """relevancy_fused_block2 (MLP bwd fused too, no a1 tape) ==
    relevancy_streamed_row == relevancy."""
    from transformer_mm_explainability_tpu.models import vit

    cfg = vit.ViTConfig(image_size=64, patch_size=16, width=64, depth=3,
                        num_heads=4, mlp_ratio=4, num_classes=10)
    p = vit.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    tg = jnp.asarray([1, 2, 3])
    row = np.asarray(vit.relevancy_streamed_row(p, im, tg, cfg))
    ref = np.asarray(vit.relevancy(p, im, tg, cfg))
    got = np.asarray(vit.relevancy_fused_block2(p, im, tg, cfg,
                                                interpret=True))
    np.testing.assert_allclose(got, row, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-5)


def test_rational_erf_accuracy():
    """The compiled-path erf approximation (Mosaic TPU has no erf
    primitive) stays far inside the 1e-4 parity bar."""
    from transformer_mm_explainability_tpu.ops.attn_block_pallas import _erf

    x = jnp.asarray(np.linspace(-12, 12, 100001, dtype=np.float32))
    err = np.abs(np.asarray(_erf(x, False))
                 - np.asarray(jax.lax.erf(x))).max()
    assert err < 5e-6, err
    # saturation exactness far in the tails
    np.testing.assert_allclose(
        np.asarray(_erf(jnp.asarray([-30.0, 30.0]), False)), [-1.0, 1.0],
        atol=1e-7)


def test_block_kernels_bf16_inputs():
    """bf16 activations through the block kernels (the bench's
    throughput mode): fp32 math inside, outputs in bf16, matching the
    fp32 run to bf16 rounding."""
    from transformer_mm_explainability_tpu.ops import attn_block_pallas as ab

    B, H, S, D = 2, 4, 33, 64
    rng = np.random.RandomState(3)
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    w = lambda *s: jnp.asarray(
        rng.randn(*s).astype(np.float32) / np.sqrt(D))
    x = f(B, S, D)
    wqkv, bqkv, wout, bout = w(D, 3 * D), 0.1 * f(3 * D), w(D, D), 0.1 * f(D)
    g1, b1 = 1.0 + 0.1 * f(D), 0.1 * f(D)
    ref = np.asarray(ab.attn_block_fwd(x, wqkv, bqkv, wout, bout, g1, b1,
                                       H, 1e-6, interpret=True,
                                       fast_dots=False))
    got = np.asarray(ab.attn_block_fwd(
        x.astype(jnp.bfloat16), wqkv, bqkv, wout, bout, g1, b1,
        H, 1e-6, interpret=True, fast_dots=False))
    assert got.dtype == np.dtype("bfloat16") or got.dtype.name == "bfloat16"
    np.testing.assert_allclose(got.astype(np.float32), ref,
                               rtol=2e-2, atol=2e-2)


def test_relevancy_fused_block_matches_reference_chain():
    """relevancy_fused_block == relevancy_streamed_row == relevancy."""
    from transformer_mm_explainability_tpu.models import vit

    cfg = vit.ViTConfig(image_size=64, patch_size=16, width=64, depth=3,
                        num_heads=4, mlp_ratio=4, num_classes=10)
    p = vit.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    tg = jnp.asarray([1, 2, 3])
    row = np.asarray(vit.relevancy_streamed_row(p, im, tg, cfg))
    ref = np.asarray(vit.relevancy(p, im, tg, cfg))
    got = np.asarray(vit.relevancy_fused_block(p, im, tg, cfg,
                                               interpret=True))
    np.testing.assert_allclose(got, row, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-5)


def test_relevancy_fused_matches_reference_chain():
    """relevancy_fused == the parity-tested relevancy (to fp32
    recompute noise) and == relevancy_streamed_row (same structure)."""
    from transformer_mm_explainability_tpu.models import vit

    cfg = vit.ViTConfig(image_size=64, patch_size=16, width=64, depth=3,
                        num_heads=4, mlp_ratio=4, num_classes=10)
    p = vit.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    im = jnp.asarray(rng.randn(3, 64, 64, 3).astype(np.float32))
    tg = jnp.asarray([1, 2, 3])
    ref = np.asarray(vit.relevancy(p, im, tg, cfg))
    row = np.asarray(vit.relevancy_streamed_row(p, im, tg, cfg))
    got = np.asarray(vit.relevancy_fused(p, im, tg, cfg, interpret=True))
    np.testing.assert_allclose(got, row, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-5)
