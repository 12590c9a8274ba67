"""Layer-granular fused attention-block kernels (Pallas/TPU).

Why these exist: the relevancy hot path (models/vit.relevancy_fused)
is HBM-bound, not MXU-bound. Every ``pallas_call`` boundary is a fusion
barrier, so the per-layer forward/backward round-trips large
intermediates through HBM that the math never needed materialised:
qkv ([B, S, 3D], recomputed AND written twice per layer across
fwd+bwd), the merged attention output, d_merged, and dqkv. At ViT-B/16
B=56 fp32 that is ~0.9 GB of avoidable traffic per layer per batch —
more than the model's entire "useful" traffic, and exactly the gap the
round-4 roofline showed between fp32 (74.8% MXU-model fraction) and
the 1,000 maps/s/chip north star.

These kernels move the WHOLE attention residual branch of a block into
one program per image:

  * ``attn_block_fwd``:  x → x + proj(attn(LN1(x)))          (x_mid)
  * ``attn_block_bwd``:  (x, cot_mid, r) → (cot_x, r-fold e_row)

so per layer the only HBM traffic is one [S, D] read (x, which the
relevancy tape needs anyway), one [S, D] read of the cotangent, and
one [S, D] write — LN statistics, qkv, all 12 heads' probability
matrices, their gradients, and the rule-6 fold ``e_row = r·Ê`` live
entirely in VMEM. No weight gradients are needed (explanation
generators only propagate input cotangents), which is what makes the
full fusion fit the ~16 MB VMEM budget: weights ride as grid-constant
blocks (fetched once per layer, bf16 on chip) and activations stay
[S, D]-sized.

Matmul precision matches ops/flash_attention.py: ``fast_dots=True``
casts dot operands to bf16 with fp32 accumulation — the same
arithmetic XLA's default f32 matmul lowering uses on TPU — while
softmax, LayerNorm statistics/VJP, and the relevancy fold stay fp32.
``fast_dots=False`` keeps full-f32 dots for interpret-mode parity
tests (== the XLA autodiff chain at 1e-5).

Reference semantics: one transformer block of the timm-style ViT the
upstream notebook instruments (Transformer-MM-Explainability
baselines.ViT.ViT_new attention + hooks); the e_row fold is rule 6 of
the paper, ``r ← r + r·mean_h relu(A ∘ ∂L/∂A)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cast(x, fast: bool):
    return x.astype(jnp.bfloat16) if fast else x


def _dot(a, b, fast: bool, dims=((1,), (0,))):
    return jax.lax.dot_general(_cast(a, fast), _cast(b, fast),
                               (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _ln_fwd(x, scale, bias, eps):
    """LayerNorm forward keeping (x̂, 1/σ) for the in-kernel VJP."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = (x - mu) * inv
    return xh * scale + bias, xh, inv


def _ln_vjp(dy, scale, xh, inv):
    """dx for y = x̂·γ + β (γ/β grads not needed)."""
    g = dy * scale
    gm = jnp.mean(g, axis=-1, keepdims=True)
    gx = jnp.mean(g * xh, axis=-1, keepdims=True)
    return inv * (g - gm - xh * gx)


def _fwd_kernel(x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
                g1_ref, b1_ref, xmid_ref, *, nheads: int, eps: float,
                fast: bool):
    D = x_ref.shape[-1]
    dh = D // nheads
    scale = 1.0 / (dh ** 0.5)
    x = x_ref[0].astype(jnp.float32)                     # [S, D]
    h1, _, _ = _ln_fwd(x, g1_ref[0].astype(jnp.float32),
                       b1_ref[0].astype(jnp.float32), eps)
    qkv = _dot(h1, wqkv_ref[...], fast) + bqkv_ref[0]    # [S, 3D] f32
    outs = []
    for h in range(nheads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, D + h * dh:D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh:2 * D + (h + 1) * dh]
        s = _dot(q, k, fast, ((1,), (1,))) * scale       # [S, S]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(_dot(a, v, fast))
    merged = jnp.concatenate(outs, axis=-1)              # [S, D]
    xmid = x + _dot(merged, wout_ref[...], fast) + bout_ref[0]
    xmid_ref[0] = xmid.astype(xmid_ref.dtype)


def _bwd_kernel(x_ref, cot_ref, r_ref, wqkv_ref, bqkv_ref, wout_ref,
                g1_ref, b1_ref, cotin_ref, e_ref, *, nheads: int,
                eps: float, fast: bool):
    D = x_ref.shape[-1]
    dh = D // nheads
    scale = 1.0 / (dh ** 0.5)
    x = x_ref[0].astype(jnp.float32)
    cot = cot_ref[0].astype(jnp.float32)                 # d x_mid
    r = r_ref[0, 0].astype(jnp.float32)                  # [S]
    g1 = g1_ref[0].astype(jnp.float32)
    h1, xh, inv = _ln_fwd(x, g1, b1_ref[0].astype(jnp.float32), eps)
    qkv = _dot(h1, wqkv_ref[...], fast) + bqkv_ref[0]
    # d merged-attention-out = cot · w_outᵀ (transpose-free contraction)
    dm = _dot(cot, wout_ref[...], fast, ((1,), (1,)))    # [S, D]
    ead = jnp.zeros((x.shape[0], x.shape[0]), jnp.float32)
    dq_o, dk_o, dv_o = [], [], []
    for h in range(nheads):
        q = qkv[:, h * dh:(h + 1) * dh]
        k = qkv[:, D + h * dh:D + (h + 1) * dh]
        v = qkv[:, 2 * D + h * dh:2 * D + (h + 1) * dh]
        do = dm[:, h * dh:(h + 1) * dh]
        s = _dot(q, k, fast, ((1,), (1,))) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)       # [S, S]
        da = _dot(do, v, fast, ((1,), (1,)))             # ∇A
        p = a * da
        ead = ead + jnp.maximum(p, 0.0)                  # Σ_h relu(A∘dA)
        dsum = jnp.sum(p, axis=-1, keepdims=True)
        ds = a * (da - dsum) * scale
        dq_o.append(_dot(ds, k, fast))
        dk_o.append(_dot(ds, q, fast, ((0,), (0,))))
        dv_o.append(_dot(a, do, fast, ((0,), (0,))))
    dqkv = jnp.concatenate(dq_o + dk_o + dv_o, axis=-1)  # [S, 3D]
    dh1 = _dot(dqkv, wqkv_ref[...], fast, ((1,), (1,)))  # [S, D]
    dx = _ln_vjp(dh1, g1, xh, inv)
    cotin_ref[0] = (cot + dx).astype(cotin_ref.dtype)
    # rule-6 fold increment: e_row = r · Ê, Ê = ead / H
    e_ref[0, 0] = (jnp.sum(ead * r[:, None], axis=0)
                   * (1.0 / nheads)).astype(e_ref.dtype)


def _erf(x, exact: bool):
    """erf for the MLP kernels. Mosaic TPU has no erf primitive
    (NotImplementedError: 'Unimplemented primitive in Pallas TPU
    lowering for KernelType.TC: erf', observed on v5e), so the compiled
    path (exact=False) uses the Abramowitz–Stegun 7.1.26 rational
    approximation — |error| < 1.5e-7, i.e. fp32-exact in effect —
    while interpret/parity mode keeps the exact primitive (the same
    compiled-vs-interpret split ``fast_dots`` already makes)."""
    if exact:
        return jax.lax.erf(x)
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    sgn = jnp.where(x >= 0.0, 1.0, -1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sgn * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_grad(x, exact: bool):
    """d/dx of the exact (erf-based) GELU, matching ops.attention.gelu
    (= torch.nn.GELU default): Φ(x) + x·φ(x)."""
    phi_c = 0.5 * (1.0 + _erf(x * (2.0 ** -0.5), exact))
    pdf = jnp.exp(-0.5 * x * x) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    return phi_c + x * pdf


def _mlp_fwd_kernel(xmid_ref, w1_ref, b1_ref, w2_ref, b2m_ref,
                    g2_ref, b2_ref, xout_ref, *, eps: float,
                    fast: bool, chunks: int):
    """x_out = x_mid + gelu(LN2(x_mid)·w1+b1)·w2 + b2 in one program:
    the [S, I] pre-GELU activations exist only as [S, I/chunks] tiles
    in VMEM, never in HBM."""
    I = w1_ref.shape[1]
    cw = I // chunks
    xm = xmid_ref[0].astype(jnp.float32)
    g2 = g2_ref[0].astype(jnp.float32)
    mu = jnp.mean(xm, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xm - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    h2 = (xm - mu) * inv * g2 + b2_ref[0]
    acc = xm + b2m_ref[0]
    for c in range(chunks):
        w1c = w1_ref[:, c * cw:(c + 1) * cw]
        a1c = _dot(h2, w1c, fast) + b1_ref[0, c * cw:(c + 1) * cw]
        g = 0.5 * a1c * (1.0 + _erf(a1c * (2.0 ** -0.5), not fast))
        acc = acc + _dot(g, w2_ref[c * cw:(c + 1) * cw, :], fast)
    xout_ref[0] = acc.astype(xout_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "chunks",
                                             "interpret", "fast_dots"))
def mlp_block_fwd(x_mid: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                  w2: jnp.ndarray, b2: jnp.ndarray,
                  ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                  eps: float = 1e-6, chunks: int = 8,
                  interpret: bool = False,
                  fast_dots: bool = True) -> jnp.ndarray:
    """Forward of the MLP residual branch in ONE kernel per image
    (exact erf GELU, chunked hidden dim — see ``mlp_block_bwd``)."""
    B, S, D = x_mid.shape
    fast = fast_dots and not interpret
    blk = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0))
    I = w1.shape[1]
    assert I % chunks == 0, (
        f"hidden dim {I} not divisible by chunks={chunks}: the chunk "
        "loop would silently drop the tail columns")
    c = lambda b: (0, 0)
    return pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, eps=eps, fast=fast,
                          chunks=chunks),
        out_shape=jax.ShapeDtypeStruct((B, S, D), x_mid.dtype),
        grid=(B,),
        in_specs=[blk,
                  pl.BlockSpec((D, I), c), pl.BlockSpec((1, I), c),
                  pl.BlockSpec((I, D), c), pl.BlockSpec((1, D), c),
                  pl.BlockSpec((1, D), c), pl.BlockSpec((1, D), c)],
        out_specs=blk,
        interpret=interpret,
    )(x_mid, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
      ln_scale.reshape(1, -1), ln_bias.reshape(1, -1))


def _mlp_bwd_kernel(xmid_ref, cot_ref, w1_ref, b1_ref, w2_ref,
                    g2_ref, b2_ref, cotmid_ref, *, eps: float,
                    fast: bool, chunks: int):
    """cot_mid for x_out = x_mid + gelu(LN2(x_mid)·w1+b1)·w2 + b2,
    recomputing a1 from x_mid in VMEM (the a1 tape disappears).

    The hidden dim is processed in ``chunks`` static slices of the
    grid-constant weight blocks so the [S, I] activations never exist
    whole — peak VMEM stays ~weights + a few [S, I/chunks] tiles."""
    S = xmid_ref.shape[1]
    I = w1_ref.shape[1]
    cw = I // chunks
    xm = xmid_ref[0].astype(jnp.float32)
    cot = cot_ref[0].astype(jnp.float32)                 # d x_out
    g2 = g2_ref[0].astype(jnp.float32)
    mu = jnp.mean(xm, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xm - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xh = (xm - mu) * inv
    h2 = xh * g2 + b2_ref[0]
    dh2 = jnp.zeros((S, xm.shape[1]), jnp.float32)
    for c in range(chunks):
        w1c = w1_ref[:, c * cw:(c + 1) * cw]
        a1c = _dot(h2, w1c, fast) + b1_ref[0, c * cw:(c + 1) * cw]
        dgc = _dot(cot, w2_ref[c * cw:(c + 1) * cw, :], fast,
                   ((1,), (1,)))
        dac = _gelu_grad(a1c, not fast) * dgc
        dh2 = dh2 + _dot(dac, w1c, fast, ((1,), (1,)))
    dxm = _ln_vjp(dh2, g2, xh, inv)
    cotmid_ref[0] = (cot + dxm).astype(cotmid_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "chunks",
                                             "interpret", "fast_dots"))
def mlp_block_bwd(x_mid: jnp.ndarray, cot_out: jnp.ndarray,
                  w1: jnp.ndarray, b1: jnp.ndarray, w2: jnp.ndarray,
                  ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                  eps: float = 1e-6, chunks: int = 8,
                  interpret: bool = False,
                  fast_dots: bool = True) -> jnp.ndarray:
    """Backward of the MLP residual branch in ONE kernel per image,
    recomputing pre-GELU activations from x_mid (no a1 tape).

    x_mid, cot_out: [B, S, D]. Returns cot_mid [B, S, D] including the
    residual skip. The recomputed a1 uses the same bf16-operand/f32-
    accumulate dot arithmetic as the XLA forward, so the GELU
    derivative sees the forward's activations to fp32 noise."""
    B, S, D = x_mid.shape
    fast = fast_dots and not interpret
    blk = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0))
    I = w1.shape[1]
    assert I % chunks == 0, (
        f"hidden dim {I} not divisible by chunks={chunks}: the chunk "
        "loop would silently drop the tail columns")
    c = lambda b: (0, 0)
    return pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, eps=eps, fast=fast,
                          chunks=chunks),
        out_shape=jax.ShapeDtypeStruct((B, S, D), x_mid.dtype),
        grid=(B,),
        in_specs=[blk, blk,
                  pl.BlockSpec((D, I), c), pl.BlockSpec((1, I), c),
                  pl.BlockSpec((I, D), c),
                  pl.BlockSpec((1, D), c), pl.BlockSpec((1, D), c)],
        out_specs=blk,
        interpret=interpret,
    )(x_mid, cot_out, w1, b1.reshape(1, -1), w2,
      ln_scale.reshape(1, -1), ln_bias.reshape(1, -1))


def _wspecs(D: int):
    """Grid-constant weight/bias blocks: index maps ignore the batch
    grid axis, so Mosaic fetches each exactly once per pallas_call
    (= once per layer), not once per image."""
    c = lambda b: (0, 0)
    return [
        pl.BlockSpec((D, 3 * D), c),   # w_qkv
        pl.BlockSpec((1, 3 * D), c),   # b_qkv
        pl.BlockSpec((D, D), c),       # w_out
        pl.BlockSpec((1, D), c),       # b_out (fwd only)
        pl.BlockSpec((1, D), c),       # ln γ
        pl.BlockSpec((1, D), c),       # ln β
    ]


@functools.partial(jax.jit, static_argnames=("nheads", "eps",
                                             "interpret", "fast_dots"))
def attn_block_fwd(x: jnp.ndarray, w_qkv: jnp.ndarray, b_qkv: jnp.ndarray,
                   w_out: jnp.ndarray, b_out: jnp.ndarray,
                   ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                   nheads: int, eps: float = 1e-6,
                   interpret: bool = False,
                   fast_dots: bool = True) -> jnp.ndarray:
    """x [B, S, D] → x + proj(attention(LN(x))) in ONE kernel.

    Weights may be pre-cast to bf16 by the caller (the kernel casts dot
    operands itself under ``fast_dots``, so f32 and bf16 weights give
    identical arithmetic; bf16 halves their VMEM/HBM footprint)."""
    B, S, D = x.shape
    fast = fast_dots and not interpret
    blk = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, nheads=nheads, eps=eps, fast=fast),
        out_shape=jax.ShapeDtypeStruct((B, S, D), x.dtype),
        grid=(B,),
        in_specs=[blk] + _wspecs(D),
        out_specs=blk,
        interpret=interpret,
    )(x, w_qkv, b_qkv.reshape(1, -1), w_out, b_out.reshape(1, -1),
      ln_scale.reshape(1, -1), ln_bias.reshape(1, -1))


@functools.partial(jax.jit, static_argnames=("nheads", "eps",
                                             "interpret", "fast_dots"))
def attn_block_bwd(
    x: jnp.ndarray, cot_mid: jnp.ndarray, r: jnp.ndarray,
    w_qkv: jnp.ndarray, b_qkv: jnp.ndarray, w_out: jnp.ndarray,
    ln_scale: jnp.ndarray, ln_bias: jnp.ndarray, nheads: int,
    eps: float = 1e-6, interpret: bool = False,
    fast_dots: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward of ``attn_block_fwd`` fused with the relevancy fold.

    x, cot_mid: [B, S, D]; r: [B, S] (current rollout row). Returns
    (cot_x [B, S, D], e_row [B, S]) — the full input cotangent
    (including the residual skip) and the rule-6 increment, with
    everything between the block boundaries recomputed in VMEM."""
    B, S, D = x.shape
    fast = fast_dots and not interpret
    blk = pl.BlockSpec((1, S, D), lambda b: (b, 0, 0))
    rblk = pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0))
    wspecs = _wspecs(D)
    del wspecs[3]  # b_out: no cotangent flows through a bias add
    cot_x, e_row = pl.pallas_call(
        functools.partial(_bwd_kernel, nheads=nheads, eps=eps, fast=fast),
        out_shape=(jax.ShapeDtypeStruct((B, S, D), x.dtype),
                   jax.ShapeDtypeStruct((B, 1, S), jnp.float32)),
        grid=(B,),
        in_specs=[blk, blk, rblk] + wspecs,
        out_specs=(blk, rblk),
        interpret=interpret,
    )(x, cot_mid, r[:, None, :], w_qkv, b_qkv.reshape(1, -1), w_out,
      ln_scale.reshape(1, -1), ln_bias.reshape(1, -1))
    return cot_x, e_row[:, 0]
