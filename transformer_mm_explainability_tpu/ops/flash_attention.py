"""Fused attention kernels for the relevancy pipeline (Pallas/TPU).

The relevancy hot loop needs, per layer, the attention output (forward)
and — in the backward — dQ/dK/dV **plus** the rollout-row fold
``r ← r + r·Ê`` with ``Ê = mean_h relu(A ∘ ∂L/∂A)``. The XLA tap
formulation materialises A and ∇A ([B, H, S, S] each, fp32) in HBM per
layer just to multiply them once; these kernels keep both entirely in
VMEM:

  * ``flash_fwd``: out = softmax(qkᵀ/√d)·v per (batch, head) program —
    the probability matrix never leaves VMEM;
  * ``flash_bwd_ehat``: recomputes A from (q, k) in-register, forms
    dA = dOut·vᵀ, emits the standard softmax/attention cotangents
    (dq, dk, dv) AND accumulates e_row[b] += r[b]·relu(A∘dA)/H across
    the head grid axis — the full Ê·r fold costs one extra [1,S]×[S,S]
    dot per head and zero HBM traffic.

No HBM-level padding: each program consumes the full [S, Dh] tile of
its (batch, head) — block dims equal to array dims are exempt from the
8×128 alignment rule, and Mosaic pads registers internally for free.

Matmul precision: ``fast_dots=True`` casts dot operands to bf16 with
fp32 accumulation — the SAME arithmetic XLA's default f32 matmul
lowering uses on TPU, so outputs match the unfused chip path.
``fast_dots=False`` keeps full f32 dots (used under ``interpret=True``
on CPU, where the parity tests compare against the pure-XLA pipeline
at 1e-5).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _dot(a, b, fast: bool):
    if fast:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_tt(a, b, fast: bool, dims):
    """dot_general without explicit in-kernel transposes (Mosaic feeds
    the MXU directly from the chosen contraction dims)."""
    if fast:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _pad_len(s: int) -> int:
    return -(-s // 128) * 128


def _heads_per_program(nheads: int, dh: int, interpret: bool) -> int:
    """Lane-dim dynamic slices must be 128-aligned on TPU, so heads are
    grouped into ≥128-lane spans per program."""
    if dh % 128 == 0:
        return 1
    hpp = max(1, min(nheads, 128 // max(dh, 1)))
    while nheads % hpp:
        hpp += 1
    if not interpret:
        assert (dh * hpp) % 128 == 0 or dh * nheads == dh * hpp, (
            f"head dim {dh} with {nheads} heads is not groupable into "
            "128-lane spans; pad the model width")
    return hpp


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                fast: bool):
    q = q_ref[0, 0].astype(jnp.float32)          # [S, Dh]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = _dot(q, k.T, fast) * scale               # [S, S] f32
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0, 0] = _dot(a, v, fast).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, r_ref,
                dq_ref, dk_ref, dv_ref, e_ref, *, scale: float,
                nheads: int, fast: bool):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = _dot_tt(q, k, fast, ((1,), (1,)))    # q·kᵀ
    s = s * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    a = e / jnp.sum(e, axis=-1, keepdims=True)   # [S, S]

    da = _dot_tt(do, v, fast, ((1,), (1,)))  # ∇A = dOut·vᵀ
    # Ê·r fold as a VPU row-reduce (an M=1 MXU dot wastes 7/8 sublanes):
    # e_row = Σ_i r_i · relu(A∘dA)[i, :] / H, one slice per head
    ead = jnp.maximum(a * da, 0.0)
    r = r_ref[0, 0].astype(jnp.float32)          # [S]
    e_ref[0, 0, 0, :] = (jnp.sum(ead * r[:, None], axis=0)
                         * (1.0 / nheads))

    # softmax + attention backward (all contractions transpose-free)
    dsum = jnp.sum(da * a, axis=-1, keepdims=True)
    ds = a * (da - dsum) * scale                 # [S, S]
    dq_ref[0, 0] = _dot(ds, k, fast).astype(dq_ref.dtype)
    dk_ref[0, 0] = _dot_tt(ds, q, fast,
                           ((0,), (0,))).astype(dk_ref.dtype)
    dv_ref[0, 0] = _dot_tt(a, do, fast,
                           ((0,), (0,))).astype(dv_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "fast_dots"))
def flash_fwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              interpret: bool = False,
              fast_dots: bool = True) -> jnp.ndarray:
    """softmax(qkᵀ/√Dh)·v without materialising A. q/k/v [B, H, S, Dh]
    (any S; padded internally). Returns [B, H, S, Dh] in q's dtype."""
    B, H, S, Dh = q.shape
    blk = pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0))
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=1.0 / (Dh ** 0.5),
                          fast=fast_dots and not interpret),
        out_shape=jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
        grid=(B, H),
        in_specs=[blk, blk, blk],
        out_specs=blk,
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "fast_dots"))
def flash_bwd_ehat(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    dout: jnp.ndarray, r: jnp.ndarray,
    interpret: bool = False, fast_dots: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Attention backward fused with the relevancy-row fold.

    q/k/v/dout: [B, H, S, Dh]; r: [B, S] (the current rollout row).
    Returns (dq, dk, dv [B, H, S, Dh], e_row [B, S]) where
    ``e_row = r · mean_h relu(A_h ∘ dA_h)`` — i.e. the increment of the
    rule-5/6 fold ``r ← r + r·Ê`` for this layer.
    """
    B, H, S, Dh = q.shape
    # [B, 1, S]: the singleton keeps the block's 2nd-to-last dim equal
    # to the array dim (TPU block-shape constraint)
    rp = r[:, None, :]
    blk = pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0))
    rblk = pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0))
    eblk = pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h, 0, 0))
    dq, dk, dv, e_head = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=1.0 / (Dh ** 0.5),
                          nheads=H, fast=fast_dots and not interpret),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, 1, S), jnp.float32),
        ),
        grid=(B, H),
        in_specs=[blk, blk, blk, blk, rblk],
        out_specs=(blk, blk, blk, eblk),
        interpret=interpret,
    )(q, k, v, dout, rp)
    return (dq, dk, dv, e_head[:, :, 0].sum(axis=1))


# ---------------------------------------------------------------------------
# Layout-fused variants: consume the QKV projection output [B, S, 3D]
# directly (per-head columns sliced in VMEM), so the wrapper needs NO
# head split/merge transposes and no concat — at ViT-B scale those
# relayouts cost more HBM traffic than the attention math itself.
# ---------------------------------------------------------------------------

def _fwd_kernel2(qkv_ref, o_ref, *, nheads: int, hpp: int, scale: float,
                 fast: bool):
    """``hpp`` heads per program: lane (last-dim) dynamic slices must be
    128-aligned, so heads are processed in 128-wide groups and split by
    static register slicing inside."""
    g = pl.program_id(1)
    D = o_ref.shape[-1]
    Dh = D // nheads
    W = Dh * hpp
    qs = qkv_ref[0, :, pl.dslice(g * W, W)].astype(jnp.float32)
    ks = qkv_ref[0, :, pl.dslice(D + g * W, W)].astype(jnp.float32)
    vs = qkv_ref[0, :, pl.dslice(2 * D + g * W, W)].astype(jnp.float32)
    outs = []
    for i in range(hpp):
        q = qs[:, i * Dh:(i + 1) * Dh]
        k = ks[:, i * Dh:(i + 1) * Dh]
        v = vs[:, i * Dh:(i + 1) * Dh]
        s = _dot_tt(q, k, fast, ((1,), (1,))) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(_dot(a, v, fast))
    o_ref[0, :, pl.dslice(g * W, W)] = jnp.concatenate(
        outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel2(qkv_ref, do_ref, r_ref, dqkv_ref, e_ref, *,
                 nheads: int, hpp: int, scale: float, fast: bool):
    g = pl.program_id(1)
    D = do_ref.shape[-1]
    Dh = D // nheads
    W = Dh * hpp
    qs = qkv_ref[0, :, pl.dslice(g * W, W)].astype(jnp.float32)
    ks = qkv_ref[0, :, pl.dslice(D + g * W, W)].astype(jnp.float32)
    vs = qkv_ref[0, :, pl.dslice(2 * D + g * W, W)].astype(jnp.float32)
    dos = do_ref[0, :, pl.dslice(g * W, W)].astype(jnp.float32)
    r = r_ref[0, 0].astype(jnp.float32)
    dq_o, dk_o, dv_o = [], [], []
    e_acc = None
    for i in range(hpp):
        q = qs[:, i * Dh:(i + 1) * Dh]
        k = ks[:, i * Dh:(i + 1) * Dh]
        v = vs[:, i * Dh:(i + 1) * Dh]
        do = dos[:, i * Dh:(i + 1) * Dh]
        s = _dot_tt(q, k, fast, ((1,), (1,))) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        a = e / jnp.sum(e, axis=-1, keepdims=True)

        da = _dot_tt(do, v, fast, ((1,), (1,)))
        ead = jnp.maximum(a * da, 0.0)
        er = jnp.sum(ead * r[:, None], axis=0) * (1.0 / nheads)
        e_acc = er if e_acc is None else e_acc + er

        dsum = jnp.sum(da * a, axis=-1, keepdims=True)
        ds = a * (da - dsum) * scale
        dq_o.append(_dot(ds, k, fast))
        dk_o.append(_dot_tt(ds, q, fast, ((0,), (0,))))
        dv_o.append(_dot_tt(a, do, fast, ((0,), (0,))))
    e_ref[0, 0, 0, :] = e_acc
    dqkv_ref[0, :, pl.dslice(g * W, W)] = jnp.concatenate(
        dq_o, -1).astype(dqkv_ref.dtype)
    dqkv_ref[0, :, pl.dslice(D + g * W, W)] = jnp.concatenate(
        dk_o, -1).astype(dqkv_ref.dtype)
    dqkv_ref[0, :, pl.dslice(2 * D + g * W, W)] = jnp.concatenate(
        dv_o, -1).astype(dqkv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nheads", "interpret",
                                             "fast_dots"))
def flash_fwd_qkv(qkv: jnp.ndarray, nheads: int, interpret: bool = False,
                  fast_dots: bool = True) -> jnp.ndarray:
    """qkv [B, S, 3D] (fused projection output) → attention out
    [B, S, D] in merged-head layout. No transposes anywhere."""
    B, S, D3 = qkv.shape
    D = D3 // 3
    Dh = D // nheads
    hpp = _heads_per_program(nheads, Dh, interpret)
    return pl.pallas_call(
        functools.partial(_fwd_kernel2, nheads=nheads, hpp=hpp,
                          scale=1.0 / (Dh ** 0.5),
                          fast=fast_dots and not interpret),
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B, nheads // hpp),
        in_specs=[pl.BlockSpec((1, S, D3), lambda b, h: (b, 0, 0))],
        out_specs=pl.BlockSpec((1, S, D), lambda b, h: (b, 0, 0)),
        interpret=interpret,
    )(qkv)


@functools.partial(jax.jit, static_argnames=("nheads", "interpret",
                                             "fast_dots"))
def flash_bwd_ehat_qkv(
    qkv: jnp.ndarray, dout: jnp.ndarray, r: jnp.ndarray, nheads: int,
    interpret: bool = False, fast_dots: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backward of ``flash_fwd_qkv`` fused with the relevancy-row fold.
    qkv [B, S, 3D]; dout [B, S, D] (cotangent in merged layout);
    r [B, S]. Returns (dqkv [B, S, 3D], e_row [B, S])."""
    B, S, D3 = qkv.shape
    D = D3 // 3
    Dh = D // nheads
    hpp = _heads_per_program(nheads, Dh, interpret)
    dqkv, e_head = pl.pallas_call(
        functools.partial(_bwd_kernel2, nheads=nheads, hpp=hpp,
                          scale=1.0 / (Dh ** 0.5),
                          fast=fast_dots and not interpret),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, D3), qkv.dtype),
            jax.ShapeDtypeStruct((B, nheads // hpp, 1, S), jnp.float32),
        ),
        grid=(B, nheads // hpp),
        in_specs=[
            pl.BlockSpec((1, S, D3), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, S, D), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h: (b, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, S, D3), lambda b, h: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h, 0, 0)),
        ),
        interpret=interpret,
    )(qkv, dout, r[:, None, :])
    return dqkv, e_head[:, :, 0].sum(axis=1)
