"""Fused Pallas TPU kernel for the relevancy rollout chain.

The hot loop of every "ours" generator is, per example:

    R ← I;  for l in 1..L:  Ê_l = mean_h (∇A_l ⊙ A_l)⁺;  R ← R + Ê_l R

XLA's scan keeps Ê in HBM between the elementwise reduce and the matmul.
This kernel fuses the whole chain per example: per layer it DMAs the
[H, S, S] attention/gradient slabs HBM→VMEM (double-buffered), reduces
them on the VPU into Ê, and accumulates R ← R + Ê·R on the MXU without
leaving VMEM.

Shapes are padded to the 128-lane grid outside the kernel; zero-padded
rows/cols contribute Ê = 0 so the result is exact on the real S×S block
(the identity init in the padded region never feeds back into real
rows).

Falls back to the pure-jnp scan (ops.relevancy) on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from transformer_mm_explainability_tpu.ops import relevancy as rl


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _chain_kernel(a_ref, g_ref, out_ref, r_scratch, e_scratch,
                  a_vmem, g_vmem, sems):
    """Per-example kernel. a_ref/g_ref: the FULL [B, L, H, S, S] arrays
    in HBM (ANY-space blocks must be whole arrays); the grid walks the
    batch axis and the kernel DMAs per-(example, layer) slabs.
    out_ref: [1, S, S] (VMEM); r/e scratch [S, S]; a/g vmem
    double-buffered [2, H, S, S]."""
    b = pl.program_id(0)
    _, L, H, S, _ = a_ref.shape

    # R = I
    row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    r_scratch[:] = jnp.where(row == col, 1.0, 0.0)

    def dma_in(slot, layer):
        return (
            pltpu.make_async_copy(a_ref.at[b, layer], a_vmem.at[slot],
                                  sems.at[slot, 0]),
            pltpu.make_async_copy(g_ref.at[b, layer], g_vmem.at[slot],
                                  sems.at[slot, 1]),
        )

    for d in dma_in(0, 0):
        d.start()

    def body(layer, _):
        slot = layer % 2
        nxt = (layer + 1) % 2

        @pl.when(layer + 1 < L)
        def _():
            for d in dma_in(nxt, layer + 1):
                d.start()

        for d in dma_in(slot, layer):
            d.wait()

        prod = jnp.maximum(a_vmem[slot] * g_vmem[slot], 0.0)  # [H, S, S]
        e_scratch[:] = prod.sum(axis=0) / H
        r_scratch[:] = r_scratch[:] + jnp.dot(
            e_scratch[:], r_scratch[:], preferred_element_type=jnp.float32)
        return ()

    jax.lax.fori_loop(0, L, body, (), unroll=False)
    out_ref[0] = r_scratch[:]


@functools.partial(jax.jit, static_argnames=("start_layer", "interpret"))
def self_attention_relevancy_pallas(
    cams: jnp.ndarray,       # [B, L, H, S, S]
    grads: jnp.ndarray,      # [B, L, H, S, S]
    start_layer: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched fused rollout chain → [B, S, S] relevancy matrices.
    API-equivalent to vmap(rl.self_attention_relevancy)."""
    B, L, H, S, _ = cams.shape
    if start_layer:
        cams = cams[:, start_layer:]
        grads = grads[:, start_layer:]
        L = L - start_layer
    Sp = _round_up(S, 128)
    if Sp != S:
        pad = [(0, 0), (0, 0), (0, 0), (0, Sp - S), (0, Sp - S)]
        cams = jnp.pad(cams, pad)
        grads = jnp.pad(grads, pad)

    out = pl.pallas_call(
        _chain_kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Sp, Sp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Sp, Sp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Sp, Sp), jnp.float32),
            pltpu.VMEM((Sp, Sp), jnp.float32),
            pltpu.VMEM((2, H, Sp, Sp), jnp.float32),
            pltpu.VMEM((2, H, Sp, Sp), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
    )(cams, grads)
    return out[:, :S, :S]


def self_attention_relevancy_auto(cams_b, grads_b, start_layer: int = 0):
    """Dispatch: Pallas on TPU, jnp scan elsewhere. Inputs batch-first
    [B, L, H, S, S]."""
    backend = jax.default_backend()
    if backend == "tpu":
        return self_attention_relevancy_pallas(cams_b, grads_b,
                                               start_layer=start_layer)
    return jax.vmap(
        lambda a, g: rl.self_attention_relevancy(a, g, start_layer=start_layer)
    )(cams_b, grads_b)
