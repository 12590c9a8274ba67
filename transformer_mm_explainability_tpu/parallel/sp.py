"""Sequence-parallel relevancy chains.

The relevancy state is O(S²) per modality pair — the largest tensor in
the whole pipeline (SURVEY §5: DETR's ``R_i_i`` is [~1900, ~1900] at
800px, and the per-layer [L, H, S, S] attention/gradient taps behind it
are ~0.7 GB in fp32). The reference never shards this (its scaling is
NCCL DDP only); on TPU the chain ``R ← R + Ê·R`` is a row-parallel
matmul recurrence that maps directly onto a mesh axis:

  * rows of ``R`` (and of every per-layer ``Ê``) are sharded over the
    ``sp`` axis — each chip holds ``[S/k, S]`` blocks, so the taps and
    the state shrink by the mesh factor;
  * per layer, one ``all_gather`` of the current ``R`` over ICI
    reassembles the right operand, and each chip computes its local
    row-block ``R_loc += Ê_loc @ R_full`` on the MXU;
  * the identity init and the final result stay row-sharded end to end
    (the CLS / per-query rows the generators read are single rows of
    the sharded product).

The math is exactly ``ops.relevancy.self_attention_relevancy`` /
``compute_rollout_attention`` (tests pin sharded == single-device);
only the layout differs. Padding rows/cols to a multiple of the mesh
axis is exact: padded ``Ê`` blocks are zero, so padded rows of ``R``
stay identity rows and padded columns never contribute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _pad_rows_cols(x: jnp.ndarray, s_pad: int) -> jnp.ndarray:
    """Zero-pad the last two axes of ``x`` from S to ``s_pad``."""
    s = x.shape[-1]
    if s == s_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, s_pad - s), (0, s_pad - s)]
    return jnp.pad(x, pad)


def _local_identity_rows(axis: str, s_local: int, s_pad: int) -> jnp.ndarray:
    """This shard's row-block of eye(s_pad)."""
    rows = jax.lax.axis_index(axis) * s_local + jnp.arange(s_local)
    return jax.nn.one_hot(rows, s_pad, dtype=jnp.float32)


def sp_self_attention_relevancy(
    cams: jnp.ndarray,
    grads: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tp",
    start_layer: int = 0,
) -> jnp.ndarray:
    """Sequence-parallel ``ops.relevancy.self_attention_relevancy``.

    ``cams``/``grads``: ``[L, H, S, S]``. Rows (axis -2) are sharded
    over ``mesh[axis]``; the returned ``[S, S]`` relevancy is row-sharded
    the same way (a fully addressable global array under jit).
    """
    k = mesh.shape[axis]
    L, H, S, _ = cams.shape
    s_pad = -(-S // k) * k
    cams = _pad_rows_cols(cams, s_pad)
    grads = _pad_rows_cols(grads, s_pad)

    def chain(cam_loc, grad_loc):  # [L, H, Sl, Sp] local row-blocks
        prod = grad_loc.astype(jnp.float32) * cam_loc.astype(jnp.float32)
        e_loc = jnp.maximum(prod, 0.0).mean(axis=1)  # [L, Sl, Sp]
        e_loc = e_loc[start_layer:]
        r_loc = _local_identity_rows(axis, e_loc.shape[1], s_pad)

        def step(r_loc, e_l):
            r_full = jax.lax.all_gather(r_loc, axis, axis=0, tiled=True)
            return r_loc + e_l @ r_full, None

        r_loc, _ = jax.lax.scan(step, r_loc, e_loc)
        return r_loc

    spec = P(None, None, axis, None)
    out = jax.shard_map(
        chain, mesh=mesh, in_specs=(spec, spec), out_specs=P(axis, None),
        check_vma=False,
    )(cams, grads)
    return out[:S, :S]


def sp_self_attention_update(
    R_ss: jnp.ndarray,
    R_sq: jnp.ndarray,
    cams: jnp.ndarray,
    grads: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tp",
    aggregate: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sequence-parallel rules 6+7 scan
    (``ops.relevancy.self_attention_relevancy_update``).

    This is the big-S case the module exists for: DETR's encoder
    accumulation carries ``R_i_i`` [S, S] with S ≈ 1900 at 800px.
    ``R_ss`` [S, S] and ``R_sq`` [S, Q] are row-sharded; per layer both
    carries are gathered once and each chip computes its local
    ``Ê_loc @ R_full`` additions. Zero-padding is exact: padded ``Ê``
    rows/cols are zero, so padded regions of both carries stay at their
    (zero-padded) input values through aggregate and overwrite modes.
    """
    k = mesh.shape[axis]
    L, H, S, _ = cams.shape
    Q = R_sq.shape[1]
    s_pad = -(-S // k) * k
    cams = _pad_rows_cols(cams, s_pad)
    grads = _pad_rows_cols(grads, s_pad)
    R_ss = _pad_rows_cols(R_ss, s_pad)
    R_sq = jnp.pad(R_sq, ((0, s_pad - S), (0, 0)))

    def chain(cam_loc, grad_loc, rss_loc, rsq_loc):
        prod = grad_loc.astype(jnp.float32) * cam_loc.astype(jnp.float32)
        e_loc = jnp.maximum(prod, 0.0).mean(axis=1)  # [L, Sl, Sp]

        def step(carry, e_l):
            rss_loc, rsq_loc = carry
            rss_full = jax.lax.all_gather(rss_loc, axis, axis=0, tiled=True)
            rsq_full = jax.lax.all_gather(rsq_loc, axis, axis=0, tiled=True)
            add_ss = e_l @ rss_full
            add_sq = e_l @ rsq_full
            if aggregate:
                return (rss_loc + add_ss, rsq_loc + add_sq), None
            return (add_ss, add_sq), None

        (rss_loc, rsq_loc), _ = jax.lax.scan(
            step, (rss_loc, rsq_loc), e_loc)
        return rss_loc, rsq_loc

    spec4 = P(None, None, axis, None)
    rss, rsq = jax.shard_map(
        chain, mesh=mesh,
        in_specs=(spec4, spec4, P(axis, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None)), check_vma=False,
    )(cams, grads, R_ss, R_sq)
    return rss[:S, :S], rsq[:S, :Q]


def sp_rollout_attention(
    layer_matrices: jnp.ndarray,
    mesh: Mesh,
    axis: str = "tp",
    start_layer: int = 0,
    normalize: bool = True,
) -> jnp.ndarray:
    """Sequence-parallel ``ops.relevancy.compute_rollout_attention``.

    ``layer_matrices``: ``[L, S, S]`` head-averaged attention maps; the
    joint rollout product comes back row-sharded over ``mesh[axis]``.
    The residual-eye add and row normalisation are local to each row
    block (rows are whole in a shard); only the chain multiply gathers.
    """
    k = mesh.shape[axis]
    L, S, _ = layer_matrices.shape
    s_pad = -(-S // k) * k
    mats = _pad_rows_cols(layer_matrices, s_pad)

    def chain(m_loc):  # [L, Sl, Sp]
        s_local = m_loc.shape[1]
        eye_loc = _local_identity_rows(axis, s_local, s_pad)
        m_loc = m_loc.astype(jnp.float32) + eye_loc
        if normalize:
            # padded rows are pure identity rows (sum 1) — division is
            # safe and keeps them inert, matching the unpadded math
            m_loc = m_loc / m_loc.sum(axis=-1, keepdims=True)
        m_loc = m_loc[start_layer:]

        def step(j_loc, a_loc):
            j_full = jax.lax.all_gather(j_loc, axis, axis=0, tiled=True)
            return a_loc @ j_full, None

        j_loc, _ = jax.lax.scan(step, m_loc[0], m_loc[1:])
        return j_loc

    out = jax.shard_map(
        chain, mesh=mesh, in_specs=(P(None, axis, None),),
        out_specs=P(axis, None), check_vma=False,
    )(mats)
    return out[:S, :S]
