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
        # carries accumulate in fp32 like Ê (matches the single-device
        # self_attention_relevancy_update; bf16 captures stay exact)
        rss_loc = rss_loc.astype(jnp.float32)
        rsq_loc = rsq_loc.astype(jnp.float32)
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


def sp_detr_relevancy(
    enc_cams: jnp.ndarray,      # [K, Le, H, S, S]
    enc_grads: jnp.ndarray,     # [K, Le, H, S, S]
    dec_self_cams: jnp.ndarray,   # [K, Ld, H, Q, Q]
    dec_self_grads: jnp.ndarray,  # [K, Ld, H, Q, Q]
    dec_cross_cams: jnp.ndarray,   # [K, Ld, H, Q, S]
    dec_cross_grads: jnp.ndarray,  # [K, Ld, H, Q, S]
    mesh: Mesh,
    axis: str = "tp",
    normalize_self_attention: bool = True,
    apply_self_in_rule_10: bool = True,
    aggregate: bool = True,
    token_valid: jnp.ndarray | None = None,  # [S] 1 = real encoder token
) -> jnp.ndarray:
    """Sequence-parallel DETR propagation → ``R_q_i`` ``[K, Q, S]``.

    The sharded counterpart of ``explain.detr.relevancy_from_capture``
    (reference DETR/modules/ExplanationGenerator.py:110-195): this is
    THE big-S case — at the protocol's 800px the encoder has S ≈ 1900
    tokens, so the per-layer taps are [6, 8, 1900, 1900] (~0.7 GB fp32
    per K) and the carry ``R_i_i`` is [1900, 1900]. Layout:

      * encoder taps and ``R_i_i`` rows are sharded over ``mesh[axis]``
        (each chip holds [S/k, S] blocks) — the encoder chain is the
        ``sp_self_attention_relevancy`` recurrence (one ``all_gather``
        of the carry per layer, local row-block matmul on the MXU);
      * eq. 8+9 on ``R_i_i`` is row-local (rows are whole in a shard);
      * decoder carries ``R_q_q`` [Q, Q] / ``R_q_i`` [Q, S] are tiny and
        stay replicated; the rule-10 bridge ``Ê_qi @ norm(R_i_i)``
        contracts over the sharded rows — the cross-attention taps are
        key-sharded and each chip's partial product is ``psum``-reduced
        over ICI.

    Padding S to a multiple of the mesh axis is exact: padded Ê rows /
    columns are zero, padded ``R_i_i`` rows stay identity rows, and the
    eq. 8+9 valid-mask pins them inert (``ops.relevancy.handle_residual``
    documents the NaN-poisoning this prevents). ``token_valid`` defaults
    to all-ones over the real S.
    """
    k = mesh.shape[axis]
    K, Le, H, S, _ = enc_cams.shape
    Q = dec_self_cams.shape[-1]
    s_pad = -(-S // k) * k
    enc_cams = _pad_rows_cols(enc_cams, s_pad)
    enc_grads = _pad_rows_cols(enc_grads, s_pad)
    pad_last = [(0, 0)] * 4 + [(0, s_pad - S)]
    dec_cross_cams = jnp.pad(dec_cross_cams, pad_last)
    dec_cross_grads = jnp.pad(dec_cross_grads, pad_last)
    if token_valid is None:
        token_valid = jnp.ones((S,), jnp.float32)
    token_valid = jnp.pad(token_valid.astype(jnp.float32),
                          (0, s_pad - S))

    def _avg32(cam, grad):
        prod = grad.astype(jnp.float32) * cam.astype(jnp.float32)
        return jnp.maximum(prod, 0.0).mean(axis=-3)

    def chain(ec, eg, dsc, dsg, dxc, dxg, valid_loc):
        s_local = ec.shape[-2]
        eye_loc = _local_identity_rows(axis, s_local, s_pad)

        def per_k(ec, eg, dsc, dsg, dxc, dxg):
            e_enc = _avg32(ec, eg)                     # [Le, Sl, Sp]

            def enc_step(r_loc, e_l):
                r_full = jax.lax.all_gather(r_loc, axis, axis=0,
                                            tiled=True)
                add = e_l @ r_full
                return (r_loc + add if aggregate else add), None

            r_loc, _ = jax.lax.scan(enc_step, eye_loc, e_enc)

            if normalize_self_attention:
                # handle_residual on the row-sharded R_i_i: each row is
                # whole in its shard, so eq. 8+9 is fully local
                r_hat = r_loc - eye_loc
                denom = r_hat.sum(axis=-1, keepdims=True)
                v = valid_loc[:, None]
                r_hat = r_hat * v
                denom = jnp.where(v > 0, denom, 1.0)
                r_ii_b = r_hat / denom + eye_loc       # [Sl, Sp]
            else:
                r_ii_b = r_loc

            def dec_step(carry, x):
                R_qq, R_qi = carry
                (c_s, g_s), (c_x_loc, g_x_loc) = x
                e_qq = _avg32(c_s, g_s)                # [Q, Q]
                add_qq = e_qq @ R_qq
                add_qi = e_qq @ R_qi
                if aggregate:
                    R_qq, R_qi = R_qq + add_qq, R_qi + add_qi
                else:
                    R_qq, R_qi = add_qq, add_qi
                cam_qi_loc = _avg32(c_x_loc, g_x_loc)  # [Q, Sl]
                if apply_self_in_rule_10:
                    # rule 10: norm(R_qq)ᵀ @ (Ê_qi @ norm(R_ii)); the
                    # inner bridge contracts over the sharded rows
                    inner = jax.lax.psum(cam_qi_loc @ r_ii_b, axis)
                    if normalize_self_attention:
                        eye_q = jnp.eye(Q, dtype=R_qq.dtype)
                        q_hat = R_qq - eye_q
                        q_norm = (q_hat / q_hat.sum(-1, keepdims=True)
                                  + eye_q)
                    else:
                        q_norm = R_qq
                    add = q_norm.T @ inner
                else:
                    add = jax.lax.all_gather(cam_qi_loc, axis, axis=1,
                                             tiled=True)
                add = jnp.nan_to_num(add, nan=0.0)
                R_qi = (R_qi + add) if aggregate else add
                return (R_qq, R_qi), None

            carry0 = (jnp.eye(Q, dtype=jnp.float32),
                      jnp.zeros((Q, s_pad), jnp.float32))
            (_, R_qi), _ = jax.lax.scan(
                dec_step, carry0, ((dsc, dsg), (dxc, dxg)))
            return R_qi

        return jax.vmap(per_k)(ec, eg, dsc, dsg, dxc, dxg)

    enc_spec = P(None, None, None, axis, None)
    dec_self_spec = P(None, None, None, None, None)
    dec_cross_spec = P(None, None, None, None, axis)
    out = jax.shard_map(
        chain, mesh=mesh,
        in_specs=(enc_spec, enc_spec, dec_self_spec, dec_self_spec,
                  dec_cross_spec, dec_cross_spec, P(axis)),
        out_specs=P(None, None, None),
        check_vma=False,
    )(enc_cams, enc_grads, dec_self_cams, dec_self_grads,
      dec_cross_cams, dec_cross_grads, token_valid)
    return out[:, :, :S]


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
