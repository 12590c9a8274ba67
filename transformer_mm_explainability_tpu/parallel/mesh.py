"""Device mesh + sharding layout for multi-chip execution.

The reference scales with NCCL DDP only (SURVEY.md §2.6:
mmf/utils/distributed.py, DETR util/misc.py). The TPU-native equivalent
is a ``jax.sharding.Mesh`` with named axes and NamedSharding
annotations; XLA inserts the collectives (psum / all-gather /
reduce-scatter) over ICI. This module provides:

  * ``make_mesh`` — factorise N devices into a (dp, tp) mesh;
  * Megatron-style tensor-parallel layouts for the transformer blocks
    (qkv/mlp-in column-sharded, proj/mlp-out row-sharded) so each
    block needs exactly one psum on its output;
  * ``shard_params`` / ``shard_batch`` helpers that lay pytrees onto
    the mesh.

Data parallelism shards the batch axis over ``dp``; gradient psum over
``dp`` is inserted by XLA automatically when the loss is averaged.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Build a (dp, tp) mesh. Defaults: tp = min(4, n), dp = n // tp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if tp is None:
        tp = 1
        for cand in (4, 2):  # prefer a 2D mesh (dp and tp both active)
            if n % cand == 0 and cand < n:
                tp = cand
                break
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def _spec_for_path(path: str) -> P:
    """Megatron layout by parameter name.

    Stacked-layer arrays have a leading L axis (never sharded).
    Column-parallel (output dim over tp): w_qkv, b_qkv, mlp w1/b1.
    Row-parallel (input dim over tp): w_out, mlp w2.
    Everything else replicated.
    """
    col_w = ("w_qkv", "['w1']", "w_q", "w_k", "w_v")
    col_b = ("b_qkv", "['b1']", "b_q", "b_k", "b_v")
    row_w = ("w_out", "['w2']")
    if any(t in path for t in col_w):
        return P(None, None, "tp")  # [L, D, 3D] — shard output dim
    if any(t in path for t in col_b):
        return P(None, "tp")
    if any(t in path for t in row_w):
        return P(None, "tp", None)  # [L, Dm, D] — shard input dim
    return P()


def _tree_paths(tree) -> Dict[str, Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        jax.tree_util.keystr(path): leaf for path, leaf in flat
    }


def shard_params(params, mesh: Mesh):
    """Place a model param pytree on the mesh with the Megatron layout.

    Leaves whose sharded axis is not divisible by tp fall back to
    replication (keeps tiny test models working on any mesh).
    """
    def place(path, leaf):
        spec = _spec_for_path(jax.tree_util.keystr(path))
        # check divisibility of sharded dims
        for dim, name in enumerate(spec):
            if name == "tp" and (
                dim >= leaf.ndim or leaf.shape[dim] % mesh.shape["tp"] != 0
            ):
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis of every leaf over dp."""
    def place(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, P("dp", *([None] * (leaf.ndim - 1))))
        )

    return jax.tree_util.tree_map(place, batch)


def replicated(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), tree
    )


def dp_shard_map(fn, mesh: Mesh, batch_argnums: Sequence[int] = (1, 2)):
    """Run ``fn`` data-parallel over the mesh's ``dp`` axis via
    ``jax.shard_map``.

    Arguments at ``batch_argnums`` are split on their leading axis over
    ``dp``; every other argument is replicated; outputs are dp-sharded
    on their leading axis. Inside ``fn`` each shard sees LOCAL shapes
    (batch B/dp).

    This is the multi-chip wrapper for the fused-Pallas paths
    (``models.vit.relevancy_fused``, ``ops.relevancy_pallas``,
    ``ops.roi_pool_pallas``): Mosaic custom calls have no SPMD
    partitioning rule, so under plain ``jit`` with sharded operands the
    compiler cannot split them — ``shard_map`` hands each chip its
    local block instead, which is exactly the dp semantics of the
    explanation/perturbation protocols (embarrassingly parallel over
    samples, SURVEY §2.6). The tp axis is unused inside: per-shard
    Pallas kernels already keep the whole hot loop in VMEM.

    Works on any backend (the tests exercise it with interpret-mode
    kernels on a virtual CPU mesh; the kernels themselves are
    chip-validated by tools/chip_check.py).
    """
    batch_argnums = tuple(batch_argnums)

    def spec_for(i):
        return P("dp") if i in batch_argnums else P()

    def wrapped(*args):
        in_specs = tuple(spec_for(i) for i in range(len(args)))
        inner = jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=P("dp"),
            check_vma=False)
        return inner(*args)

    return wrapped
