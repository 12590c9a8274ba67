"""Multi-chip relevancy evaluation — the framework's scaling story.

    python examples/sharded_relevancy.py [--devices 8] [--batch 16]
                                         [--fused]

Builds an (dp, tp) ``jax.sharding.Mesh`` over the available devices,
lays ViT parameters out Megatron-style (qkv/mlp-in column-sharded,
proj/mlp-out row-sharded), dp-shards the image batch, and computes
relevancy maps for the whole batch in one jitted program — XLA inserts
the ICI collectives. ``--fused`` routes through the fused-Pallas path
via ``parallel.mesh.dp_shard_map`` (Mosaic kernels get per-chip local
blocks; see docs/ARCHITECTURE.md §6).

On a real TPU pod slice this runs as-is. Without one, ``--devices N``
forces an N-device virtual CPU mesh (the same mechanism the test suite
and the driver's multi-chip dryrun use), so the sharding program is
identical — only the iron underneath changes.

TPU-native counterpart of the reference's DDP bring-up
(VisualBERT/mmf/utils/distributed.py:221-251, DETR/util/misc.py:406-426),
which shards only the batch; here the params shard too.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="force an N-device virtual CPU mesh (default: "
                         "use the real devices jax sees)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--fused", action="store_true",
                    help="fused-Pallas path via dp_shard_map "
                         "(interpret-mode kernels off-TPU)")
    args = ap.parse_args()

    if args.devices:
        flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
                 if not f.startswith("--xla_force_host_platform")]
        flags.append(
            f"--xla_force_host_platform_device_count={args.devices}")
        os.environ["XLA_FLAGS"] = " ".join(flags)
        os.environ["JAX_PLATFORMS"] = "cpu"

    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from transformer_mm_explainability_tpu.models import vit
    from transformer_mm_explainability_tpu.parallel import mesh as pmesh

    devs = jax.devices()
    mesh = pmesh.make_mesh(devs)
    print(f"{len(devs)} {devs[0].platform} device(s); mesh "
          f"dp={mesh.shape['dp']} tp={mesh.shape['tp']}")

    on_cpu = devs[0].platform == "cpu"
    cfg = (vit.ViTConfig(image_size=32, patch_size=8, width=64, depth=2,
                         num_heads=4, mlp_ratio=4, num_classes=16)
           if on_cpu else vit.VIT_B_16)
    params = vit.init_params(jax.random.PRNGKey(0), cfg)

    B = args.batch - args.batch % mesh.shape["dp"] or mesh.shape["dp"]
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(
        B, cfg.image_size, cfg.image_size, 3).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, cfg.num_classes, (B,)), jnp.int32)

    if args.fused:
        fn = lambda p, im, tg: vit.relevancy_fused(
            p, im, tg, cfg, interpret=on_cpu)
        f = jax.jit(pmesh.dp_shard_map(fn, mesh))
        sparams = pmesh.replicated(params, mesh)
    else:
        f = jax.jit(lambda p, im, tg: vit.relevancy(p, im, tg, cfg))
        sparams = pmesh.shard_params(params, mesh)

    sbatch = pmesh.shard_batch({"im": images, "tg": targets}, mesh)
    with mesh:
        maps = f(sparams, sbatch["im"], sbatch["tg"])
        s = float(jnp.abs(maps).sum())          # forces host readback
        t0 = time.time()
        maps = f(sparams, sbatch["im"], sbatch["tg"])
        s = float(jnp.abs(maps).sum())
        dt = time.time() - t0

    print(f"relevancy maps: {tuple(maps.shape)} sharded "
          f"{maps.sharding.spec}; {B} maps in {dt * 1e3:.1f} ms "
          f"({B / dt:.0f} maps/s), checksum {s:.4e}")
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
