"""Benchmark: ViT-B/16 relevancy-map throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "maps/sec/chip", "vs_baseline": N}

Baseline: the BASELINE.json north star demands ≥1,000 maps/s on a
v5e-8 → 125 maps/s/chip. vs_baseline = value / 125.

The reference implementation computes one map per fwd+bwd+hook-loop on a
GPU; here the whole pipeline (fwd, one bwd for all layer ∇A, scan of the
relevancy chain) is a single XLA program, batched.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_MAPS_PER_CHIP = 125.0


def main():
    import jax

    from transformer_mm_explainability_tpu.utils import tpu as tpu_util

    on_tpu = tpu_util.tpu_available() or tpu_util.ensure_tpu()

    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.models import vit

    from transformer_mm_explainability_tpu.utils.tpu import (
        setup_compilation_cache,
    )

    setup_compilation_cache()

    cfg = vit.VIT_B_16
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    if on_tpu:
        # throughput mode: bf16 weights/activations, fp32 softmax +
        # relevancy accumulation (the parity-critical reductions)
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # row-streamed path: per-layer VJPs fold Ê into the CLS row of the
    # rollout during the backward — no [L,B,H,S,S] stacks, and the
    # chain is vector-matrix. Produces exactly the notebook's
    # generate_relevance output (R[0, 1:]).
    if on_tpu:
        fn = jax.jit(
            lambda p, im, tg: vit.relevancy_streamed_row(p, im, tg, cfg))
    else:
        fn = jax.jit(lambda p, im, tg: vit.relevancy(p, im, tg, cfg))

    B = 256 if on_tpu else 4
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, 224, 224, 3).astype(np.float32))
    if on_tpu:
        images = images.astype(jnp.bfloat16)
    targets = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)

    # warm-up / compile
    float(fn(params, images, targets).sum())

    iters = 10 if on_tpu else 2
    t0 = time.time()
    for _ in range(iters):
        # host readback forces real synchronisation through the tunnel
        float(fn(params, images, targets).sum())
    dt = (time.time() - t0) / iters
    maps_per_sec = B / dt

    print(json.dumps({
        "metric": "ViT-B/16 relevancy maps/sec/chip (batched fwd+bwd+rules)",
        "value": round(maps_per_sec, 1),
        "unit": "maps/sec/chip",
        "vs_baseline": round(maps_per_sec / BASELINE_MAPS_PER_CHIP, 2),
    }))


if __name__ == "__main__":
    main()
