"""A/B throughput lab: relevancy_fused vs relevancy_fused_block.

Measures sustained end-to-end maps/s (pipelined host readback, same
methodology as bench.py) for the two fused ViT relevancy paths across
batch sizes and dtypes on the current backend, and writes a JSON
artifact. Used to decide which path bench.py's headline should take —
a kernel change only graduates to the flagship number after winning
this A/B on the real chip AND passing tools/chip_check parity there.

Run (chip):  timeout 3000 env PYTHONPATH=/root/repo:/root/.axon_site \
    python -m transformer_mm_explainability_tpu.tools.perf_ab \
    --out docs/PERF_AB_r05.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


from transformer_mm_explainability_tpu.utils.profiling import (
    sustained_seconds_per_call as _sustained,
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--batches", default="28,56,84,112")
    ap.add_argument("--dtypes", default="fp32,bf16")
    ap.add_argument("--paths", default="fused,fused_block,fused_block2")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from transformer_mm_explainability_tpu.utils.tpu import (
        setup_compilation_cache,
    )
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.models import vit

    cfg = vit.VIT_B_16
    params = vit.init_params(jax.random.PRNGKey(0), cfg)
    interp = jax.devices()[0].platform == "cpu"  # CPU smoke: interpret
    paths = {
        "fused": jax.jit(lambda p, im, tg: vit.relevancy_fused(
            p, im, tg, cfg, interpret=interp)),
        "fused_block": jax.jit(lambda p, im, tg: vit.relevancy_fused_block(
            p, im, tg, cfg, interpret=interp)),
        "fused_block2": jax.jit(
            lambda p, im, tg: vit.relevancy_fused_block2(
                p, im, tg, cfg, interpret=interp)),
    }
    rng = np.random.RandomState(0)
    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        im32 = jnp.asarray(rng.randn(B, 224, 224, 3).astype(np.float32))
        tg = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)
        for dtype in args.dtypes.split(","):
            im = im32 if dtype == "fp32" else im32.astype(jnp.bfloat16)
            p = (params if dtype == "fp32" else
                 jax.tree.map(lambda x: x.astype(jnp.bfloat16), params))
            for name in args.paths.split(","):
                fn = paths[name]
                try:
                    trials = [B / _sustained(fn, (p, im, tg), args.iters)
                              for _ in range(args.trials)]
                    row = {"path": name, "batch": B, "dtype": dtype,
                           "maps_per_s": round(float(np.median(trials)), 1),
                           "spread": [round(min(trials), 1),
                                      round(max(trials), 1)]}
                except Exception as e:  # lowering/OOM IS a finding:
                    # record it per-row so the other path's rows survive
                    row = {"path": name, "batch": B, "dtype": dtype,
                           "error": repr(e)[:300]}
                rows.append(row)
                print(json.dumps(row))
                sys.stdout.flush()
    rec = {"artifact": "perf_ab",
           "device": str(jax.devices()[0]),
           "backend": jax.default_backend(),
           "iters": args.iters, "trials": args.trials, "rows": rows}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
