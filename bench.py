"""Benchmark: ViT-B/16 relevancy-map throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "maps/sec/chip", "vs_baseline": N}

Baseline: the BASELINE.json north star demands ≥1,000 maps/s on a
v5e-8 → 125 maps/s/chip. vs_baseline = value / 125.

The HEADLINE number is the fp32 parity path — ``relevancy_fused_block2``
(ops/attn_block_pallas): each block's attention AND MLP residual
branches run as one Pallas program per image in both directions, so
qkv, the attention probabilities, the [S, 3072] pre-GELU activations,
and every backward intermediate live only in VMEM — per layer HBM sees
just the [S, D] x/x_mid tape and cotangent streams, with weights as
grid-constant bf16 blocks. Graduated to the headline after winning the
r05 chip A/B (docs/PERF_AB_r05.json: 1352 fp32 / 1439 bf16 maps/s at
B=112 vs the flash-kernel path's 936/1058) and passing compiled parity
on v5e (CHIPCHECK_r05.json, max|Δ| 5.1e-5 vs ``relevancy`` — inside
the 1e-4 north star). ``bf16_maps_per_sec`` (reported alongside) is
the throughput mode (bf16 weights/activations in HBM; fp32 softmax +
relevancy accumulation in VMEM).

Dispatches are pipelined (depth 3) so the tunnel round-trip overlaps
with chip compute; every map still round-trips to the host, so this is
sustained end-to-end throughput, not a device-only timer.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_MAPS_PER_CHIP = 125.0

_CHILD_ENV = "TMMX_BENCH_CHILD"

# Sidecar record of the most recent successful real-chip measurement,
# refreshed on every TPU bench run and echoed into CPU-fallback records
# so the fallback never misreports a stale number baked into source.
_LAST_TPU_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_LAST_TPU.json")


def _run_attempts():
    """Drive the measurement in timeout-guarded subprocesses.

    A wedged chip claim makes ``jax.devices()`` block forever inside
    native code (no exception to catch), which would hang the driver's
    round-end bench run. So the parent process never touches jax: it
    re-execs itself as a child (``TMMX_BENCH_CHILD=1``) with a hard
    timeout, retries the TPU attempt once (transient claim races
    resolve in seconds; a stale grant does not), then falls back to a
    clean-CPU child (plugin unregistered via PALLAS_AXON_POOL_IPS
    removal) so ONE JSON line is always emitted.
    """
    plans = [
        # (env, timeout, is_cpu_fallback)
        (dict(os.environ), 1500, False),  # TPU attempt (cold compile ok)
        (dict(os.environ), 600, False),   # retry: claim races resolve fast
    ]
    cpu_env = {k: v for k, v in os.environ.items()
               if k != "PALLAS_AXON_POOL_IPS"}
    cpu_env["JAX_PLATFORMS"] = "cpu"
    plans.append((cpu_env, 900, True))
    for i, (env, timeout, is_cpu_fallback) in enumerate(plans):
        env = dict(env)
        env[_CHILD_ENV] = "1"
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=timeout, capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"bench attempt {i}: timed out after {timeout}s "
                  f"(wedged chip claim?)", file=sys.stderr)
            continue
        # the child's result is its LAST json-looking stdout line (a
        # library may log brace-prefixed lines before it); parse guarded
        # so a stray line can't kill the one-JSON-line guarantee.
        rec = None
        if proc.returncode == 0:
            for l in proc.stdout.splitlines():
                if l.startswith("{"):
                    try:
                        cand = json.loads(l)
                    except json.JSONDecodeError:
                        continue
                    if isinstance(cand, dict) and "metric" in cand:
                        rec = cand
        if rec is not None:
            ran_on_tpu = rec.pop("on_tpu", False)
            if is_cpu_fallback:
                rec["note"] = ("TPU unreachable after retries; "
                               "CPU fallback numbers")
                # context for the reader: the most recent real-chip
                # measurement of this same benchmark (refreshed by every
                # successful TPU run; see _LAST_TPU_PATH)
                try:
                    with open(_LAST_TPU_PATH) as f:
                        rec["last_tpu_measurement"] = json.load(f)
                except (OSError, json.JSONDecodeError):
                    pass
            elif ran_on_tpu and not rec.get("regression"):
                # do NOT re-baseline on a flagged regression: writing
                # the regressed median would make the SAME slowdown
                # read as healthy from the next run onward
                last = {
                    "fp32_maps_per_sec": rec["value"],
                    "bf16_maps_per_sec": rec.get("bf16_maps_per_sec"),
                    "date": time.strftime("%Y-%m-%d"),
                    "device": "v5e x1",
                }
                try:
                    with open(_LAST_TPU_PATH, "w") as f:
                        json.dump(last, f)
                except OSError:
                    pass
            print(json.dumps(rec))
            return 0
        print(f"bench attempt {i}: rc={proc.returncode}\n"
              f"{proc.stderr[-2000:]}", file=sys.stderr)
    print(json.dumps({
        "metric": "ViT-B/16 relevancy maps/sec/chip",
        "value": 0.0, "unit": "maps/sec/chip", "vs_baseline": 0.0,
        "error": "all bench attempts failed (TPU unreachable and CPU "
                 "fallback failed)"}))
    return 1


def _sustained(fn, args, iters: int, depth: int = 3) -> float:
    """Pipelined host-readback timing → seconds per call (the shared
    methodology — ONE definition for bench/roofline/perf_ab)."""
    from transformer_mm_explainability_tpu.utils.profiling import (
        sustained_seconds_per_call,
    )

    return sustained_seconds_per_call(fn, args, iters=iters, depth=depth)


def main():
    import jax

    from transformer_mm_explainability_tpu.utils import tpu as tpu_util

    on_tpu = tpu_util.tpu_available() or (
        os.environ.get("JAX_PLATFORMS") != "cpu" and tpu_util.ensure_tpu())

    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.models import vit
    from transformer_mm_explainability_tpu.utils.tpu import (
        setup_compilation_cache,
    )

    setup_compilation_cache()

    cfg = vit.VIT_B_16
    params = vit.init_params(jax.random.PRNGKey(0), cfg)

    B = 112 if on_tpu else 4
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, 224, 224, 3).astype(np.float32))
    targets = jnp.asarray(rng.randint(0, 1000, (B,)), jnp.int32)

    if on_tpu:
        fused = jax.jit(lambda p, im, tg: vit.relevancy_fused_block2(
            p, im, tg, cfg, interpret=False))
        # ≥3 independent timed trials per dtype: the single-trial
        # headline swung ±15% across rounds (938.4 → 797.1 fp32 in
        # r02→r03 while a same-day roofline run measured 911.4) — the
        # tunnel round-trip adds host-side jitter a single 16-iter mean
        # cannot separate from a real regression. Median is the
        # headline; min/max spread rides in the record.
        # B=112 is the measured knee for BOTH dtypes of the block2 path
        # (docs/PERF_AB_r05.json, docs/ROOFLINE_BLOCK2_r05.json) — with
        # no [L,B,H,S,S] stacks and no a1 tape, HBM footprint stays
        # small and throughput keeps rising to the VMEM-program limit.
        fp32_trials = [B / _sustained(fused, (params, images, targets),
                                      iters=16)
                       for _ in range(3)]
        fp32_rate = float(np.median(fp32_trials))

        # throughput mode: bf16 weights/activations in HBM; the Pallas
        # kernels upcast to fp32 in VMEM for softmax + relevancy
        # accumulation (ops/attn_block_pallas.py), so only HBM traffic
        # and MXU operand precision change.
        imb = images.astype(jnp.bfloat16)
        pb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        bf16_trials = [B / _sustained(fused, (pb, imb, targets), iters=16)
                       for _ in range(3)]
        bf16_rate = float(np.median(bf16_trials))
    else:
        fn = jax.jit(lambda p, im, tg: vit.relevancy(p, im, tg, cfg))
        dt = _sustained(fn, (params, images, targets), iters=2, depth=1)
        fp32_trials = [B / dt]
        fp32_rate = B / dt
        bf16_trials, bf16_rate = [], None

    rec = {
        "metric": "ViT-B/16 relevancy maps/sec/chip "
                  "(fp32 parity path, per-block fused Pallas kernels)",
        "value": round(fp32_rate, 1),
        "unit": "maps/sec/chip",
        "vs_baseline": round(fp32_rate / BASELINE_MAPS_PER_CHIP, 2),
        "bf16_maps_per_sec": (round(bf16_rate, 1)
                              if bf16_rate is not None else None),
        "trials": len(fp32_trials),
        "spread": {
            "fp32": [round(min(fp32_trials), 1), round(max(fp32_trials), 1)],
            "bf16": ([round(min(bf16_trials), 1),
                      round(max(bf16_trials), 1)] if bf16_trials else None),
        },
        "batch": B,
        "batch_bf16": B if on_tpu else None,
        "on_tpu": bool(on_tpu),
    }
    if on_tpu:
        # regression check vs the most recent recorded chip run: flag
        # only when the new MEDIAN falls outside a noise band around
        # the previous value (the observed cross-round swing).
        try:
            with open(_LAST_TPU_PATH) as f:
                last = json.load(f)
            prev = float(last.get("fp32_maps_per_sec") or 0.0)
            if prev > 0:
                rec["vs_last_tpu"] = round(fp32_rate / prev, 3)
                band = 0.15
                rec["regression"] = bool(fp32_rate < prev * (1 - band))
                rec["noise_band_pct"] = band * 100
        except (OSError, json.JSONDecodeError, ValueError):
            pass
    print(json.dumps(rec))


if __name__ == "__main__":
    if os.environ.get(_CHILD_ENV) == "1":
        main()
    else:
        sys.exit(_run_attempts())
