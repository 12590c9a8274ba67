"""Profiling / sanitiser hooks (SURVEY §5 aux subsystems).

  * ``trace`` — jax.profiler trace context (TensorBoard-compatible
    .pb traces; the jax-native replacement for MMF's
    TrainerProfilingMixin timer prints),
  * ``Timer``/``profile_section`` — the debug-level wall-time prints,
  * ``enable_nan_debugging`` — ``jax_debug_nans`` toggle (the analog of
    torch.autograd.set_detect_anomaly behind MMF's
    training.detect_anomaly flag, training_loop.py:27).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator

logger = logging.getLogger("tmmx")


def sustained_seconds_per_call(fn, args, iters: int = 16,
                               depth: int = 3) -> float:
    """Pipelined host-readback timing → seconds per call.

    THE benchmark methodology shared by bench.py, tools/roofline.py and
    tools/perf_ab.py (one definition so the A/B lab and the headline
    bench can never silently measure with different semantics): one
    warm call (compile + tunnel spin-up) outside the timer, then
    ``iters`` dispatches with ≤``depth`` in flight so the tunnel
    round-trip overlaps chip compute — and every output still crosses
    back to the host as a full array (``np.asarray``), making this
    sustained end-to-end throughput, not a device-only timer."""
    import numpy as np

    np.asarray(fn(*args))  # warm / compile
    inflight = []
    t0 = time.perf_counter()
    for _ in range(iters):
        inflight.append(fn(*args))
        if len(inflight) >= depth:
            np.asarray(inflight.pop(0))
    for out in inflight:
        np.asarray(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for [the] block (view in TensorBoard or
    Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer with reset semantics (mmf/utils/timer.py)."""

    def __init__(self) -> None:
        self.start = time.time()

    def reset(self) -> None:
        self.start = time.time()

    def elapsed(self) -> float:
        return time.time() - self.start


@contextlib.contextmanager
def profile_section(name: str, level: int = logging.DEBUG
                    ) -> Iterator[None]:
    """Timer print at debug level (TrainerProfilingMixin.profile)."""
    t0 = time.time()
    try:
        yield
    finally:
        logger.log(level, "%s: %.3fs", name, time.time() - t0)


def hlo_memory_analysis(jit_fn, *args, **kwargs):
    """Compiled-HLO memory footprint of one jitted program.

    Fallback evidence when the backend exposes no allocator stats
    (``device.memory_stats()`` is None on the tunneled PJRT plugin):
    XLA's buffer-assignment totals for the compiled executable —
    arguments + outputs + temporaries, i.e. the peak working set the
    program reserves in HBM. With the persistent compilation cache
    enabled, calling this on an already-run program costs one re-trace
    and a cache hit, not a recompile. Returns a dict or None.
    """
    try:
        ma = jit_fn.lower(*args, **kwargs).compile().memory_analysis()
        if ma is None:
            return None
        fields = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "alias_bytes": int(ma.alias_size_in_bytes),
            "code_bytes": int(ma.generated_code_size_in_bytes),
        }
        fields["peak_bytes_estimate"] = (
            fields["argument_bytes"] + fields["output_bytes"]
            + fields["temp_bytes"] - fields["alias_bytes"])
        return fields
    except Exception:
        return None


def enable_nan_debugging(enabled: bool = True) -> None:
    """jax_debug_nans: re-runs the failing primitive eagerly and raises
    where a NaN is produced."""
    import jax

    jax.config.update("jax_debug_nans", enabled)
