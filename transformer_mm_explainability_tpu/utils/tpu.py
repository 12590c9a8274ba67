"""TPU runtime helpers.

In this container the TPU chip is reached through a tunneled PJRT plugin
registered by a sitecustomize hook at interpreter start. The single chip
grant is exclusive and released asynchronously when a process exits, so
back-to-back Python invocations can race the claim and leave the
interpreter with no registered TPU backend. ``ensure_tpu`` retries the
claim with backoff; ``cpu_fallback`` selects the host platform for
functional (non-perf) runs.
"""

from __future__ import annotations

import os
import time



def tpu_available() -> bool:
    import jax

    try:
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


_RETRY_ENV = "TMMX_TPU_CLAIM_RETRY"


def ensure_tpu(retries: int = 8, wait_s: float = 30.0) -> bool:
    """Bring up the tunneled TPU backend, retrying the chip claim.

    The plugin registers (and claims the grant) during interpreter
    start-up; a failed claim cannot be redone in-process, so on failure
    this re-execs the interpreter after a backoff — callers should
    invoke it before doing any real work. Returns True if a TPU device
    is live; False if the plugin is absent or retries are exhausted
    (caller may fall back to CPU).
    """
    import sys

    if tpu_available():
        os.environ.pop(_RETRY_ENV, None)
        return True
    if not os.path.exists("/opt/axon/libaxon_pjrt.so"):
        return False
    attempt = int(os.environ.get(_RETRY_ENV, "0"))
    if attempt >= retries:
        return False
    os.environ[_RETRY_ENV] = str(attempt + 1)
    time.sleep(wait_s)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def setup_compilation_cache(path: str = "/root/.cache/tmmx_jax_cache") -> None:
    """Enable JAX's persistent compilation cache so repeated runs skip
    the (slow, tunneled) compile step.

    ``TMMX_JAX_CACHE_DIR`` overrides the location. The test suite sets
    it to a private directory: concurrent writers (a chip protocol run,
    a CPU bench drive) sharing the cache with a reader can hand the
    reader a half-written AOT executable — observed once as a SIGSEGV
    mid-suite in an otherwise-green test."""
    import jax

    path = os.environ.get("TMMX_JAX_CACHE_DIR", path)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def force_cpu() -> None:
    """Route this process to the host CPU backend (tests, dry runs)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
