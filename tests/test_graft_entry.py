"""The driver-facing entry points must work as the driver invokes them.

``dryrun_multichip`` re-execs in a clean subprocess with a forced
n-device CPU platform, so it must succeed even from a process whose jax
is already initialised (this pytest process), and must FAIL loudly when
the requested mesh cannot be built — never fall back to a 1x1 mesh.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as graft


def test_dryrun_multichip_from_initialised_process(capfd):
    # jax is already initialised on the 8-device CPU mesh here; the
    # subprocess isolation must make this irrelevant.
    graft.dryrun_multichip(8)
    out = capfd.readouterr().out
    assert "MULTICHIP OK n=8" in out
    assert "dp=2 tp=4" in out or "dp2xtp4" in out


def test_dryrun_impl_refuses_degraded_mesh():
    """Direct child invocation with a device count LARGER than the
    forced platform must raise, not silently validate a smaller mesh."""
    code = (
        "import os, sys; sys.path.insert(0, %r);"
        "import __graft_entry__ as g;"
        "os.environ.update({k: v for k, v in g._cpu_mesh_env(2).items()"
        " if k in ('XLA_FLAGS', 'JAX_PLATFORMS')});"
        "g._dryrun_impl(8)" % REPO
    )
    env2 = graft._cpu_mesh_env(2)  # only 2 virtual devices, impl wants 8
    env2["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env2, cwd=REPO,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode != 0
    assert "refusing" in proc.stderr


def test_entry_compiles_tiny():
    """entry() returns (fn, args) jittable as the driver expects.
    (Compile-checking the full ViT-B is the driver's job; here we only
    check the contract shape.)"""
    fn, args = graft.entry()
    assert callable(fn) and len(args) == 3
