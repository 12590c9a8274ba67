"""tools/chip_check smoke: the tool that validates the compiled Mosaic
kernel paths on the real chip must itself stay runnable. Here we run it
in --interpret --small mode (CPU-safe, tiny shapes); the compiled-path
run is a chip-session activity (see the tool docstring)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_chip_check_interpret_small():
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-m",
         "transformer_mm_explainability_tpu.tools.chip_check",
         "--interpret", "--small"],
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL PASS" in proc.stdout
    assert proc.stdout.count("PASS") >= 4  # 3 checks + summary line


def test_chip_check_refuses_compiled_on_cpu():
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-m",
         "transformer_mm_explainability_tpu.tools.chip_check",
         "--only", "roi_pool"],
        env=env, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 1, proc.stdout + proc.stderr
    assert "platform is cpu" in proc.stdout
