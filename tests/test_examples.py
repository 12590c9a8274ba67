"""Smoke tests for every examples/ script.

Each example supports a checkpoint-free "smoke mode" (tiny random
weights, synthetic data) so the full demo pipeline — arg parsing, model
build, explanation/training, rendering — runs end-to-end. These tests
execute the scripts exactly as a user would (fresh subprocess) and
assert exit 0 plus the advertised artifacts.

The child env is sanitised (PALLAS_AXON_POOL_IPS removed,
JAX_PLATFORMS=cpu) because the container's sitecustomize would
otherwise claim the exclusive TPU grant per subprocess — the in-process
conftest override does not reach children.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


@pytest.fixture(scope="module")
def demo_image(tmp_path_factory):
    from PIL import Image

    path = tmp_path_factory.mktemp("img") / "demo.jpg"
    arr = (np.random.RandomState(0).rand(96, 128, 3) * 255).astype("uint8")
    Image.fromarray(arr).save(path)
    return str(path)


def run_example(name, args, timeout=600):
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / name)] + args,
        env=env, capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{name} rc={proc.returncode}\nstdout:{proc.stdout[-2000:]}\n"
        f"stderr:{proc.stderr[-2000:]}")
    return proc.stdout


def test_vit_example(demo_image, tmp_path):
    out = tmp_path / "vit.png"
    run_example("vit_explainability.py", [demo_image, "--output", str(out)])
    assert out.exists() and out.stat().st_size > 0


def test_clip_example(demo_image, tmp_path):
    prefix = str(tmp_path / "clip")
    run_example("clip_explainability.py",
                [demo_image, "a cat", "a dog", "--output-prefix", prefix])
    assert list(tmp_path.glob("clip*")), "no clip artifacts written"


def test_detr_example(demo_image, tmp_path):
    prefix = str(tmp_path / "detr")
    run_example("detr_explainability.py",
                [demo_image, "--output-prefix", prefix])
    assert list(tmp_path.glob("detr*")), "no detr artifacts written"


def test_lxmert_explainability_example(demo_image, tmp_path):
    prefix = str(tmp_path / "lx")
    stdout = run_example("lxmert_explainability.py",
                         [demo_image, "what color is the cat?",
                          "--output-prefix", prefix])
    assert (tmp_path / "lx_image.png").exists()
    assert (tmp_path / "lx_text.html").exists()
    assert "A: label #" in stdout


def test_lxmert_perturbation_example():
    stdout = run_example("lxmert_perturbation.py", ["--num-samples", "2"])
    assert "AUC" in stdout or "acc" in stdout.lower()


def test_visual_bert_pretraining_example():
    stdout = run_example("visual_bert_pretraining.py",
                         ["--steps", "2", "--batch-size", "2"])
    assert "loss" in stdout.lower()


def test_mmf_zoo_vqa_example():
    run_example("mmf_zoo_vqa.py", [])


def test_sharded_relevancy_example():
    out = run_example("sharded_relevancy.py",
                      ["--devices", "8", "--batch", "8"])
    assert "mesh dp=" in out and "OK" in out


def test_sharded_relevancy_example_fused():
    out = run_example("sharded_relevancy.py",
                      ["--devices", "8", "--batch", "8", "--fused"])
    assert "OK" in out
