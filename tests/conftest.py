"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initialises its backends, so this lives at
the top of conftest (pytest imports conftest before test modules).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env sets axon (tunneled TPU)
# private compilation cache: sharing /root/.cache with concurrent chip
# jobs/bench drives can serve a half-written AOT entry (observed SIGSEGV)
os.environ.setdefault("TMMX_JAX_CACHE_DIR", "/tmp/tmmx_jax_cache_tests")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The container's sitecustomize registers the axon (remote TPU) PJRT plugin
# at interpreter start and forces jax_platforms="axon,cpu"; override back to
# CPU before any backend is initialised so tests run on the virtual 8-device
# CPU mesh with exact fp32 matmuls.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE.exists()


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="PyTorch reference repo not mounted"
)


def load_reference_module(relpath: str, name: str):
    """Import a module from the read-only reference checkout by path."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, str(REFERENCE / relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: protocol-scale / heavy-compile tests (excluded from the "
        "quick tier; run the full suite to include them)")
    config.addinivalue_line(
        "markers",
        "quick: the curated <3-minute gate tier (QUICK_FILES below) — "
        "the full suite (no -m filter) runs everything")


# The <3-minute gate: a CURATED set, chosen from a measured per-file
# profile of the whole suite on this box (single CPU) — the round-3
# "everything not slow is quick" rule made the quick tier 919 of 927
# tests and >10 minutes, i.e. not a gate at all. Selection rule: the
# cheap pure-python / tiny-shape tests covering every subsystem's core
# logic (ops + rules, config cascade, registries, datasets/processors,
# eval-metric math, native ops, schedulers, tokenizers) plus ONE
# end-to-end model relevancy compile (test_vit) so the gate still
# exercises capture → chain → map. Everything heavier runs in the full
# suite; protocol-scale tests additionally carry @slow.
QUICK_FILES = {
    "test_aux.py", "test_bench_attempts.py", "test_build.py",
    "test_caption_metrics.py", "test_coco_eval.py",
    "test_coco_eval_fuzz.py", "test_configs.py", "test_datasets_mmf.py",
    "test_detr_transforms.py", "test_env.py", "test_extra_builders.py",
    "test_gqa_visdial_tools.py", "test_hm_convert.py", "test_infra.py",
    "test_losses_metrics.py", "test_lrp.py",
    "test_lxmert_pretrain_data.py", "test_masked_datasets.py",
    "test_multi_dataset_reporter.py", "test_native.py",
    "test_nms_fuzz.py", "test_pallas.py", "test_panoptic.py",
    "test_predict.py", "test_processors_full.py",
    "test_qa_answer_table.py", "test_rap.py", "test_relevancy.py",
    "test_resnet.py", "test_schedulers.py", "test_text_utils.py",
    "test_tokenizer.py", "test_verify_parity.py", "test_vit.py",
}


def pytest_collection_modifyitems(config, items):
    """Randomize MODULE execution order when MM_TPU_RANDOM_ORDER is set
    (to an integer seed, or `1`/empty for a time-free default sweep).

    The suite must be order-independent — round 1 shipped an
    order-fragile torchvision shim exactly because only the default
    alphabetical order was ever exercised.  Modules are shuffled as
    blocks (items within a module stay contiguous, so module-scoped
    fixtures build once); run several seeds to sweep orderings:

        MM_TPU_RANDOM_ORDER=3 python -m pytest tests/ -q
    """
    for item in items:
        fname = os.path.basename(item.nodeid.split("::")[0])
        if "slow" not in item.keywords and fname in QUICK_FILES:
            item.add_marker(pytest.mark.quick)

    seed_s = os.environ.get("MM_TPU_RANDOM_ORDER")
    if seed_s is None:
        return
    import random

    rng = random.Random(int(seed_s or "1"))
    blocks: dict[str, list] = {}
    for item in items:
        blocks.setdefault(item.nodeid.split("::")[0], []).append(item)
    keys = sorted(blocks)
    rng.shuffle(keys)
    items[:] = [item for k in keys for item in blocks[k]]
