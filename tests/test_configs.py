"""Config zoo resolution: every shipped configs/*.yaml loads through
the cascade and every registry name it references (model, losses,
metrics, optimizer, scheduler, processors) resolves."""

import pathlib

import pytest

jax = pytest.importorskip("jax")

import transformer_mm_explainability_tpu.zoo  # noqa: F401,E402
from transformer_mm_explainability_tpu.core import config as C  # noqa: E402
from transformer_mm_explainability_tpu.core.registry import registry  # noqa: E402

CONFIG_DIR = pathlib.Path(__file__).resolve().parents[1] / "configs"
CONFIGS = sorted(CONFIG_DIR.glob("*/*.yaml"))


def test_config_zoo_nonempty():
    assert len(CONFIGS) >= 12


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: f"{p.parent.name}/{p.stem}")
def test_config_resolves(path):
    cfg = C.Config(C.load_yaml(str(path)))
    model = cfg["model"]
    assert registry.get("model", model) is not None

    mc = cfg.get("model_config")
    if mc and model in mc and "losses" in mc[model]:
        for spec in mc[model]["losses"]:
            name = spec["type"] if hasattr(spec, "keys") else spec
            assert registry.get("loss", name) is not None, name

    if "optimizer" in cfg:
        assert registry.get("optimizer", cfg["optimizer"]["type"])

    if "scheduler" in cfg:
        sched_cfg = cfg["scheduler"]
        factory = registry.get("scheduler", sched_cfg["type"])
        params = sched_cfg.get("params")
        kw = params.to_dict() if params else {}
        sched = factory(**kw)
        assert float(sched(0)) >= 0.0

    if "evaluation" in cfg:
        for m in cfg["evaluation"]["metrics"]:
            name = m["type"] if hasattr(m, "keys") else m
            assert registry.get("metric", name) is not None, name

    dc = cfg.get("dataset_config")
    if dc:
        for ds_name, ds_cfg in dc.items():
            # every dataset named by a shipped config has a builder
            assert registry.get("builder", ds_name) is not None, ds_name
            procs = ds_cfg.get("processors")
            for _, proc_cfg in (procs.items() if procs else []):
                ptype = proc_cfg["type"]
                assert registry.get("processor", ptype) is not None, ptype
                # nested preprocessors must resolve too
                params = proc_cfg.get("params")
                if params:
                    for key in ("preprocessor", "context_preprocessor"):
                        sub = params.get(key)
                        if sub:
                            assert registry.get("processor", sub["type"])


def test_config_override_cascade():
    cfg = C.Config(C.load_yaml(str(CONFIGS[0])))
    cfg.merge_dotlist(["training.batch_size=8", "optimizer.params.lr=0.5"])
    assert cfg["training"]["batch_size"] == 8
    assert cfg["optimizer"]["params"]["lr"] == 0.5
