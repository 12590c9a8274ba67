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
# family configs (top level) + the full translated reference matrix
# (configs/{datasets,models,projects}/** mirroring mmf/configs +
# projects/** — every model x dataset project yaml the reference ships)
CONFIGS = sorted(CONFIG_DIR.rglob("*.yaml"))
PROJECT_CONFIGS = sorted((CONFIG_DIR / "projects").rglob("*.yaml"))


def test_config_zoo_nonempty():
    assert len(CONFIGS) >= 250
    assert len(PROJECT_CONFIGS) >= 180


@pytest.mark.parametrize(
    "path", CONFIGS,
    ids=lambda p: str(p.relative_to(CONFIG_DIR))[:-len(".yaml")])
def test_config_resolves(path):
    cfg = C.Config(C.load_yaml(str(path))).resolve_interpolations()
    model = cfg.get("model")
    if model is not None:
        assert registry.get("model", model) is not None

    mc = cfg.get("model_config")
    for mkey in (mc or {}):
        for spec in (mc[mkey] or {}).get("losses") or []:
            name = spec["type"] if hasattr(spec, "keys") else spec
            assert registry.get("loss", name) is not None, name

    opt = cfg.get("optimizer")
    if opt and "type" in opt:
        assert registry.get("optimizer", opt["type"])

    sched_cfg = cfg.get("scheduler")
    if sched_cfg and "type" in sched_cfg:
        factory = registry.get("scheduler", sched_cfg["type"])
        params = sched_cfg.get("params")
        kw = params.to_dict() if params else {}
        # matrix yamls may reference training.* values that live in a
        # sibling include level; only instantiate fully-numeric specs
        if all(not isinstance(v, str) or not v.startswith("${")
               for v in kw.values()):
            sched = factory(**kw)
            assert float(sched(0)) >= 0.0

    if "evaluation" in cfg:
        for m in cfg["evaluation"].get("metrics") or []:
            name = m["type"] if hasattr(m, "keys") else m
            assert registry.get("metric", name) is not None, name

    dc = cfg.get("dataset_config")
    if dc:
        for ds_name, ds_cfg in dc.items():
            # every dataset named by a shipped config has a builder
            assert registry.get("builder", ds_name) is not None, ds_name
            procs = (ds_cfg or {}).get("processors") if ds_cfg else None
            for _, proc_cfg in (procs.items() if procs else []):
                if not proc_cfg or "type" not in proc_cfg:
                    continue
                ptype = proc_cfg["type"]
                assert registry.get("processor", ptype) is not None, ptype
                # nested preprocessors must resolve too
                params = proc_cfg.get("params")
                if params and hasattr(params, "get"):
                    for key in ("preprocessor", "context_preprocessor"):
                        sub = params.get(key)
                        if sub:
                            assert registry.get("processor", sub["type"])


def test_config_override_cascade():
    cfg = C.Config(C.load_yaml(str(CONFIGS[0])))
    cfg.merge_dotlist(["training.batch_size=8", "optimizer.params.lr=0.5"])
    assert cfg["training"]["batch_size"] == 8
    assert cfg["optimizer"]["params"]["lr"] == 0.5


def test_interpolation_resolution():
    cfg = C.Config({
        "training": {"max_updates": 22000},
        "env_path": "${env.data_dir}/datasets",
        "scheduler": {"params": {"num_training_steps":
                                 "${training.max_updates}"}},
        "embedded": "steps=${training.max_updates}!",
        "dangling": "${no.such.key}",
    }).resolve_interpolations()
    assert cfg["scheduler"]["params"]["num_training_steps"] == 22000
    assert cfg["embedded"] == "steps=22000!"
    assert cfg["env_path"].endswith("/datasets")
    assert not cfg["env_path"].startswith("${")
    assert cfg["dangling"] == "${no.such.key}"


def test_includes_cascade_project_yaml():
    """A project yaml pulls its dataset+model defaults through the
    MMF ``includes:`` convention and its own overrides win."""
    path = (CONFIG_DIR / "projects" / "visual_bert" / "configs" /
            "vqa2" / "defaults.yaml")
    cfg = C.Config(C.load_yaml(str(path))).resolve_interpolations()
    # from configs/datasets/vqa2/defaults.yaml via includes
    assert cfg["dataset_config"]["vqa2"]["max_features"] == 100
    # from configs/models/visual_bert/pretrain.yaml via includes,
    # overridden by the project yaml itself
    assert cfg["model_config"]["visual_bert"]["training_head_type"] == (
        "classification")
    assert cfg["training"]["batch_size"] == 480
