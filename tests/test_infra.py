"""Infrastructure tests: registry, config cascade, sample collation,
meters, checkpointing, trainer loop (the MMF-tier equivalents, modelled
on VisualBERT/tests patterns: trainer over a fake dataset + SimpleModel).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from transformer_mm_explainability_tpu.core.registry import Registry
from transformer_mm_explainability_tpu.core.config import (
    Config, build_config)
from transformer_mm_explainability_tpu.core.sample import (
    Sample, SampleList, collate)
from transformer_mm_explainability_tpu.core.meter import Meter, SmoothedValue
from transformer_mm_explainability_tpu.train import checkpoint as ckpt
from transformer_mm_explainability_tpu.train import steps
from transformer_mm_explainability_tpu.train.trainer import (
    Callback, EarlyStopping, Trainer, TrainerConfig)


def test_registry():
    r = Registry()

    @r.register_model("toy")
    class Toy:
        pass

    assert r.get("model", "toy") is Toy
    assert r.list("model") == ["toy"]
    with pytest.raises(KeyError):
        r.get("model", "missing")
    r.set_state("k", 3)
    assert r.get_state("k") == 3


def test_config_cascade(tmp_path):
    base = {"model": {"hidden": 4, "heads": 2}, "lr": 1e-3}
    p = tmp_path / "user.json"
    p.write_text('{"model": {"hidden": 8}, "data": {"batch": 16}}')
    cfg = build_config(base, [str(p)],
                      overrides=["lr=5e-4", "model.heads=4", "run.type=val"],
                      config_override_json='{"data": {"batch": 32}}')
    assert cfg.model.hidden == 8
    assert cfg.model.heads == 4
    assert cfg.lr == 5e-4
    assert cfg.data.batch == 32
    assert cfg.run.type == "val"
    cfg.freeze()
    with pytest.raises(RuntimeError):
        cfg.lr = 1.0
    cfg.defrost()
    cfg.lr = 1.0
    assert cfg.lr == 1.0


def test_config_env_interp(monkeypatch):
    monkeypatch.setenv("TMMX_TEST_DIR", "/data/x")
    cfg = Config({"path": "${env:TMMX_TEST_DIR}/f",
                  "missing": "${env:TMMX_NOPE,fallback}"})
    assert cfg.path == "/data/x/f"
    assert cfg.missing == "fallback"


def test_collate_pads():
    s1 = Sample(ids=np.array([1, 2, 3]), feat=np.ones((2, 4)), label=1)
    s2 = Sample(ids=np.array([4, 5]), feat=np.ones((5, 4)), label=0)
    batch = collate([s1, s2])
    assert batch.ids.shape == (2, 3)
    assert batch.feat.shape == (2, 5, 4)
    np.testing.assert_array_equal(batch.ids[1], [4, 5, 0])
    np.testing.assert_array_equal(batch.label, [1, 0])
    batch2 = collate([s1, s2], pad_lengths={"ids": 6})
    assert batch2.ids.shape == (2, 6)


def test_meter():
    m = Meter()
    for i in range(5):
        m.update(loss=float(i))
    assert m.meters["loss"].global_avg == 2.0
    assert m.meters["loss"].value == 4.0
    sv = SmoothedValue(window_size=2)
    sv.update(1.0), sv.update(3.0), sv.update(5.0)
    assert sv.avg == 4.0  # windowed


def test_checkpoint_roundtrip(tmp_path):
    state = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
             "opt": {"m": jnp.ones((3,))}}
    ckpt.save(str(tmp_path), state, step=7)
    assert ckpt.latest_step(str(tmp_path)) == 7
    zero = jax.tree.map(jnp.zeros_like, state)
    restored = ckpt.restore(str(tmp_path), zero)
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(state["w"]))


def test_early_stopping():
    es = EarlyStopping(patience=2, minimize=True)
    assert not es.update(1.0)
    assert not es.update(0.5)
    assert not es.update(0.6)
    assert es.update(0.7)  # second consecutive non-improvement → stop
    assert es.best == 0.5


def make_linear_problem():
    rng = np.random.RandomState(0)
    w_true = rng.randn(3, 1).astype(np.float32)
    X = rng.randn(64, 3).astype(np.float32)
    y = X @ w_true

    def loss_fn(params, batch):
        pred = batch["x"] @ params["w"]
        return ((pred - batch["y"]) ** 2).mean()

    params = {"w": jnp.zeros((3, 1))}
    batches = [{"x": jnp.asarray(X), "y": jnp.asarray(y)}] * 60
    return loss_fn, params, batches


def test_trainer_loop(tmp_path):
    loss_fn, params, batches = make_linear_problem()
    events = []

    class Tracker(Callback):
        def on_train_start(self, trainer):
            events.append("start")

        def on_update_end(self, trainer, loss):
            events.append("update")

        def on_train_end(self, trainer):
            events.append("end")

    cfg = TrainerConfig(max_updates=50, log_interval=20,
                        checkpoint_interval=25,
                        evaluation_interval=10**9,
                        save_dir=str(tmp_path))
    tr = Trainer(loss_fn, params, steps.make_adamw(1e-1), cfg,
                 callbacks=[Tracker()])
    state = tr.train(iter(batches))
    assert events[0] == "start" and events[-1] == "end"
    assert events.count("update") == 50
    final_loss = float(loss_fn(state.params, batches[0]))
    assert final_loss < 0.1
    # resume path
    tr2 = Trainer(loss_fn, params, steps.make_adamw(1e-1), cfg)
    assert tr2.resume()
    assert int(tr2.state.step) == 50


def test_grad_accumulation_matches_large_batch():
    loss_fn, params, batches = make_linear_problem()
    tx = steps.make_adamw(1e-2)
    big = batches[0]
    micro = {
        "x": big["x"].reshape(4, 16, 3),
        "y": big["y"].reshape(4, 16, 1),
    }
    s0 = steps.init_state(params, tx)
    s_big, loss_big = jax.jit(steps.make_train_step(loss_fn, tx))(s0, big)
    s_acc, loss_acc = jax.jit(steps.make_accum_train_step(loss_fn, tx, 4))(
        s0, micro)
    np.testing.assert_allclose(float(loss_acc), float(loss_big), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s_acc.params["w"]),
                               np.asarray(s_big.params["w"]), atol=1e-6)


def test_report_container():
    """Report (mmf/common/report.py:9-86): merge, attr access, kv-tuple
    load, eval-shard accumulation with a warning on missing fields."""
    from transformer_mm_explainability_tpu.core.sample import Report

    r = Report({"id": np.arange(3), "batch_size": 3},
               {"scores": np.ones((3, 2))})
    assert r.get_batch_size() == 3
    assert r.scores.shape == (3, 2)
    assert set(r.fields()) >= {"id", "scores"}
    r.extra = 5
    assert r["extra"] == 5
    with pytest.raises(AttributeError):
        _ = r.nope

    r2 = Report({"id": np.arange(2), "batch_size": 2},
                {"scores": np.zeros((2, 2))})
    with pytest.warns(UserWarning, match="missing"):
        r.accumulate_tensor_fields(r2, ["scores", "missing"])
    assert r["scores"].shape == (5, 2)

    kv = Report([("a", 1), ("b", 2)])
    assert kv.a == 1 and kv.fields() == ["a", "b"]

    with pytest.raises(TypeError):
        Report({"batch_size": 1}, "not-a-mapping")


def test_quick_files_all_exist():
    """Every QUICK_FILES entry must name a real test file: a rename or
    deletion would otherwise silently shrink the curated quick gate
    (set-membership matching gives zero signal for stale entries)."""
    import conftest

    tests_dir = os.path.dirname(os.path.abspath(conftest.__file__))
    missing = sorted(f for f in conftest.QUICK_FILES
                     if not os.path.exists(os.path.join(tests_dir, f)))
    assert not missing, (
        f"stale QUICK_FILES entries (renamed/deleted tests): {missing}")
