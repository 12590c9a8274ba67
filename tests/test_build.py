"""build_* helpers (mmf/utils/build.py surface): registry-resolved
construction of trainers, datasets, dataloaders, optimizers,
schedulers, classifier layers, encoders, processors."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import transformer_mm_explainability_tpu.zoo  # noqa: F401,E402  (registers)
from transformer_mm_explainability_tpu.core import build as B  # noqa: E402
from transformer_mm_explainability_tpu.core.registry import registry  # noqa: E402
from transformer_mm_explainability_tpu.core.sample import Sample  # noqa: E402


def test_build_optimizer_and_scheduler():
    tx = B.build_optimizer(None, {"optimizer": {
        "type": "adam_w", "params": {"lr": 1e-3}}})
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((3,))}, state, params)
    assert jnp.isfinite(updates["w"]).all()
    with pytest.raises(ValueError):
        B.build_optimizer(None, {"optimizer": {"params": {}}})

    with pytest.warns(UserWarning):
        sched = B.build_scheduler({"scheduler": {}})  # default pythia
    assert float(sched(0)) == 1.0
    sched = B.build_scheduler({"scheduler": {
        "type": "warmup_linear",
        "params": {"num_warmup_steps": 2, "num_training_steps": 10}}})
    assert float(sched(1)) == pytest.approx(0.5)


@pytest.mark.parametrize("ctype,kw,in_dim,out_dim", [
    ("linear", {}, 6, 3),
    ("weight_norm", {"hidden_dim": 8}, 6, 3),
    ("mlp", {"num_layers": 1}, 6, 3),
    ("logit", {"text_hidden_dim": 4, "img_hidden_dim": 4}, 6, 3),
])
def test_build_classifier_layer(ctype, kw, in_dim, out_dim):
    p, fwd = B.build_classifier_layer(
        {"type": ctype, "params": kw}, in_dim, out_dim,
        key=jax.random.PRNGKey(0))
    x = jnp.ones((2, in_dim))
    out = fwd(p, x)
    assert out.shape == (2, out_dim)
    with pytest.raises(NotImplementedError):
        B.build_classifier_layer({"type": "nope"}, 4, 2)


def test_build_encoders():
    enc = B.build_encoder({"type": "identity", "params": {"in_dim": 5}})
    assert enc.out_dim == 5
    enc = B.build_encoder({"name": "identity", "in_dim": 5})
    assert enc.out_dim == 5
    enc = B.build_image_encoder({"type": "projection",
                                 "params": {"in_dim": 5, "out_dim": 2}},
                                direct_features=True)
    assert enc.out_dim == 2
    from transformer_mm_explainability_tpu.models.encoders import (
        TransformerEncoder)
    assert isinstance(B.build_text_encoder({"type": "transformer",
                                            "params": {}}),
                      TransformerEncoder)


def test_build_processors_and_trainer():
    procs = B.build_processors({
        "text_processor": {"type": "simple_sentence", "params": {}},
        "disabled": None})
    assert set(procs) == {"text_processor"}
    assert procs["text_processor"]({"text": "Two dogs?"})["text"] \
        == ["two", "dogs"]
    from transformer_mm_explainability_tpu.train.trainer import Trainer
    cls = B.build_trainer({"training": {"trainer": "mmf"}})
    assert cls is Trainer


def test_build_dataloader_shards_and_shuffles():
    class DS(list):
        dataset_type = "train"

    ds = DS(Sample(x=np.full((2,), i, np.float32), idx=i)
            for i in range(10))
    epoch_iter, sampler = B.build_dataloader_and_sampler(
        ds, {"batch_size": 3, "shard": 0, "num_shards": 2, "seed": 1})
    assert sampler is None
    batches = list(epoch_iter(0))
    seen = np.concatenate([b["idx"] for b in batches])
    assert len(seen) == 5  # half the data on shard 0
    other = B.build_dataloader_and_sampler(
        ds, {"batch_size": 3, "shard": 1, "num_shards": 2, "seed": 1})[0]
    seen2 = np.concatenate([b["idx"] for b in other(0)])
    assert sorted(np.concatenate([seen, seen2]).tolist()) \
        == list(range(10))
    # different epochs reshuffle
    assert not np.array_equal(
        np.concatenate([b["idx"] for b in epoch_iter(0)]),
        np.concatenate([b["idx"] for b in epoch_iter(1)]))


def test_triple_linear_training_branches():
    """Regression: TripleLinear applies PER-BRANCH heads to [B, 3, D]
    training input (layers.py:674-691), not head 0 broadcast."""
    p, fwd = B.build_classifier_layer({"type": "triple_linear"}, 4, 3,
                                      key=jax.random.PRNGKey(2))
    x3 = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4)
                     .astype(np.float32))
    out = fwd(p, x3)
    assert out.shape == (2, 3, 3)
    from transformer_mm_explainability_tpu.models import mmf_layers as L
    for i in range(3):
        np.testing.assert_allclose(np.asarray(out[:, i]),
                                   np.asarray(L.linear_fwd(p[i], x3[:, i])),
                                   atol=1e-6)
    assert not np.allclose(np.asarray(out[:, 1]),
                           np.asarray(L.linear_fwd(p[0], x3[:, 1])))
    # eval path: [B, D] through head 0
    x2 = x3[:, 0]
    np.testing.assert_allclose(np.asarray(fwd(p, x2)),
                               np.asarray(L.linear_fwd(p[0], x2)))


def test_build_model_resolves():
    mod = B.build_model({"model": "vit"})
    assert hasattr(mod, "relevancy")
    with pytest.raises(KeyError):
        B.build_model({"model": "nonexistent"})
