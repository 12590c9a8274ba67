"""Encoder registry (C34, mmf/modules/encoders.py): adaptive-pool
parity vs torch, fc7 pickle loading, factory dispatch, segment-table
expansion semantics."""

import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.core.registry import registry  # noqa: E402
from transformer_mm_explainability_tpu.models import encoders as E  # noqa: E402


@pytest.mark.parametrize("mode", ["avg", "max"])
@pytest.mark.parametrize("out_hw", [(1, 1), (2, 2), (3, 2), (3, 3),
                                    (7, 1), (5, 1)])
def test_adaptive_pool_parity(mode, out_hw):
    import torch
    x = np.random.RandomState(0).randn(2, 7, 7, 5).astype(np.float32)
    xt = torch.tensor(np.moveaxis(x, -1, 1))  # NCHW
    pool = (torch.nn.AdaptiveAvgPool2d(out_hw) if mode == "avg"
            else torch.nn.AdaptiveMaxPool2d(out_hw))
    want = np.moveaxis(pool(xt).numpy(), 1, -1)
    got = np.asarray(E.adaptive_pool_2d(jnp.asarray(x), out_hw, mode))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resnet152_encoder_shapes():
    enc = E.ResNet152ImageEncoder({"num_output_features": 4})
    params = enc.init(jax.random.PRNGKey(0))
    assert len(params["layers"]) == 4
    assert [len(s) for s in params["layers"]] == [3, 8, 36, 3]
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3, 64, 64)
                    .astype(np.float32))
    out = enc.apply(params, x)
    assert out.shape == (1, 4, 2048)
    # -1 keeps the full grid
    enc_full = E.ResNet152ImageEncoder({"num_output_features": -1})
    out = enc_full.apply(params, x)
    assert out.shape == (1, 4, 2048)  # 64/32=2 → 2x2 grid


def test_fc7_encoder_pickles(tmp_path):
    rs = np.random.RandomState(2)
    w = rs.randn(8, 16).astype(np.float32)
    b = rs.randn(8).astype(np.float32)
    wf, bf = tmp_path / "fc7_w.pkl", tmp_path / "fc7_b.pkl"
    wf.write_bytes(pickle.dumps(w))
    bf.write_bytes(pickle.dumps(b))
    enc = E.FinetuneFasterRcnnFpnFc7({"in_dim": 16,
                                      "weights_file": str(wf),
                                      "bias_file": str(bf)})
    assert enc.out_dim == 8
    params = enc.init(jax.random.PRNGKey(0))
    x = rs.randn(3, 16).astype(np.float32)
    got = np.asarray(enc.apply(params, jnp.asarray(x)))
    want = np.maximum(x @ w.T + b, 0.0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_transformer_encoder_segments():
    enc = E.TransformerEncoder({"num_segments": 4, "hidden_size": 16,
                                "num_hidden_layers": 2,
                                "num_attention_heads": 2,
                                "vocab_size": 30})
    params = enc.init(jax.random.PRNGKey(3))
    tt = np.asarray(params["embeddings"]["token_type"])
    assert tt.shape == (4, 16)
    # reference quirk (encoders.py:346-349): rows 2..n-2 get the mean
    # of the ORIGINAL table, the final row stays randomly initialized
    base = E.TransformerEncoder({"num_segments": 2, "hidden_size": 16,
                                 "num_hidden_layers": 2,
                                 "num_attention_heads": 2,
                                 "vocab_size": 30})
    base_tt = np.asarray(base.init(jax.random.PRNGKey(3))
                         ["embeddings"]["token_type"])
    np.testing.assert_allclose(tt[:2], base_tt[:2])
    np.testing.assert_allclose(tt[2], base_tt.mean(0), atol=1e-6)
    assert not np.allclose(tt[3], base_tt.mean(0))

    ids = jnp.asarray([[1, 2, 3, 0]])
    mask = jnp.asarray([[1, 1, 1, 0]])
    seg = jnp.asarray([[0, 0, 3, 0]])
    pooled = enc.apply(params, ids, mask, seg)
    assert pooled.shape == (1, 16)
    assert np.isfinite(np.asarray(pooled)).all()


def test_text_embedding_encoder_ops():
    cfg = {"operator": "concat",
           "embedding_params": {"type": "attention",
                                "params": {"hidden_dim": 8,
                                           "embedding_dim": 6,
                                           "conv1_out": 4,
                                           "conv2_out": 2}}}
    enc = E.TextEmbeddingEncoder(cfg)
    params = enc.init(jax.random.PRNGKey(4))
    x = jnp.asarray(np.random.RandomState(5).randn(2, 5, 6)
                    .astype(np.float32))
    out = enc.apply(params, x)
    assert out.shape == (2, 16)  # 2 glimpses × hidden 8
    with pytest.raises(NotImplementedError):
        E.TextEmbeddingEncoder({"operator": "sum",
                                "embedding_params": {"type": "bert",
                                                     "params": {}}})


def test_factories_and_registry():
    for name in ("identity", "finetune_faster_rcnn_fpn_fc7",
                 "resnet152", "transformer", "text_embedding"):
        assert registry.get("encoder", name) is not None
    ident = E.build_image_feature_encoder("default", {"in_dim": 7})
    assert ident.out_dim == 7
    x = jnp.ones((2, 7))
    assert (ident.apply(ident.init(jax.random.PRNGKey(0)), x) == x).all()
    proj = E.build_image_feature_encoder("projection",
                                         {"in_dim": 7, "out_dim": 3})
    p = proj.init(jax.random.PRNGKey(1))
    assert proj.apply(p, x).shape == (2, 3)
    with pytest.raises(AssertionError):
        E.build_image_feature_encoder("identity", {})
    with pytest.raises(NotImplementedError):
        E.build_image_encoder("vit")
    assert isinstance(E.build_text_encoder("transformer", {}),
                      E.TransformerEncoder)
