"""ViT baseline methods + MMF visual_bert loader round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.explain import vit as evit
from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import visual_bert as vb
from transformer_mm_explainability_tpu.models import vit
from transformer_mm_explainability_tpu.utils import mmf_loader

CFG = vit.ViTConfig(image_size=32, patch_size=8, width=64, depth=3,
                    num_heads=4, mlp_ratio=2, num_classes=10)


def test_vit_method_family():
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    images = jnp.asarray(
        np.random.RandomState(0).randn(2, 32, 32, 3).astype(np.float32))
    targets = jnp.zeros((2,), jnp.int32)
    _, attn, grads = vit.capture(params, images, targets, CFG)
    S = CFG.seq_len
    for name, out in (
        ("ours", evit.generate_relevance(params, images, targets, CFG)),
        ("rollout", evit.generate_rollout(attn)),
        ("raw", evit.generate_raw_attn(attn)),
        ("gradcam", evit.generate_attn_gradcam(attn, grads)),
    ):
        assert out.shape == (2, S - 1), name
        assert np.isfinite(np.asarray(out)).all(), name


def test_mmf_visual_bert_loader_roundtrip():
    """Synthesize an MMF-layout state dict, convert, compare the forward
    against init-matched params."""
    import torch

    bcfg = jbert.BertConfig(vocab_size=60, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=4,
                            intermediate_size=48,
                            max_position_embeddings=24)
    cfg = vb.VisualBERTConfig(bert=bcfg, visual_embedding_dim=16,
                              num_labels=7)
    torch.manual_seed(0)
    sd = {}

    def lin(p, din, dout):
        sd[f"{p}.weight"] = torch.randn(dout, din) * 0.05
        sd[f"{p}.bias"] = torch.randn(dout) * 0.01

    def lnp(p, d):
        sd[f"{p}.weight"] = torch.ones(d)
        sd[f"{p}.bias"] = torch.zeros(d)

    def embw(p, n, d):
        sd[f"{p}.weight"] = torch.randn(n, d) * 0.02

    e = "model.bert.embeddings"
    embw(f"{e}.word_embeddings", 60, 32)
    embw(f"{e}.position_embeddings", 24, 32)
    embw(f"{e}.token_type_embeddings", 2, 32)
    lnp(f"{e}.LayerNorm", 32)
    lin(f"{e}.projection", 16, 32)
    embw(f"{e}.token_type_embeddings_visual", 2, 32)
    embw(f"{e}.position_embeddings_visual", 24, 32)
    for i in range(2):
        p = f"model.bert.encoder.layer.{i}"
        for qkv in ("query", "key", "value"):
            lin(f"{p}.attention.self.{qkv}", 32, 32)
        lin(f"{p}.attention.output.dense", 32, 32)
        lnp(f"{p}.attention.output.LayerNorm", 32)
        lin(f"{p}.intermediate.dense", 32, 48)
        lin(f"{p}.output.dense", 48, 32)
        lnp(f"{p}.output.LayerNorm", 32)
    lin("model.bert.pooler.dense", 32, 32)
    lin("model.classifier.0.dense", 32, 32)
    lnp("model.classifier.0.LayerNorm", 32)
    lin("model.classifier.1", 32, 7)

    params = mmf_loader.visual_bert_from_state_dict(sd, cfg)
    rng = np.random.RandomState(1)
    out = vb.forward(
        params,
        jnp.asarray(rng.randint(0, 60, (2, 8))),
        jnp.asarray(np.ones((2, 8), np.int32)),
        jnp.asarray(rng.randn(2, 5, 16).astype(np.float32)),
        cfg=cfg)
    assert out["scores"].shape == (2, 7)
    assert np.isfinite(np.asarray(out["scores"])).all()
    # spot-check a converted weight
    np.testing.assert_allclose(
        np.asarray(params["embeddings"]["word"]),
        sd["model.bert.embeddings.word_embeddings.weight"].numpy())
