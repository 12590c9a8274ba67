"""VisualBERT parity: JAX BERT encoder + generators vs the reference's
instrumented BERT_ours encoder (imported directly from the reference
with random weights on torch CPU).
"""

import sys
import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import REFERENCE, requires_reference

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.explain import visual_bert as expl_vb
from transformer_mm_explainability_tpu.utils import convert


def _load_bert_ours():
    """Import BERT_ours.py + layers_ours.py as a synthetic package."""
    import importlib.util

    base = REFERENCE / "VisualBERT/mmf/models/transformers/backends"
    pkg = types.ModuleType("ref_vb_backends")
    pkg.__path__ = [str(base)]
    sys.modules.setdefault("ref_vb_backends", pkg)
    for name in ("layers_ours", "BERT_ours"):
        spec = importlib.util.spec_from_file_location(
            f"ref_vb_backends.{name}", str(base / f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_vb_backends.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["ref_vb_backends.BERT_ours"]


CFG = jbert.BertConfig(
    vocab_size=50, hidden_size=32, num_hidden_layers=3,
    num_attention_heads=4, intermediate_size=64,
    max_position_embeddings=24,
)


@pytest.fixture(scope="module")
def ref_encoder():
    import torch
    from transformers import BertConfig as HFBertConfig

    mod = _load_bert_ours()
    hf_cfg = HFBertConfig(
        vocab_size=CFG.vocab_size, hidden_size=CFG.hidden_size,
        num_hidden_layers=CFG.num_hidden_layers,
        num_attention_heads=CFG.num_attention_heads,
        intermediate_size=CFG.intermediate_size,
        max_position_embeddings=CFG.max_position_embeddings,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(1)
    enc = mod.BertEncoder(hf_cfg).eval()
    # randomise (HF init leaves LN at identity; perturb for a sharper test)
    for p in enc.parameters():
        p.data.add_(0.05 * torch.randn_like(p))
    return enc


@pytest.fixture(scope="module")
def jax_encoder(ref_encoder):
    return convert.bert_encoder_from_state_dict(
        ref_encoder.state_dict(), CFG.num_hidden_layers
    )


def make_batch():
    rng = np.random.RandomState(3)
    B, S = 2, 10
    hidden = rng.randn(B, S, CFG.hidden_size).astype(np.float32)
    mask = np.ones((B, S), np.int32)
    mask[0, 7:] = 0
    return hidden, mask


@requires_reference
def test_encoder_parity(ref_encoder, jax_encoder):
    import torch

    hidden, mask = make_batch()
    ext = (1.0 - torch.tensor(mask)[:, None, None, :].float()) * -10000.0
    want = ref_encoder(torch.tensor(hidden), attention_mask=ext)[0]
    got, attn = jbert.encoder(
        jax_encoder, jnp.asarray(hidden), CFG,
        mask=jbert.extended_attention_mask(jnp.asarray(mask)),
    )
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5)
    # attention capture parity
    for i, layer in enumerate(ref_encoder.layer):
        np.testing.assert_allclose(
            np.asarray(attn[i]),
            layer.attention.self.get_attn().detach().numpy(),
            atol=1e-5, err_msg=f"layer {i} attn",
        )


@requires_reference
def test_generate_ours_parity(ref_encoder, jax_encoder):
    """Full 'ours' chain vs reference hook captures + python loop
    (ExplanationGenerator.py:68-107 semantics, incl. cls_index row)."""
    import torch

    hidden, mask = make_batch()
    th = torch.tensor(hidden, requires_grad=True)
    ext = (1.0 - torch.tensor(mask)[:, None, None, :].float()) * -10000.0
    out = ref_encoder(th, attention_mask=ext)[0]
    score = out[:, 0, :].sum()
    score.backward()

    # jax: same scalar via taps
    def score_fn(taps):
        got, attn = jbert.encoder(
            jax_encoder, jnp.asarray(hidden), CFG,
            mask=jbert.extended_attention_mask(jnp.asarray(mask)),
            taps=taps,
        )
        return got[:, 0, :].sum(), attn

    B, S = hidden.shape[:2]
    taps0 = jnp.zeros(
        (CFG.num_hidden_layers, B, CFG.num_attention_heads, S, S)
    )
    grads, attn = jax.grad(score_fn, has_aux=True)(taps0)

    cls_index = jnp.asarray(mask.sum(1) - 2)
    got = expl_vb.generate_ours(attn, grads, cls_index)

    S_ = S
    for b in range(B):
        R = torch.eye(S_)
        for layer in ref_encoder.layer:
            cam = layer.attention.self.get_attn()[b].detach()
            grad = layer.attention.self.get_attn_gradients()[b].detach()
            e = (grad * cam).clamp(min=0).mean(0)
            R = R + e @ R
        ci = int(mask[b].sum() - 2)
        want = R[ci].clone()
        want[ci] = 0
        np.testing.assert_allclose(np.asarray(got[b]), want.numpy(), atol=1e-4)


def test_visual_bert_forward_shapes():
    """Model-level smoke test (random weights): shapes + finiteness +
    vqa pooling index behaviour."""
    from transformer_mm_explainability_tpu.models import visual_bert as vb

    cfg = vb.VisualBERTConfig(
        bert=CFG, visual_embedding_dim=16, num_labels=7
    )
    params = vb.init_params(jax.random.PRNGKey(0), cfg)
    B, S_t, N_v = 2, 8, 5
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 50, (B, S_t))),
        "input_mask": jnp.asarray(np.ones((B, S_t), np.int32)),
        "visual_embeddings": jnp.asarray(
            rng.randn(B, N_v, 16).astype(np.float32)),
    }
    out = vb.forward(params, batch["input_ids"], batch["input_mask"],
                     batch["visual_embeddings"], cfg=cfg)
    assert out["scores"].shape == (B, 7)
    assert out["attn"].shape == (CFG.num_hidden_layers, B,
                                 CFG.num_attention_heads, S_t + N_v, S_t + N_v)
    assert np.isfinite(np.asarray(out["scores"])).all()

    scores, attn, grads = vb.capture(
        params, batch, jnp.zeros((B,), jnp.int32), cfg
    )
    assert grads.shape == out["attn"].shape
    assert np.abs(np.asarray(grads)).sum() > 0


def test_relevancy_row_matches_capture_chain():
    """The streamed row-fold path == capture + generate_ours (no
    [L, B, H, S, S] stacks), with masked padding and explained-argmax
    target resolution both exercised."""
    from transformer_mm_explainability_tpu.models import visual_bert as vb

    cfg = vb.VisualBERTConfig(
        bert=CFG, visual_embedding_dim=16, num_labels=7
    )
    params = vb.init_params(jax.random.PRNGKey(0), cfg)
    B, S_t, N_v = 2, 8, 5
    rng = np.random.RandomState(0)
    im = np.ones((B, S_t), np.int32)
    im[1, 6:] = 0  # padded text keeps the vqa pooler index per-example
    vm = np.ones((B, N_v), np.int32)
    vm[0, 3:] = 0
    batch = {
        "input_ids": jnp.asarray(rng.randint(0, 50, (B, S_t))),
        "input_mask": jnp.asarray(im),
        "visual_embeddings": jnp.asarray(
            rng.randn(B, N_v, 16).astype(np.float32)),
        "visual_mask": jnp.asarray(vm),
    }
    for targets in (None, jnp.asarray([1, 4], jnp.int32)):
        scores_ref, attn, grads = vb.capture(params, batch, targets, cfg)
        cls_index = batch["input_mask"].sum(axis=1) - 2
        want = np.asarray(expl_vb.generate_ours(attn, grads, cls_index))
        scores, got = vb.relevancy_row(params, batch, targets, cfg)
        np.testing.assert_allclose(np.asarray(scores),
                                   np.asarray(scores_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-6)


def test_method_family_shapes():
    """All capture-based methods produce [B, S] rows with CLS zeroed."""
    L, B, H, S = 3, 2, 4, 9
    rng = np.random.RandomState(5)
    attn = jnp.asarray(np.abs(rng.randn(L, B, H, S, S)).astype(np.float32))
    grads = jnp.asarray(rng.randn(L, B, H, S, S).astype(np.float32))
    cls = jnp.asarray([3, 5])
    for name, fn in expl_vb.METHODS_FROM_CAPTURE.items():
        out = np.asarray(fn(attn, grads, cls))
        assert out.shape == (B, S), name
        assert out[0, 3] == 0 and out[1, 5] == 0, name
