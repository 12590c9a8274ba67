"""BERT encoder relprop parity vs reference BERT_ours (torch CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import requires_reference

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import bert_lrp
from transformer_mm_explainability_tpu.utils import convert

from test_visual_bert import _load_bert_ours, CFG, make_batch


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
    torch.manual_seed(7)
    enc = mod.BertEncoder(hf_cfg).eval()
    for p in enc.parameters():
        p.data.add_(0.05 * torch.randn_like(p))
    return enc


@requires_reference
def test_encoder_relprop_parity(ref_encoder):
    import torch

    jax_params = convert.bert_encoder_from_state_dict(
        ref_encoder.state_dict(), CFG.num_hidden_layers)

    hidden, mask = make_batch()
    ext = (1.0 - torch.tensor(mask)[:, None, None, :].float()) * -10000.0
    out = ref_encoder(torch.tensor(hidden, requires_grad=True),
                      attention_mask=ext)[0]

    rng = np.random.RandomState(21)
    R = np.abs(rng.randn(*out.shape)).astype(np.float32)
    want_R_in = ref_encoder.relprop(torch.tensor(R), alpha=1)

    jmask = jbert.extended_attention_mask(jnp.asarray(mask))
    got_out, probs, tape = jbert.encoder(
        jax_params, jnp.asarray(hidden), CFG, mask=jmask, return_tape=True)
    np.testing.assert_allclose(np.asarray(got_out), out.detach().numpy(),
                               atol=1e-5)

    got_R_in, cams = bert_lrp.bert_encoder_relprop(
        jax_params, tape, jmask, jnp.asarray(R), CFG, alpha=1.0)

    # per-layer attention cams. The LRP chain divides by near-zero
    # activations (safe_divide), which amplifies fp32 rounding between
    # rematerialised vs hook-recorded activations ~1e3×; 2e-3 abs here
    # corresponds to ~1e-6 input noise (same floor torch-vs-torch run
    # orders produce).
    for i, layer in enumerate(ref_encoder.layer):
        want_cam = layer.attention.self.get_attn_cam().detach().numpy()
        np.testing.assert_allclose(
            np.asarray(cams[i]), want_cam, atol=2e-3,
            err_msg=f"attn cam layer {i}")

    # input relevance: compare scale-normalised (the harnesses min-max
    # normalise before use; raw values near zero-activation tokens are
    # the ill-conditioned tail)
    got = np.asarray(got_R_in)
    want = want_R_in.detach().numpy()
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-3)


def test_visual_bert_relprop_and_lrp_generators():
    """Smoke: full VisualBERT relprop chain + LRP-based generators."""
    from transformer_mm_explainability_tpu.models import visual_bert as vb
    from transformer_mm_explainability_tpu.explain import visual_bert as evb

    cfg = vb.VisualBERTConfig(bert=CFG, visual_embedding_dim=16, num_labels=7)
    params = vb.init_params(jax.random.PRNGKey(1), cfg)
    B, S_t, N_v = 2, 8, 5
    rng = np.random.RandomState(2)
    input_ids = jnp.asarray(rng.randint(0, CFG.vocab_size, (B, S_t)))
    input_mask = jnp.asarray(np.ones((B, S_t), np.int32))
    vis = jnp.asarray(rng.randn(B, N_v, 16).astype(np.float32))
    out = vb.forward(params, input_ids, input_mask, vis, cfg=cfg,
                     return_tape=True)
    one_hot = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 7)
    R_in, cams = vb.relprop(params, out["tape"], one_hot, cfg)
    S = S_t + N_v
    assert cams.shape == (CFG.num_hidden_layers, B,
                          CFG.num_attention_heads, S, S)
    assert np.isfinite(np.asarray(R_in)).all()
    assert np.abs(np.asarray(cams)).sum() > 0

    # LRP-based generators consume the cams
    scores, attn, grads = vb.capture(
        params, {"input_ids": input_ids, "input_mask": input_mask,
                 "visual_embeddings": vis},
        jnp.zeros((B,), jnp.int32), cfg)
    cls_index = input_mask.sum(axis=1) - 2
    r1 = evb.generate_transformer_att(cams, grads, cls_index)
    r2 = evb.generate_partial_lrp(cams, cls_index)
    for r in (r1, r2):
        assert r.shape == (B, S)
        assert np.isfinite(np.asarray(r)).all()


def test_lxmert_lrp_generators_shapes():
    from transformer_mm_explainability_tpu.models import lxmert as jlx
    from transformer_mm_explainability_tpu.models import lxmert_lrp
    from transformer_mm_explainability_tpu.explain import lxmert as elx

    cfg = jlx.LxmertConfig(
        vocab_size=40, hidden_size=32, num_attention_heads=4,
        intermediate_size=48, max_position_embeddings=20,
        l_layers=2, x_layers=2, r_layers=2,
        visual_feat_dim=16, visual_pos_dim=4, num_qa_labels=5)
    params = jlx.init_params(jax.random.PRNGKey(3), cfg)
    B, St, Sv = 2, 7, 4
    rng = np.random.RandomState(4)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 40, (B, St))),
        "attention_mask": jnp.asarray(np.ones((B, St), np.int64)),
        "visual_feats": jnp.asarray(rng.randn(B, Sv, 16).astype(np.float32)),
        "visual_pos": jnp.asarray(rng.rand(B, Sv, 4).astype(np.float32)),
    }
    out = jlx.forward(params, batch["input_ids"], batch["attention_mask"],
                      batch["visual_feats"], batch["visual_pos"], cfg=cfg,
                      return_tape=True)
    one_hot = jax.nn.one_hot(jnp.zeros((B,), jnp.int32), 5)
    cam_lang, cam_vis, cams = lxmert_lrp.relprop(
        params, out["tape"], one_hot, out["tape"]["lang_mask"],
        out["tape"]["visn_mask"], cfg)
    _, attn, grads = jlx.capture(params, batch, jnp.zeros((B,), jnp.int32),
                                 cfg)
    tt, ti = elx.generate_ours_lrp(cams, grads)
    assert tt.shape == (B, St, St) and ti.shape == (B, St, Sv)
    tt, ti = elx.generate_partial_lrp(cams)
    assert tt.shape == (B, St, St) and ti.shape == (B, St, Sv)
    tt, ti = elx.generate_transformer_att(cams, grads)
    assert tt.shape == (B, St, St) and ti.shape == (B, St, Sv)
    assert np.isfinite(np.asarray(ti)).all()
