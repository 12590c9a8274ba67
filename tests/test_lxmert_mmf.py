"""lxmert-old (VisualBERT/mmf/models/lxmert.py:633-774) — the MMF-side
LXMERT wrapper: classification / pretraining heads over the existing
parity-tested encoder, plus registry coverage of the four round-2 gap
names (VERDICT #3)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.models import lxmert as lx  # noqa: E402
from transformer_mm_explainability_tpu.models import lxmert_mmf as lo  # noqa: E402

TINY = lx.LxmertConfig(
    vocab_size=50, hidden_size=16, num_attention_heads=2,
    intermediate_size=32, max_position_embeddings=32, l_layers=2,
    x_layers=2, r_layers=1, visual_feat_dim=8, num_qa_labels=6)


def _batch(B=2, St=5, Sv=3, seed=0):
    rs = np.random.RandomState(seed)
    return {
        "input_ids": jnp.asarray(rs.randint(0, TINY.vocab_size, (B, St))),
        "input_mask": jnp.ones((B, St), jnp.int32),
        "segment_ids": jnp.zeros((B, St), jnp.int32),
        "image_feature_0": jnp.asarray(
            rs.randn(B, Sv, TINY.visual_feat_dim).astype(np.float32)),
        "bbox": jnp.asarray(rs.rand(B, Sv, 4).astype(np.float32)),
    }


def test_registry_has_round2_gap_names():
    """VERDICT round 2 #3: lxmert-old (lxmert.py:633), pythia_image_only
    (pythia.py:340), pythia_question_only (:314), multihead (:368)."""
    from transformer_mm_explainability_tpu.zoo import registry
    names = registry.list("model")
    for name in ("lxmert-old", "pythia_image_only", "pythia_question_only",
                 "multihead"):
        assert name in names


def test_classification_forward_vqa():
    cfg = lo.LxmertOldConfig(lxmert=TINY, training_head_type="vqa2",
                             num_labels=7)
    params = lo.init_params(jax.random.PRNGKey(0), cfg)
    out = lo.forward(params, _batch(), cfg)
    assert out["scores"].shape == (2, 7)
    assert np.isfinite(np.asarray(out["scores"])).all()


def test_classification_nlvr2_pairs_pooled():
    """nlvr2 concatenates the two image-pair pooled vectors before the
    2-way head (lxmert.py:117-119, 624-625): batch 4 → 2 pair scores."""
    cfg = lo.LxmertOldConfig(lxmert=TINY, training_head_type="nlvr2")
    params = lo.init_params(jax.random.PRNGKey(0), cfg)
    out = lo.forward(params, _batch(B=4), cfg)
    assert out["scores"].shape == (2, 2)


def test_classification_head_matches_torch():
    """The BertVisualAnswerHead logit_fc stack (Linear → GeLU → LN →
    Linear, lxmert.py:133-139) matches a torch composition with shared
    weights."""
    torch = pytest.importorskip("torch")
    D, out_dim = 16, 7
    head = lo._init_logit_fc(jax.random.PRNGKey(1), D, D, out_dim,
                             jnp.float32)
    tfc = torch.nn.Sequential(
        torch.nn.Linear(D, D * 2), torch.nn.GELU(),
        torch.nn.LayerNorm(D * 2, eps=1e-12), torch.nn.Linear(D * 2, out_dim))
    with torch.no_grad():
        tfc[0].weight.copy_(torch.tensor(np.asarray(head["w1"]).T))
        tfc[0].bias.copy_(torch.tensor(np.asarray(head["b1"])))
        tfc[2].weight.copy_(torch.tensor(np.asarray(head["ln"]["scale"])))
        tfc[2].bias.copy_(torch.tensor(np.asarray(head["ln"]["bias"])))
        tfc[3].weight.copy_(torch.tensor(np.asarray(head["w2"]).T))
        tfc[3].bias.copy_(torch.tensor(np.asarray(head["b2"])))
    x = np.random.RandomState(2).randn(3, D).astype(np.float32)
    want = tfc(torch.tensor(x)).detach().numpy()
    got = lo._logit_fc_fwd(head, jnp.asarray(x), 1e-12)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def test_pretraining_losses_all_tasks():
    """LXMERTForPretraining.forward (lxmert.py:462-558): all four task
    losses appear when their labels are present, are scalars, finite."""
    cfg = lo.LxmertOldConfig(lxmert=TINY, num_labels=6, gqa_labels=4,
                             num_object_labels=10)
    params = lo.init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(3)
    B, St, Sv = 2, 5, 3
    batch = _batch(B, St, Sv)
    batch.update({
        "masked_lm_labels": jnp.asarray(
            np.where(rs.rand(B, St) < 0.5,
                     rs.randint(0, TINY.vocab_size, (B, St)), -1)),
        "matched_label": jnp.asarray(rs.randint(0, 2, (B,))),
        "obj_labels": jnp.asarray(rs.rand(B, Sv, 10).astype(np.float32)),
        "masked_image_labels": jnp.asarray(rs.randint(0, 2, (B, Sv))),
        "ans": jnp.asarray(rs.rand(B, 6).astype(np.float32)),
    })
    out = lo.forward(params, batch, cfg)
    for key in ("answer_loss", "masked_lm_loss", "matched_loss",
                "visn_loss"):
        assert key in out, key
        assert out[key].shape == ()
        assert np.isfinite(float(out[key]))
    # gqa twin head (lxmert.py:141-146): name routes to the gqa head,
    # whose answer space is gqa_labels-sized
    batch_gqa = dict(batch, ans=jnp.asarray(rs.rand(B, 4).astype(np.float32)))
    out_gqa = lo.forward_pretraining(params, batch_gqa, cfg, name="gqa")
    assert np.isfinite(float(out_gqa["answer_loss"]))


def test_pretraining_absent_labels_skip_tasks():
    """None-label guards (lxmert.py:501-520): tasks without labels are
    absent from the output dict, like the reference."""
    cfg = lo.LxmertOldConfig(lxmert=TINY)
    params = lo.init_params(jax.random.PRNGKey(0), cfg)
    out = lo.forward(params, _batch(), cfg)
    assert out == {}


def test_masked_ce_matches_torch_ignore_index():
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(4)
    logits = rs.randn(6, 9).astype(np.float32)
    labels = np.array([1, -1, 3, -1, 0, 8])
    want = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.tensor(logits), torch.tensor(labels)).item()
    got = float(lo._masked_ce(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - want) < 1e-5
