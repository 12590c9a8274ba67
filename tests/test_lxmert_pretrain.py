"""LXMERT pretraining heads/losses smoke + gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import lxmert as jlx
from transformer_mm_explainability_tpu.models import lxmert_pretrain as pre

CFG = jlx.LxmertConfig(
    vocab_size=50, hidden_size=32, num_attention_heads=4,
    intermediate_size=48, max_position_embeddings=20,
    l_layers=2, x_layers=1, r_layers=1,
    visual_feat_dim=16, visual_pos_dim=4, num_qa_labels=7)


def make_batch(B=2, St=8, Sv=5):
    rng = np.random.RandomState(0)
    lm_labels = np.full((B, St), -100, np.int32)
    lm_labels[:, 2] = rng.randint(0, 50, B)
    obj_labels = np.full((B, Sv), -100, np.int32)
    obj_labels[:, :3] = rng.randint(0, 30, (B, 3))
    return {
        "input_ids": jnp.asarray(rng.randint(1, 50, (B, St))),
        "attention_mask": jnp.asarray(np.ones((B, St), np.int64)),
        "visual_feats": jnp.asarray(rng.randn(B, Sv, 16).astype(np.float32)),
        "visual_pos": jnp.asarray(rng.rand(B, Sv, 4).astype(np.float32)),
        "masked_lm_labels": jnp.asarray(lm_labels),
        "obj_labels": jnp.asarray(obj_labels),
        "feat_targets": jnp.asarray(rng.randn(B, Sv, 16).astype(np.float32)),
        "feat_mask": jnp.asarray(np.ones((B, Sv), np.float32)),
        "matched_label": jnp.asarray([1, 0]),
        "ans": jnp.asarray([3, -100]),
    }


def test_pretrain_loss_and_grads():
    params = jlx.init_params(jax.random.PRNGKey(0), CFG)
    heads = pre.init_head_params(jax.random.PRNGKey(1), CFG,
                                 num_object_labels=30)
    batch = make_batch()
    (total, losses), grads = jax.value_and_grad(
        lambda p, h: pre.pretrain_loss(p, h, batch, CFG),
        argnums=(0, 1), has_aux=True)(params, heads)
    assert np.isfinite(float(total))
    for k in ("masked_lm", "obj_predict", "feat_regress", "matched", "qa"):
        assert np.isfinite(float(losses[k])), k
    # tied LM decoder → word embedding gets gradient from the LM loss
    g_word = np.asarray(grads[0]["embeddings"]["word"])
    assert np.abs(g_word).sum() > 0
    g_match = np.asarray(grads[1]["matching"]["w"])
    assert np.abs(g_match).sum() > 0
