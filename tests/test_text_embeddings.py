"""TextEmbedding family completion (C34, mmf/modules/embeddings.py):
MultiHeadImageFeatureEmbedding parity vs torch nn.MultiheadAttention
(kdim/vdim), BiLSTM last-state semantics + the pinned reference crash,
vocab/preextracted/dispatcher coverage."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.models import mmf_layers as L  # noqa: E402


def test_multi_head_image_embedding_parity():
    import torch
    torch.manual_seed(0)
    B, N, E, D, H = 2, 7, 12, 8, 2
    mha = torch.nn.MultiheadAttention(embed_dim=D, num_heads=H,
                                      kdim=E, vdim=E).eval()
    img = np.random.RandomState(1).randn(B, N, E).astype(np.float32)
    q = np.random.RandomState(2).randn(B, D).astype(np.float32)
    # reference forward (embeddings.py:277-282): seq-first layout
    img_t = torch.tensor(img).transpose(0, 1)
    q_t = torch.tensor(q).unsqueeze(1).transpose(0, 1)
    want_out, want_w = mha(q_t, img_t, img_t)
    want_out = want_out.transpose(0, 1).squeeze().detach().numpy()

    sd = mha.state_dict()
    p = {
        "q": {"w": jnp.asarray(sd["q_proj_weight"].numpy()),
              "b": jnp.asarray(sd["in_proj_bias"][:D].numpy())},
        "k": {"w": jnp.asarray(sd["k_proj_weight"].numpy()),
              "b": jnp.asarray(sd["in_proj_bias"][D:2 * D].numpy())},
        "v": {"w": jnp.asarray(sd["v_proj_weight"].numpy()),
              "b": jnp.asarray(sd["in_proj_bias"][2 * D:].numpy())},
        "out": {"w": jnp.asarray(sd["out_proj.weight"].numpy()),
                "b": jnp.asarray(sd["out_proj.bias"].numpy())},
    }
    import jax as _jax
    got_out, got_w = _jax.jit(
        lambda p, i, q: L.multi_head_image_feature_embedding_fwd(
            p, i, q, num_heads=H))(p, jnp.asarray(img), jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(got_out), want_out, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_w),
                               want_w.detach().numpy(), atol=2e-5)


@pytest.mark.parametrize("rnn_type", ["GRU", "LSTM"])
def test_bilstm_last_state(rnn_type):
    p = L.init_bilstm_text_embedding(jax.random.PRNGKey(0), 6, 4,
                                     bidirectional=True,
                                     rnn_type=rnn_type)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 5, 4)
                    .astype(np.float32))
    full = L.bilstm_text_embedding_forward_all(p, x, rnn_type)
    got = L.bilstm_text_embedding_fwd(p, x, rnn_type,
                                      bidirectional=True)
    np.testing.assert_allclose(
        np.asarray(got),
        np.concatenate([np.asarray(full[:, -1, :6]),
                        np.asarray(full[:, 0, 6:])], axis=1))
    p1 = L.init_bilstm_text_embedding(jax.random.PRNGKey(1), 6, 4,
                                      bidirectional=False,
                                      rnn_type=rnn_type)
    got = L.bilstm_text_embedding_fwd(p1, x, rnn_type,
                                      bidirectional=False)
    assert got.shape == (2, 6)


def test_reference_bilstm_nonbidirectional_is_broken():
    """Pin: BiLSTMTextEmbedding.forward (embeddings.py:99-107) reads
    undefined ``self.num_hid`` on the non-bidirectional path."""
    import pathlib
    src = pathlib.Path(
        "/root/reference/VisualBERT/mmf/modules/embeddings.py"
    )
    if not src.exists():
        pytest.skip("reference not mounted")
    text = src.read_text()
    assert "self.num_hid" in text and "num_hid =" not in text


def test_vocab_embedding_and_dispatcher(tmp_path):
    vecs = np.random.RandomState(4).randn(9, 5).astype(np.float32)
    p = L.init_vocab_embedding(jax.random.PRNGKey(0), 9, 5,
                               vectors=vecs)
    out = L.vocab_embedding_fwd(p, jnp.asarray([[1, 2], [0, 8]]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), vecs[1])

    for emb_type, kwargs, x, expect_shape in [
        ("identity", {}, np.ones((2, 3), np.float32), (2, 3)),
        ("torch", {"vocab_size": 9, "embedding_dim": 5},
         np.zeros((2, 4), np.int32), (2, 4, 5)),
        ("bilstm", {"hidden_dim": 6, "embedding_dim": 3},
         np.ones((2, 4, 3), np.float32), (2, 6)),
        ("attention", {"hidden_dim": 6, "embedding_dim": 3,
                       "conv1_out": 4, "conv2_out": 2},
         np.ones((2, 4, 3), np.float32), (2, 12)),
        ("projection", {"in_dim": 3, "out_dim": 7},
         np.ones((2, 3), np.float32), (2, 7)),
    ]:
        params, fwd = L.init_text_embedding(jax.random.PRNGKey(1),
                                            emb_type, **kwargs)
        out = fwd(params, jnp.asarray(x))
        assert out.shape == expect_shape, emb_type

    np.save(tmp_path / "42.npy", np.ones((4,), np.float32))
    params, fwd = L.init_text_embedding(
        jax.random.PRNGKey(2), "preextracted", out_dim=4,
        base_path=str(tmp_path))
    assert fwd(params, [42]).shape == (1, 4)

    with pytest.raises(NotImplementedError):
        L.init_text_embedding(jax.random.PRNGKey(0), "unknown")
