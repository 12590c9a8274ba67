"""VisualBERT pretraining head (masked LM + seq relationship)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import visual_bert as vb


def _tiny():
    cfg = vb.VisualBERTConfig(
        bert=jbert.BertConfig(vocab_size=50, hidden_size=16,
                              num_hidden_layers=2, num_attention_heads=2,
                              intermediate_size=32,
                              max_position_embeddings=40),
        visual_embedding_dim=8, num_labels=7)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return cfg, vb.init_params(k1, cfg), vb.init_pretrain_params(k2, cfg)


def test_pretrain_forward_shapes_and_label_extension():
    cfg, params, head = _tiny()
    rng = np.random.RandomState(0)
    B, S_t, N_v = 3, 10, 5
    input_ids = jnp.asarray(rng.randint(1, 49, (B, S_t)))
    input_mask = jnp.asarray(np.ones((B, S_t), np.int32))
    vis = jnp.asarray(rng.randn(B, N_v, 8).astype(np.float32))
    labels = np.full((B, S_t), -1, np.int32)
    labels[:, 2] = 7  # one masked position per row
    out = vb.pretrain_forward(params, head, input_ids, input_mask,
                              visual_embeddings=vis,
                              masked_lm_labels=jnp.asarray(labels),
                              cfg=cfg)
    assert out["logits"].shape == (B, S_t + N_v, 50)
    assert out["seq_relationship"].shape == (B, 2)
    assert np.isfinite(float(out["masked_lm_loss"]))
    assert float(out["loss"]) == float(out["masked_lm_loss"])

    # visual span must be ignored: flooding it with garbage labels is
    # impossible by construction (labels only cover S_t), and an
    # all-ignored batch yields 0 loss, not NaN
    out0 = vb.pretrain_forward(params, head, input_ids, input_mask,
                               visual_embeddings=vis,
                               masked_lm_labels=jnp.asarray(
                                   np.full((B, S_t), -1, np.int32)),
                               cfg=cfg)
    assert float(out0["masked_lm_loss"]) == 0.0


def test_masked_lm_loss_matches_torch_ce():
    torch = pytest.importorskip("torch")
    cfg, params, head = _tiny()
    rng = np.random.RandomState(1)
    B, S_t = 2, 8
    input_ids = jnp.asarray(rng.randint(1, 49, (B, S_t)))
    input_mask = jnp.asarray(np.ones((B, S_t), np.int32))
    labels = rng.randint(-1, 49, (B, S_t)).astype(np.int32)
    out = vb.pretrain_forward(params, head, input_ids, input_mask,
                              masked_lm_labels=jnp.asarray(labels),
                              cfg=cfg)
    # torch oracle: CrossEntropyLoss(ignore_index=-1) over the same
    # logits/labels (visual_bert.py:211, 268-274)
    logits_t = torch.tensor(np.asarray(out["logits"], np.float32))
    loss_t = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        logits_t.view(-1, 50), torch.tensor(labels.astype(np.int64)).view(-1))
    np.testing.assert_allclose(float(out["masked_lm_loss"]),
                               float(loss_t), rtol=1e-5)


def test_decoder_tied_to_word_embeddings():
    cfg, params, head = _tiny()
    rng = np.random.RandomState(2)
    input_ids = jnp.asarray(rng.randint(1, 49, (1, 6)))
    input_mask = jnp.asarray(np.ones((1, 6), np.int32))
    out1 = vb.pretrain_forward(params, head, input_ids, input_mask,
                               cfg=cfg)
    # perturb ONLY the word-embedding table → logits must change even
    # for positions whose input ids are untouched (tied decoder)
    params2 = jax.tree_util.tree_map(lambda x: x, params)
    params2 = dict(params2)
    emb = dict(params2["embeddings"])
    # single-dim bump (a whole-row constant would cancel against the
    # LayerNormed h's zero mean); id 49 is never an input
    emb["word"] = emb["word"].at[49, 0].add(1.0)
    params2["embeddings"] = emb
    out2 = vb.pretrain_forward(params2, head, input_ids, input_mask,
                               cfg=cfg)
    d = np.abs(np.asarray(out1["logits"][..., 49])
               - np.asarray(out2["logits"][..., 49]))
    assert d.max() > 1e-4


def test_prediction_heads_parity_vs_hf():
    """Head math vs transformers' BertPreTrainingHeads with shared
    weights — the exact module the reference deep-copies from
    BertForPreTraining (visual_bert.py:201-210)."""
    torch = pytest.importorskip("torch")
    from transformers.models.bert.modeling_bert import (
        BertPreTrainingHeads)
    from transformers import BertConfig as HFBertConfig

    cfg, params, head = _tiny()
    hf_cfg = HFBertConfig(
        vocab_size=50, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32, hidden_act="gelu")
    torch.manual_seed(0)
    ref = BertPreTrainingHeads(hf_cfg).eval()
    # share weights: torch Linear stores [out, in] → transpose
    t = head["transform"]
    sd = ref.state_dict()
    t["w"] = jnp.asarray(sd["predictions.transform.dense.weight"].numpy().T)
    t["b"] = jnp.asarray(sd["predictions.transform.dense.bias"].numpy())
    t["ln"]["scale"] = jnp.asarray(
        sd["predictions.transform.LayerNorm.weight"].numpy())
    t["ln"]["bias"] = jnp.asarray(
        sd["predictions.transform.LayerNorm.bias"].numpy())
    head["decoder_bias"] = jnp.asarray(sd["predictions.bias"].numpy())
    head["seq_relationship"]["w"] = jnp.asarray(
        sd["seq_relationship.weight"].numpy().T)
    head["seq_relationship"]["b"] = jnp.asarray(
        sd["seq_relationship.bias"].numpy())
    # tie the decoder both ways: HF's decoder weight ← our word table
    with torch.no_grad():
        ref.predictions.decoder.weight.copy_(
            torch.tensor(np.asarray(params["embeddings"]["word"])))
        ref.predictions.decoder.bias.copy_(
            torch.tensor(np.asarray(head["decoder_bias"])))

    rng = np.random.RandomState(3)
    seq = rng.randn(2, 7, 16).astype(np.float32)
    pooled = rng.randn(2, 16).astype(np.float32)

    ref_logits, ref_sr = ref(torch.tensor(seq), torch.tensor(pooled))

    from transformer_mm_explainability_tpu.ops.attention import (
        gelu, layer_norm)

    h = gelu(jnp.asarray(seq) @ t["w"] + t["b"])
    h = layer_norm(h, t["ln"]["scale"], t["ln"]["bias"],
                   cfg.bert.layer_norm_eps)
    logits = h @ params["embeddings"]["word"].T + head["decoder_bias"]
    sr = (jnp.asarray(pooled) @ head["seq_relationship"]["w"]
          + head["seq_relationship"]["b"])
    np.testing.assert_allclose(np.asarray(logits),
                               ref_logits.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sr),
                               ref_sr.detach().numpy(), atol=2e-5)


def test_pretrain_on_masked_coco_batch(tmp_path):
    """End-to-end: masked_coco sample → pretrain loss decreases."""
    import os

    import optax

    from transformer_mm_explainability_tpu.data import masked_datasets

    vocab = {w: i for i, w in enumerate(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"w{i}" for i in range(45)])}
    ann = [{"image_id": i,
            "captions": [f"w{i} w{i+1} w{i+2} w3 w4",
                         f"w{i} w5 w6"]} for i in range(4)]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    rng = np.random.RandomState(0)
    for i in range(4):
        np.save(tmp_path / f"{i}.npy",
                rng.rand(5, 8).astype(np.float32))

    cfg = {"annotations": str(tmp_path / "ann.npy"),
           "features": str(tmp_path), "max_features": 5,
           "processors": {"masked_token_processor": {
               "type": "masked_token",
               "params": {"tokenizer_config": {"vocab": vocab},
                          "max_seq_length": 12,
                          "mask_probability": 0.3, "seed": 4}}},
           "seed": 7, "two_sentence": True}
    ds = masked_datasets.MaskedCOCODataset("masked_coco", cfg, "train")
    batch = {k: np.stack([np.asarray(ds[i][k]) for i in range(4)])
             for k in ("input_ids", "input_mask", "lm_label_ids")}
    feats = np.stack([rng.rand(5, 8).astype(np.float32)
                      for _ in range(4)])

    mcfg, params, head = _tiny()

    def loss_fn(ph):
        out = vb.pretrain_forward(
            ph["p"], ph["h"], jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["input_mask"]),
            visual_embeddings=jnp.asarray(feats),
            masked_lm_labels=jnp.asarray(batch["lm_label_ids"]),
            cfg=mcfg)
        return out["loss"]

    tx = optax.adam(1e-2)
    state = {"p": params, "h": head}
    opt = tx.init(state)
    step = jax.jit(lambda s, o: _update(s, o, tx, loss_fn))
    l0 = float(loss_fn(state))
    for _ in range(6):
        state, opt, loss = step(state, opt)
    assert float(loss) < l0


def test_nlvr2_head_pairing():
    cfg, params, _ = _tiny()
    head = vb.init_nlvr2_head(jax.random.PRNGKey(3), cfg)
    rng = np.random.RandomState(0)
    B, S_t, N_v = 3, 6, 4
    ids = jnp.asarray(rng.randint(1, 49, (2 * B, S_t)))
    mask = jnp.asarray(np.ones((2 * B, S_t), np.int32))
    vis = jnp.asarray(rng.randn(2 * B, N_v, 8).astype(np.float32))
    out = vb.forward_nlvr2(params, head, ids, mask, vis, cfg=cfg)
    assert out["scores"].shape == (B, 2)

    # pairing semantics: rows [:B] pair with rows [B:] — swapping the
    # two halves changes which pooled vector lands in which slot of
    # the concat, so scores must change
    perm = jnp.concatenate([jnp.arange(B, 2 * B), jnp.arange(B)])
    out_sw = vb.forward_nlvr2(params, head, ids[perm], mask[perm],
                              vis[perm], cfg=cfg)
    assert np.abs(np.asarray(out["scores"])
                  - np.asarray(out_sw["scores"])).max() > 1e-5

    # but a within-pair-consistent batch permutation only permutes rows
    rp = jnp.asarray([1, 0, 2])
    out_p = vb.forward_nlvr2(
        params, head,
        jnp.concatenate([ids[:B][rp], ids[B:][rp]]),
        jnp.concatenate([mask[:B][rp], mask[B:][rp]]),
        jnp.concatenate([vis[:B][rp], vis[B:][rp]]), cfg=cfg)
    np.testing.assert_allclose(np.asarray(out_p["scores"]),
                               np.asarray(out["scores"])[np.asarray(rp)],
                               atol=1e-5)


def test_bypass_transformer_mode():
    cfg, params, _ = _tiny()
    extra = vb.init_bypass_layer(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(0)
    B, S_t, N_v = 2, 6, 4
    ids = jnp.asarray(rng.randint(1, 49, (B, S_t)))
    mask = jnp.asarray(np.ones((B, S_t), np.int32))
    vis1 = jnp.asarray(rng.randn(B, N_v, 8).astype(np.float32))
    vis2 = jnp.asarray(rng.randn(B, N_v, 8).astype(np.float32))

    out1 = vb.forward_bypass(params, extra, ids, mask, vis1, cfg=cfg)
    out2 = vb.forward_bypass(params, extra, ids, mask, vis2, cfg=cfg)
    assert out1["sequence_output"].shape == (B, S_t + N_v, 16)
    # the 12-layer stack saw ONLY text: its attention maps are
    # visual-independent...
    np.testing.assert_allclose(np.asarray(out1["text_attn"]),
                               np.asarray(out2["text_attn"]), atol=1e-6)
    assert out1["text_attn"].shape[-1] == S_t  # text-only span
    # ...but the additional joint layer mixes the visuals in
    d = np.abs(np.asarray(out1["sequence_output"][:, :S_t])
               - np.asarray(out2["sequence_output"][:, :S_t]))
    assert d.max() > 1e-6
    assert out1["joint_attn"].shape[-1] == S_t + N_v


def test_image_text_alignment_embeddings():
    torch = pytest.importorskip("torch")
    cfg, params, _ = _tiny()
    rng = np.random.RandomState(0)
    B, S_t, N_v, A = 2, 8, 3, 2
    ids = jnp.asarray(rng.randint(1, 49, (B, S_t)))
    vis = jnp.asarray(rng.randn(B, N_v, 8).astype(np.float32))
    ita = np.array([[[0, 3], [2, -1], [-1, -1]],
                    [[1, -1], [4, 5], [6, -1]]], np.int32)

    x_none = vb.embed(params, ids, None, vis, None, cfg)
    x_ali = vb.embed(params, ids, None, vis, None, cfg,
                     image_text_alignment=jnp.asarray(ita))
    # text span identical; visual span shifted by the mean TEXT
    # position embeddings of each box's aligned words
    np.testing.assert_allclose(np.asarray(x_none[:, :S_t]),
                               np.asarray(x_ali[:, :S_t]), atol=1e-6)
    assert np.abs(np.asarray(x_none[:, S_t:])
                  - np.asarray(x_ali[:, S_t:])).max() > 1e-4

    # oracle for the mean rule (embeddings.py:373-395): all-pad rows
    # average position-0 embeddings times zero mask → contribute the
    # masked sum 0 / 1 = 0 (plus the row-0 visual embedding both paths
    # share) → equal to the no-alignment embedding
    np.testing.assert_allclose(np.asarray(x_ali[0, S_t + 2]),
                               np.asarray(x_none[0, S_t + 2]), atol=1e-6)


def _update(state, opt, tx, loss_fn):
    loss, grads = jax.value_and_grad(loss_fn)(state)
    updates, opt = tx.update(grads, opt, state)
    import optax

    return optax.apply_updates(state, updates), opt, loss
