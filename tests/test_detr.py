"""DETR parity: JAX transformer + generator chains vs the reference's
RelProp-instrumented DETR transformer (torch CPU, random weights).

The CNN backbone is tested separately (test shapes + frozen-BN math);
the transformer and the full explanation pipeline are cross-checked
end-to-end on random features.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import REFERENCE, requires_reference

from transformer_mm_explainability_tpu.models import detr as jdetr
from transformer_mm_explainability_tpu.models import resnet as jresnet
from transformer_mm_explainability_tpu.explain import detr as expl_detr
from transformer_mm_explainability_tpu.ops.attention import CrossAttentionParams
from transformer_mm_explainability_tpu.utils import convert

D, HEADS, FFN = 32, 4, 64
LE = LD = 2
S, Q, B = 12, 6, 1

CFG = jdetr.DETRConfig(
    num_classes=7, num_queries=Q, d_model=D, nheads=HEADS,
    num_encoder_layers=LE, num_decoder_layers=LD, dim_feedforward=FFN,
)


def _load_ref_transformer():
    import importlib
    import types

    # torchvision isn't installed; the DETR package __init__ chain pulls
    # util/box_ops (box_area) and backbone (IntermediateLayerGetter) —
    # use the canonical complete shim, removed again after the import so
    # transformers' availability probes never see a fake package.
    from _shims import torchvision_shim

    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    with torchvision_shim():
        mod = importlib.import_module("DETR.models.transformer")
    return mod


def _attn_from_torch(mha) -> CrossAttentionParams:
    """Reference DETR MultiheadAttention (separate q/k/v Linears,
    DETR/modules/layers.py:677-681; the fused-in_proj checkpoint split
    happens only at state-dict load, :711-726) → CrossAttentionParams."""
    g = lambda lin: (lin.weight.detach().numpy().T, lin.bias.detach().numpy())
    wq, bq = g(mha.q_proj)
    wk, bk = g(mha.k_proj)
    wv, bv = g(mha.v_proj)
    wo, bo = g(mha.out_proj)
    return CrossAttentionParams(
        w_q=jnp.asarray(wq), b_q=jnp.asarray(bq),
        w_k=jnp.asarray(wk), b_k=jnp.asarray(bk),
        w_v=jnp.asarray(wv), b_v=jnp.asarray(bv),
        w_out=jnp.asarray(wo), b_out=jnp.asarray(bo),
    )


def _ln(mod):
    return {"scale": jnp.asarray(mod.weight.detach().numpy()),
            "bias": jnp.asarray(mod.bias.detach().numpy())}


def _ffn(l1, l2):
    return {"w1": jnp.asarray(l1.weight.detach().numpy().T),
            "b1": jnp.asarray(l1.bias.detach().numpy()),
            "w2": jnp.asarray(l2.weight.detach().numpy().T),
            "b2": jnp.asarray(l2.bias.detach().numpy())}


@pytest.fixture(scope="module")
def ref_transformer():
    import torch

    mod = _load_ref_transformer()
    torch.manual_seed(4)
    t = mod.Transformer(d_model=D, nhead=HEADS, num_encoder_layers=LE,
                        num_decoder_layers=LD, dim_feedforward=FFN,
                        dropout=0.0).eval()
    return t


@pytest.fixture(scope="module")
def jax_transformer_params(ref_transformer):
    t = ref_transformer
    enc = [
        {"self_attn": _attn_from_torch(l.self_attn), "norm1": _ln(l.norm1),
         "ffn": _ffn(l.linear1, l.linear2), "norm2": _ln(l.norm2)}
        for l in t.encoder.layers
    ]
    dec = [
        {"self_attn": _attn_from_torch(l.self_attn),
         "cross_attn": _attn_from_torch(l.multihead_attn),
         "norm1": _ln(l.norm1), "norm2": _ln(l.norm2), "norm3": _ln(l.norm3),
         "ffn": _ffn(l.linear1, l.linear2)}
        for l in t.decoder.layers
    ]
    return {
        "encoder": convert.stack(enc),
        "decoder": convert.stack(dec),
        "decoder_norm": _ln(t.decoder.norm),
        "query_embed": jnp.asarray(
            np.random.RandomState(0).randn(Q, D).astype(np.float32)),
    }


def make_inputs():
    rng = np.random.RandomState(9)
    src = rng.randn(B, S, D).astype(np.float32)
    pos = rng.randn(B, S, D).astype(np.float32)
    return src, pos


@requires_reference
def test_transformer_parity(ref_transformer, jax_transformer_params):
    import torch

    src, pos = make_inputs()
    q = np.asarray(jax_transformer_params["query_embed"])

    # reference Transformer.forward expects [B, C, H, W]-shaped src; feed
    # the flattened path directly through encoder/decoder like DETR does
    t_src = torch.tensor(src).permute(1, 0, 2)
    t_pos = torch.tensor(pos).permute(1, 0, 2)
    t_q = torch.tensor(q).unsqueeze(1).repeat(1, B, 1)
    tgt = torch.zeros_like(t_q)
    memory = ref_transformer.encoder(
        t_src, src_key_padding_mask=None, pos=t_pos)
    hs = ref_transformer.decoder(
        tgt, memory, memory_key_padding_mask=None, pos=t_pos,
        query_pos=t_q)
    want_hs = hs.detach().numpy()[0].transpose(1, 0, 2)  # [B, Q, D]
    want_mem = memory.detach().numpy().transpose(1, 0, 2)

    got_hs, got_mem, attn = jdetr.transformer_forward(
        jax_transformer_params, jnp.asarray(src), jnp.asarray(pos),
        None, CFG, jdetr.zero_taps(CFG, B, S),
    )
    np.testing.assert_allclose(np.asarray(got_mem), want_mem, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_hs), want_hs, atol=1e-4)

    # attention capture parity
    for i, l in enumerate(ref_transformer.encoder.layers):
        ref_attn = l.self_attn.get_attn().detach().numpy()  # [B*H?,...]
        got = np.asarray(attn.enc_self[i]).reshape(ref_attn.shape)
        np.testing.assert_allclose(got, ref_attn, atol=1e-5,
                                   err_msg=f"enc {i}")
    for i, l in enumerate(ref_transformer.decoder.layers):
        ref_attn = l.multihead_attn.get_attn().detach().numpy()
        got = np.asarray(attn.dec_cross[i]).reshape(ref_attn.shape)
        np.testing.assert_allclose(got, ref_attn, atol=1e-5,
                                   err_msg=f"dec cross {i}")


@requires_reference
def test_generator_chain_parity(ref_transformer, jax_transformer_params):
    """'ours' relevancy chain vs the reference generator math applied to
    the reference transformer's captured A/∇A."""
    import importlib
    import torch

    gen_mod = importlib.import_module("DETR.modules.ExplanationGenerator")

    src, pos = make_inputs()
    q = np.asarray(jax_transformer_params["query_embed"])
    t_src = torch.tensor(src).permute(1, 0, 2)
    t_pos = torch.tensor(pos).permute(1, 0, 2)
    t_q = torch.tensor(q).unsqueeze(1).repeat(1, B, 1)
    tgt = torch.zeros_like(t_q)
    memory = ref_transformer.encoder(t_src, pos=t_pos)
    hs = ref_transformer.decoder(tgt, memory, pos=t_pos, query_pos=t_q)
    score = hs[0, 2, 0, :].sum()  # pretend target: query 2, all dims
    score.backward(retain_graph=True)

    # reference-style python loop on the reference captures
    R_ii = torch.eye(S)
    for l in ref_transformer.encoder.layers:
        cam = gen_mod.avg_heads(l.self_attn.get_attn().detach(),
                                l.self_attn.get_attn_gradients().detach())
        R_ii = R_ii + cam @ R_ii
    R_qq = torch.eye(Q)
    R_qi = torch.zeros(Q, S)
    for l in ref_transformer.decoder.layers:
        cam = gen_mod.avg_heads(l.self_attn.get_attn().detach(),
                                l.self_attn.get_attn_gradients().detach())
        add_qq, add_qi = gen_mod.apply_self_attention_rules(R_qq, R_qi, cam)
        R_qq, R_qi = R_qq + add_qq, R_qi + add_qi
        cam_qi = gen_mod.avg_heads(
            l.multihead_attn.get_attn().detach(),
            l.multihead_attn.get_attn_gradients().detach())
        R_qi = R_qi + gen_mod.apply_mm_attention_rules(R_qq, R_ii, cam_qi)
    want = R_qi.numpy()

    # jax: same scalar via taps on the converted transformer
    def score_fn(taps):
        hs_j, _, attn = jdetr.transformer_forward(
            jax_transformer_params, jnp.asarray(src), jnp.asarray(pos),
            None, CFG, taps)
        return hs_j[0, 2, :].sum(), attn

    grads, attn = jax.grad(score_fn, has_aux=True)(jdetr.zero_taps(CFG, B, S))
    got = expl_detr.relevancy_from_capture(
        jax.tree.map(lambda a: a[:, 0], attn),
        jax.tree.map(lambda a: a[:, 0], grads))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_full_detr_forward_shapes():
    params = jdetr.init_params(jax.random.PRNGKey(0), CFG)
    img = jnp.asarray(
        np.random.RandomState(0).randn(1, 64, 64, 3).astype(np.float32))
    out = jdetr.forward(params, img, cfg=CFG)
    assert out["pred_logits"].shape == (1, Q, CFG.num_classes + 1)
    assert out["pred_boxes"].shape == (1, Q, 4)
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()
    assert out["attn"].enc_self.shape == (LE, 1, HEADS, 4, 4)  # 64/32=2 → S=4


def test_capture_multi_matches_replicated_capture():
    """The shared-forward K-batched VJP (capture_multi) must equal the
    replicated-batch oracle (capture: image repeated K times, one
    one-hot per batch row) on every tap family — pins the vmapped-VJP
    cotangent wiring and the [L, K, H, ...] unbatch axes."""
    params = jdetr.init_params(jax.random.PRNGKey(1), CFG)
    img = jnp.asarray(
        np.random.RandomState(1).randn(64, 64, 3).astype(np.float32))
    tq = jnp.asarray([0, 3, 5])
    tc = jnp.asarray([1, 4, 0])
    oh = expl_detr._one_hots(tq, tc, CFG)
    K = int(tq.shape[0])

    out_m, attn_m, grads_m = jdetr.capture_multi(params, img, oh, None, CFG)
    imgs = jnp.broadcast_to(img[None], (K,) + img.shape)
    out_b, attn_b, grads_b = jdetr.capture(params, imgs, oh, None, CFG)

    np.testing.assert_allclose(np.asarray(out_m["pred_logits"][0]),
                               np.asarray(out_b["pred_logits"][0]),
                               atol=1e-5)
    for name, am, ab in zip(attn_m._fields, attn_m, attn_b):
        np.testing.assert_allclose(np.asarray(am), np.asarray(ab),
                                   atol=1e-5, err_msg=f"attn.{name}")
    for name, gm, gb in zip(grads_m._fields, grads_m, grads_b):
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gb),
                                   atol=1e-5, err_msg=f"grads.{name}")


def test_relprop_cams_vmapped_equals_per_seed():
    """vmapping relprop over the K one-hot seeds must equal K
    independent single-seed relprops — guards against reintroducing a
    batched relprop whose Add-rule renormalisation couples seeds
    (axis-less sums mix relevance across the batch axis)."""
    params = jdetr.init_params(jax.random.PRNGKey(2), CFG)
    img = jnp.asarray(
        np.random.RandomState(2).randn(64, 64, 3).astype(np.float32))
    oh = expl_detr._one_hots(jnp.asarray([1, 4]), jnp.asarray([2, 6]), CFG)
    cams_v = expl_detr._relprop_cams(params, img, oh, CFG)
    for k in range(2):
        cams_1 = expl_detr._relprop_cams(params, img, oh[k:k + 1], CFG)
        for name, cv, c1 in zip(cams_v._fields, cams_v, cams_1):
            np.testing.assert_allclose(
                np.asarray(cv[:, k]), np.asarray(c1[:, 0]), atol=1e-6,
                err_msg=f"cams.{name} seed {k}")


def test_resnet_frozen_bn_math():
    p = {"weight": jnp.asarray([2.0]), "bias": jnp.asarray([1.0]),
         "mean": jnp.asarray([0.5]), "var": jnp.asarray([4.0])}
    x = jnp.ones((1, 2, 2, 1)) * 3.0
    got = np.asarray(jresnet.frozen_bn(x, p))
    want = (3.0 - 0.5) * 2.0 / np.sqrt(4.0 + 1e-5) + 1.0
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resnet50_output_shape():
    params = jresnet.init_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    feats = jresnet.forward(params, x)
    assert feats.shape == (1, 2, 2, 2048)


def test_relevancy_padded_taps_match_tight_block():
    """Padding equivalence of the propagation math itself: taps embedded
    in a padded token axis (padded E-hat rows/cols exactly zero, the
    shape the masked softmax + zero-grad capture produces) + token_valid
    must reproduce the tight-shape computation in the valid block, carry
    exactly zero relevancy in padded columns, and stay NaN-free."""
    L, H, Sr, Sp, Qn = 2, 3, 5, 8, 6
    rng = np.random.RandomState(7)
    pos = lambda *s: rng.rand(*s).astype(np.float32) + 0.1

    enc_a, enc_g = pos(L, H, Sr, Sr), pos(L, H, Sr, Sr)
    dec_a, dec_g = pos(L, H, Qn, Qn), pos(L, H, Qn, Qn)
    crx_a, crx_g = pos(L, H, Qn, Sr), pos(L, H, Qn, Sr)

    def pad_ss(x):
        out = np.zeros((L, H, Sp, Sp), np.float32)
        out[..., :Sr, :Sr] = x
        return jnp.asarray(out)

    def pad_qs(x):
        out = np.zeros((L, H, Qn, Sp), np.float32)
        out[..., :Sr] = x
        return jnp.asarray(out)

    tight = jdetr.DETRTaps(enc_self=jnp.asarray(enc_a),
                           dec_self=jnp.asarray(dec_a),
                           dec_cross=jnp.asarray(crx_a))
    tight_g = jdetr.DETRTaps(enc_self=jnp.asarray(enc_g),
                             dec_self=jnp.asarray(dec_g),
                             dec_cross=jnp.asarray(crx_g))
    padded = jdetr.DETRTaps(enc_self=pad_ss(enc_a),
                            dec_self=jnp.asarray(dec_a),
                            dec_cross=pad_qs(crx_a))
    padded_g = jdetr.DETRTaps(enc_self=pad_ss(enc_g),
                              dec_self=jnp.asarray(dec_g),
                              dec_cross=pad_qs(crx_g))
    tv = jnp.asarray((np.arange(Sp) < Sr).astype(np.float32))

    want = np.asarray(expl_detr.relevancy_from_capture(tight, tight_g))
    got = np.asarray(expl_detr.relevancy_from_capture(
        padded, padded_g, token_valid=tv))
    assert not np.isnan(got).any()
    np.testing.assert_allclose(got[:, :Sr], want, atol=1e-5)
    np.testing.assert_allclose(got[:, Sr:], 0.0, atol=0)
    assert np.abs(want).sum() > 0


def test_generate_ours_padded_image_nan_free():
    """End-to-end padded-image explanation: pad_valid marks a sub-region
    of a 64x64 canvas. Padded encoder tokens have identity R_ii rows
    whose plain eq. 8+9 division is 0/0 — without token_valid one padded
    token NaN-poisons the whole rule-10 addition. With the mask the map
    is NaN-free and padded-token columns carry exactly zero relevancy.
    (At this tiny depth the valid entries are themselves zero — the
    REFERENCE does the same: decoder layer-0 V=0 zeroes the self-attn
    grads, handle_residual(I) NaNs and its isnan-wipe clears the layer's
    cross addition; pinned by the synthetic-taps test above instead.)"""
    params = jdetr.init_params(jax.random.PRNGKey(3), CFG)
    img = np.zeros((64, 64, 3), np.float32)
    img[:32, :64] = np.random.RandomState(3).randn(32, 64, 3)
    pad_valid = jnp.asarray(
        (np.arange(64) < 32)[:, None] * np.ones((1, 64)), jnp.float32)
    tq = jnp.asarray([0, 3])
    tc = jnp.asarray([1, 2])
    R = np.asarray(expl_detr.generate_ours(
        params, jnp.asarray(img), tq, tc, CFG, pad_valid=pad_valid))
    assert R.shape == (2, 4)                      # S = (64/32)*(64/32)
    assert not np.isnan(R).any()
    tv = np.asarray(expl_detr._token_valid(jnp.asarray(img), pad_valid, CFG))
    np.testing.assert_array_equal(tv, [1.0, 1.0, 0.0, 0.0])
    np.testing.assert_allclose(R[:, tv == 0], 0.0, atol=0)
