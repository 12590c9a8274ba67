"""Method DISTINCTNESS: every advertised explanation method must
produce a different map from every other method on the same fixed
random model/input.

tests/test_method_surface.py proves each name *dispatches* to a
per-step accuracy vector; this file pins that no two names silently
share a code path (e.g. an ablation flag that is accepted but ignored
would alias `ours_no_lrp_no_norm` to `ours_no_lrp` and still pass the
surface test).

Where random weights make a family degenerate (DETR's "ours" chain is
parity-faithfully all-zero under the reference's NaN→0 rule-10 guard,
DETR/modules/ExplanationGenerator.py:42), distinctness is pinned at the
strategy level over fixed synthetic (A, ∇A, cam_lrp) tap stacks — the
level at which aliasing would occur.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.harness import pert_runner
from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import visual_bert as vb
from transformer_mm_explainability_tpu.models import lxmert as jlx


def _assert_all_pairs_differ(maps: dict, min_rel_diff: float = 1e-6):
    # RELATIVE threshold: random-weight relprop cams can be ~1e-9 in
    # magnitude (grad·cam products on an untrained head), so an
    # absolute cutoff would mistake "tiny but distinct" for aliased.
    # A genuinely shared code path still yields exactly 0.
    for (na, ma), (nb, mb) in itertools.combinations(maps.items(), 2):
        ma, mb = np.asarray(ma), np.asarray(mb)
        scale = max(np.abs(ma).max(), np.abs(mb).max(), 1e-30)
        diff = float(np.abs(ma - mb).max() / scale)
        assert diff > min_rel_diff, (
            f"methods {na!r} and {nb!r} produced identical maps "
            f"(rel max|Δ|={diff:.2e}) — silently shared code path?")


def _assert_nonzero(maps: dict):
    for name, m in maps.items():
        assert float(np.abs(np.asarray(m)).sum()) > 1e-8, (
            f"method {name!r} produced an all-zero map on random "
            "weights — the distinctness check would be vacuous")


# --------------------------------------------------------------------------
# VisualBERT: all 6 reference names + the ours_with_lrp extension
# --------------------------------------------------------------------------

VB_CFG = vb.VisualBERTConfig(
    bert=jbert.BertConfig(
        vocab_size=60, hidden_size=32, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=48,
        max_position_embeddings=24),
    visual_embedding_dim=16, num_labels=7)


def _vb_batch():
    # seed 3: the one seed in 0..5 where every method's map is finite
    # AND nonzero (attn_gradcam's reference-faithful min-max hits 0/0
    # NaN when GradCAM clamps a whole sample to zero — random-weight
    # artefact, seeds 0-2)
    rng = np.random.RandomState(3)
    return {
        "input_ids": jnp.asarray(rng.randint(1, 59, (2, 8))),
        "input_mask": jnp.asarray(np.ones((2, 8), np.int32)),
        "visual_embeddings": jnp.asarray(
            rng.randn(2, 5, 16).astype(np.float32)),
    }


def test_visualbert_methods_pairwise_distinct():
    params = vb.init_params(jax.random.PRNGKey(3), VB_CFG)
    batch = _vb_batch()
    maps = {}
    for method in pert_runner.VISUALBERT_METHODS + ("ours_with_lrp",):
        runner = pert_runner.VisualBertPerturbationRunner(
            params, VB_CFG, method)
        _, cam = runner.explain_batched(batch)
        maps[method] = cam
    _assert_nonzero(maps)
    # Reference-faithful identity: the VisualBERT copy's rollout skips
    # row normalisation (ExplanationGenerator.py:11-13), so
    # transformer_att over LRP cams IS the "ours" recursion over the
    # same cams — ours_with_lrp must EQUAL transformer_attribution
    # here, and is kept as a named alias for cross-family symmetry.
    np.testing.assert_allclose(
        np.asarray(maps.pop("ours_with_lrp")),
        np.asarray(maps["transformer_attribution"]), rtol=1e-6)
    _assert_all_pairs_differ(maps)


# --------------------------------------------------------------------------
# LXMERT: all 11 reference names
# --------------------------------------------------------------------------

LX_CFG = jlx.LxmertConfig(
    vocab_size=60, hidden_size=32, num_attention_heads=4,
    intermediate_size=48, max_position_embeddings=20,
    l_layers=3, x_layers=2, r_layers=2,
    visual_feat_dim=24, visual_pos_dim=4, num_qa_labels=9)


def _lx_batch():
    rng = np.random.RandomState(1)
    return {
        "input_ids": jnp.asarray(rng.randint(1, 59, (2, 8))),
        "attention_mask": jnp.asarray(np.ones((2, 8), np.int32)),
        "visual_feats": jnp.asarray(
            rng.randn(2, 5, 24).astype(np.float32)),
        "visual_pos": jnp.asarray(rng.rand(2, 5, 4).astype(np.float32)),
    }


def test_lxmert_methods_pairwise_distinct():
    # ablation_no_aggregation is excluded from the real-capture loop:
    # the no-agg overwrite (ExplanationGenerator.py:215-365) replaces
    # R ← E·R instead of R ← R + E·R, so the final map is a PRODUCT of
    # per-layer (∇A⊙A)⁺ matrices with no identity accumulation. On
    # random untrained weights those matrices are ~1e-10 in magnitude
    # and the product underflows fp32 to exact zero (verified: zero for
    # every x_layers in 1..5 on this seed) — a test artifact, not a
    # code bug. The reference's real config (5 x-layers, trained
    # weights, O(0.1) cams) is non-degenerate; the method's
    # distinctness is pinned at strategy level over O(1) synthetic taps
    # in test_lxmert_ours_family_strategy_distinct below, mirroring the
    # DETR treatment of the same degeneracy.
    params = jlx.init_params(jax.random.PRNGKey(1), LX_CFG)
    batch = _lx_batch()
    text_maps, image_maps = {}, {}
    for method in pert_runner.LXMERT_METHODS:
        if method == "ablation_no_aggregation":
            continue
        runner = pert_runner.LxmertPerturbationRunner(
            params, LX_CFG, method)
        _, cam_text, cam_image = runner.explain_batched(batch)
        text_maps[method] = cam_text
        image_maps[method] = cam_image
    _assert_nonzero(image_maps)
    # distinctness on the concatenated (text ∥ image) relevancies:
    # two methods are aliased only if BOTH modality maps coincide
    joint = {m: np.concatenate(
        [np.asarray(text_maps[m]).ravel(), np.asarray(image_maps[m]).ravel()])
        for m in text_maps}
    _assert_all_pairs_differ(joint)


def _lx_taps(seed, Ll=3, Lr=2, Lx=3, B=2, H=4, St=8, Sv=5, positive=True):
    from transformer_mm_explainability_tpu.models.lxmert import LxmertTaps

    rng = np.random.RandomState(seed)
    if positive:
        mk = lambda *sh: jnp.asarray(np.abs(rng.randn(*sh)).astype(np.float32))
    else:
        mk = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32))
    return LxmertTaps(
        lang=mk(Ll, B, H, St, St), visn=mk(Lr, B, H, Sv, Sv),
        x_lang_cross=mk(Lx, B, H, St, Sv), x_visn_cross=mk(Lx, B, H, Sv, St),
        x_lang_self=mk(Lx, B, H, St, St), x_visn_self=mk(Lx, B, H, Sv, Sv))


def test_lxmert_ours_family_strategy_distinct():
    """The 5 'ours'-family variants differ pairwise at the strategy
    level over fixed O(1) positive synthetic taps (no fp32 underflow,
    odd x-layer count so no structural no-agg zero — see
    test_lxmert_no_agg_even_xlayers_structurally_zero)."""
    from transformer_mm_explainability_tpu.explain import lxmert as elx

    attn = _lx_taps(seed=7, positive=True)
    grads = _lx_taps(seed=8, positive=False)
    cams = _lx_taps(seed=9, positive=True)

    def joint(tt_ti):
        tt, ti = tt_ti
        return np.concatenate([np.asarray(tt).ravel(),
                               np.asarray(ti).ravel()])

    maps = {
        "ours_no_lrp": joint(elx.generate_ours(attn, grads)),
        "ours_no_lrp_no_norm": joint(elx.generate_ours(
            attn, grads, normalize_self_attention=False)),
        "ablation_no_self_in_10": joint(elx.generate_ours(
            attn, grads, apply_self_in_rule_10=False)),
        "ablation_no_aggregation": joint(elx.generate_ours_no_agg(
            attn, grads, normalize_self_attention=False)),
        "ours_with_lrp": joint(elx.generate_ours_lrp(cams, grads)),
    }
    _assert_nonzero(maps)
    _assert_all_pairs_differ(maps)


def test_lxmert_no_agg_even_xlayers_structurally_zero():
    """Pin the reference-faithful structural degeneracy of the no-agg
    ablation: the overwrite alternation (R_t_t/R_i_i zeroed on
    even-indexed x-layers, R_t_i/R_i_t on odd ones —
    ExplanationGenerator.py:330-352) makes the final R_t_i EXACTLY zero
    for any even x-layer count, independent of weights, and nonzero for
    odd counts (the reference ships 5)."""
    from transformer_mm_explainability_tpu.explain import lxmert as elx

    for Lx, expect_zero in ((2, True), (4, True), (3, False), (5, False)):
        attn = _lx_taps(seed=11, Lx=Lx, positive=True)
        grads = _lx_taps(seed=12, Lx=Lx, positive=False)
        _, ti = elx.generate_ours_no_agg(
            attn, grads, normalize_self_attention=False)
        total = float(np.abs(np.asarray(ti)).sum())
        if expect_zero:
            assert total == 0.0, (
                f"x_layers={Lx} (even): expected the structural zero, "
                f"got |R_t_i|={total:.3e}")
        else:
            assert total > 1e-6, (
                f"x_layers={Lx} (odd): R_t_i unexpectedly zero")


# --------------------------------------------------------------------------
# DETR: strategy-level distinctness over fixed synthetic tap stacks
# --------------------------------------------------------------------------

def _detr_taps(seed=2, K=2, Le=3, Ld=2, H=2, S=7, Q=5):
    from transformer_mm_explainability_tpu.models.detr import DETRTaps

    rng = np.random.RandomState(seed)
    mk = lambda *sh: jnp.asarray(rng.randn(*sh).astype(np.float32))
    mkp = lambda *sh: jnp.asarray(np.abs(rng.randn(*sh)).astype(np.float32))
    attn = DETRTaps(mkp(Le, K, H, S, S), mkp(Ld, K, H, Q, Q),
                    mkp(Ld, K, H, Q, S))
    grads = DETRTaps(mk(Le, K, H, S, S), mk(Ld, K, H, Q, Q),
                     mk(Ld, K, H, Q, S))
    cams = DETRTaps(mkp(Le, K, H, S, S), mkp(Ld, K, H, Q, Q),
                    mkp(Ld, K, H, Q, S))
    return attn, grads, cams


def test_detr_methods_pairwise_distinct():
    """All 10 DETR method names differ pairwise at the strategy level
    (fixed positive taps — no rule-10 NaN wipe, so every 'ours' variant
    is nonzero and its ablation flags are observable)."""
    from transformer_mm_explainability_tpu.explain import detr as expl

    attn, grads, cams = _detr_taps()
    tq = jnp.asarray([1, 3], jnp.int32)

    def ours(normalize, self10, aggregate, taps):
        return expl._per_example(
            taps, grads,
            lambda a, g: expl.relevancy_from_capture(
                a, g, normalize_self_attention=normalize,
                apply_self_in_rule_10=self10, aggregate=aggregate),
        )[jnp.arange(2), tq]

    maps = {
        "ours_no_lrp": ours(True, True, True, attn),
        "ours_no_lrp_no_norm": ours(False, True, True, attn),
        "ablation_no_self_in_10": ours(True, False, True, attn),
        "ablation_no_aggregation": ours(False, True, False, attn),
        "ours_with_lrp": ours(True, True, True, cams),
        "raw_attn": expl.generate_raw_attn(attn, tq),
        "attn_gradcam": expl.generate_attn_gradcam(attn, grads, tq),
        "rollout": expl.generate_rollout(attn, tq),
        "transformer_att": expl.generate_transformer_att(cams, grads, tq),
        "partial_lrp": expl.generate_partial_lrp(cams, tq),
    }
    _assert_nonzero(maps)
    _assert_all_pairs_differ(maps)


def test_detr_ablation_semantics_pinned():
    """Pin each ablation flag to its reference semantics on a tiny
    hand-checkable chain: no-norm must SKIP eq. 8+9 (both relevancy
    normalisations), no-agg must OVERWRITE instead of accumulate."""
    from transformer_mm_explainability_tpu.explain import detr as expl
    from transformer_mm_explainability_tpu.models.detr import DETRTaps
    from transformer_mm_explainability_tpu.ops import relevancy as rl

    attn, grads, _ = _detr_taps(seed=5, K=1, Le=1, Ld=1, H=1, S=4, Q=3)

    def run(normalize, aggregate):
        return np.asarray(expl._per_example(
            attn, grads,
            lambda a, g: expl.relevancy_from_capture(
                a, g, normalize_self_attention=normalize,
                apply_self_in_rule_10=True, aggregate=aggregate))[0])

    # manual single-layer chain (rules 5,6,7,8+9,10); taps are
    # [L, K, H, S, S] → [0, 0] selects layer 0 / example 0, mean over
    # the head axis
    e = lambda c, g: np.maximum(np.asarray(c) * np.asarray(g), 0).mean(0)
    R_ii = np.eye(4) + e(attn.enc_self[0, 0], grads.enc_self[0, 0]) @ np.eye(4)
    e_qq = e(attn.dec_self[0, 0], grads.dec_self[0, 0])
    R_qq = np.eye(3) + e_qq @ np.eye(3)
    cam_qi = e(attn.dec_cross[0, 0], grads.dec_cross[0, 0])
    hr = lambda R: np.asarray(rl.handle_residual(jnp.asarray(
        R.astype(np.float32))))
    want_norm = hr(R_qq).T @ (cam_qi @ hr(R_ii))        # aggregate: R_qi=0+
    want_nonorm = R_qq.T @ (cam_qi @ R_ii)
    np.testing.assert_allclose(run(True, True),
                               np.nan_to_num(want_norm), rtol=1e-5)
    np.testing.assert_allclose(run(False, True), want_nonorm, rtol=1e-5)
    # no-agg with ONE layer: R_qi = rule-10 add only (overwrite) — same
    # value as aggregate-from-zero here, so pin on a 2-layer chain
    attn2, grads2, _ = _detr_taps(seed=6, K=1, Le=1, Ld=2, H=1, S=4, Q=3)
    agg = np.asarray(expl._per_example(
        attn2, grads2, lambda a, g: expl.relevancy_from_capture(
            a, g, False, True, aggregate=True))[0])
    noagg = np.asarray(expl._per_example(
        attn2, grads2, lambda a, g: expl.relevancy_from_capture(
            a, g, False, True, aggregate=False))[0])
    assert np.abs(agg - noagg).max() > 1e-6


# --------------------------------------------------------------------------
# CLIP: the interpret() start_layer surface (notebook cell 5-6 /
# CLIP/example.py:8-48)
# --------------------------------------------------------------------------

def test_clip_start_layer_surface_distinct():
    """start_layer=-1 (last-layer-only default) must differ from
    start_layer=0 (full chain) on BOTH modalities, and the image/text
    relevancies must each be nonzero — pins that the start_layer
    arguments are actually routed into the two towers' relevancy scans
    rather than accepted and ignored."""
    from transformer_mm_explainability_tpu.explain import clip as eclip
    from transformer_mm_explainability_tpu.models import clip as mclip

    cfg = mclip.CLIPConfig(
        embed_dim=32, image_resolution=32, vision_layers=3,
        vision_width=64, vision_patch_size=16, context_length=12,
        vocab_size=60, transformer_width=64, transformer_heads=2,
        transformer_layers=3)
    params = mclip.init_params(jax.random.PRNGKey(5), cfg)
    rng = np.random.RandomState(5)
    image = jnp.asarray(rng.randn(32, 32, 3).astype(np.float32))
    tokens = np.zeros((2, 12), np.int32)
    for b, n in enumerate((5, 8)):  # 2 texts of different lengths
        tokens[b, 0] = 1
        tokens[b, 1:n] = rng.randint(2, 58, n - 1)
        tokens[b, n] = 59  # EOT = argmax token id (model.py:356)
    tokens = jnp.asarray(tokens)

    variants = {}
    for name, sl, slt in (("default_last_layer", -1, -1),
                          ("full_chain", 0, 0),
                          ("img_full_text_last", 0, -1)):
        R_txt, R_img, logits = eclip.interpret(
            params, image, tokens, cfg,
            start_layer=sl, start_layer_text=slt)
        variants[name] = (np.asarray(R_txt), np.asarray(R_img))

    # both modalities nonzero on every variant
    _assert_nonzero({f"{n}:text": v[0] for n, v in variants.items()})
    _assert_nonzero({f"{n}:image": v[1] for n, v in variants.items()})

    # start_layer routing observable per modality:
    d, f, m = (variants["default_last_layer"], variants["full_chain"],
               variants["img_full_text_last"])
    _assert_all_pairs_differ({"default:text": d[0], "full:text": f[0]})
    _assert_all_pairs_differ({"default:image": d[1], "full:image": f[1]})
    # mixed variant: image side follows start_layer, text follows
    # start_layer_text
    np.testing.assert_allclose(m[1], f[1], rtol=1e-6)
    np.testing.assert_allclose(m[0], d[0], rtol=1e-6)

    # per-text relevancies differ (text b sees its own gradient stack)
    _assert_all_pairs_differ({"text0": d[0][0], "text1": d[0][1]})
    _assert_all_pairs_differ({"img0": d[1][0], "img1": d[1][1]})


# --------------------------------------------------------------------------
# ViT: the 4 single-stream methods
# --------------------------------------------------------------------------

def test_vit_methods_pairwise_distinct():
    from transformer_mm_explainability_tpu.explain import vit as expl_vit
    from transformer_mm_explainability_tpu.models import vit

    cfg = vit.ViTConfig(image_size=32, patch_size=8, width=64, depth=3,
                        num_heads=4, mlp_ratio=4, num_classes=11)
    params = vit.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    targets = jnp.asarray([1, 4], jnp.int32)
    _, attn, grads = vit.capture(params, images, targets, cfg)
    maps = {
        "ours": expl_vit.generate_relevance(params, images, targets, cfg),
        "rollout": expl_vit.generate_rollout(attn),
        "raw_attn": expl_vit.generate_raw_attn(attn),
        "attn_gradcam": expl_vit.generate_attn_gradcam(attn, grads),
    }
    _assert_nonzero(maps)
    _assert_all_pairs_differ(maps)
