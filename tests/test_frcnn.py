"""FRCNN components: anchors, box transform, NMS, ROIAlign, end-to-end
shape/finiteness (runs a tiny config — the real one loads converted
unc-nlp/frcnn-vg-finetuned weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.models import frcnn

TINY = frcnn.FrcnnConfig(
    stages=(1, 1, 1, 1),
    anchor_sizes=(32, 64),
    aspect_ratios=(1.0,),
    pre_nms_topk=50,
    post_nms_topk=12,
    pooler_resolution=4,
    num_classes=9,
    num_attrs=5,
    max_detections=6,
)


def test_anchor_grid():
    a = np.asarray(frcnn.anchor_grid(2, 3, TINY))
    assert a.shape == (2 * 3 * 2, 4)
    # detectron2 OFFSET=0.0: first cell centre at 0, second at stride
    cx = (a[0, 0] + a[0, 2]) / 2
    cy = (a[0, 1] + a[0, 3]) / 2
    assert cx == pytest.approx(0.0) and cy == pytest.approx(0.0)
    cx2 = (a[2, 0] + a[2, 2]) / 2
    assert cx2 == pytest.approx(TINY.feat_stride)
    # sizes: w*h == size^2
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(np.sort(np.unique(np.round(w * h)))[:2],
                               [32 * 32, 64 * 64])


def test_apply_deltas_identity_and_shift():
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 50.0]])
    out = np.asarray(frcnn.apply_deltas(boxes, jnp.zeros((1, 4)),
                                        (1, 1, 1, 1)))
    np.testing.assert_allclose(out, np.asarray(boxes), atol=1e-5)
    # dx=0.5 shifts centre by 0.5*w
    out = np.asarray(frcnn.apply_deltas(
        boxes, jnp.asarray([[0.5, 0.0, 0.0, 0.0]]), (1, 1, 1, 1)))
    assert (out[0, 0] + out[0, 2]) / 2 == pytest.approx(20 + 10)


def test_nms_fixed():
    boxes = jnp.asarray([
        [0, 0, 10, 10], [1, 1, 11, 11],   # overlapping pair
        [50, 50, 60, 60],                  # isolated
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.95, 0.5])
    idx, ok = frcnn.nms_fixed(boxes, scores, 0.5, 3)
    idx, ok = np.asarray(idx), np.asarray(ok)
    assert list(idx[ok]) == [1, 2]  # best of the pair, then isolated


def test_roi_pool_constant_field():
    """On a constant feature map every ROI pools the constant."""
    feats = jnp.full((16, 16, 3), 2.5)
    boxes = jnp.asarray([[2.0, 2.0, 10.0, 12.0], [0.0, 0.0, 16.0, 16.0]])
    out = np.asarray(frcnn.roi_pool(feats, boxes, 4, 1.0))
    np.testing.assert_allclose(out, 2.5, atol=1e-5)


def test_roi_pool_linear_field():
    """Max pooling of a monotone ramp = the bin's right-edge column
    (RoIPool quantised semantics: box [4,12] → cells 4..12, 9 wide,
    bins of 2.25 cells)."""
    H = W = 16
    ramp = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :, None],
                            (H, W, 1))  # value = x coordinate
    box = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = np.asarray(frcnn.roi_pool(ramp, box, 4, 1.0))[0, :, :, 0]
    # bins along x: [4,7) [6,9) [8,11) [10,13) → maxes 6, 8, 10, 12
    np.testing.assert_allclose(out.mean(axis=0), [6, 8, 10, 12], atol=1e-5)


def test_frcnn_end_to_end_shapes():
    params = frcnn.init_params(jax.random.PRNGKey(0), TINY)
    img = jnp.asarray(
        np.random.RandomState(0).randn(128, 160, 3).astype(np.float32))
    out = frcnn.forward(params, img, TINY)
    M = TINY.max_detections
    assert out["roi_features"].shape == (M, 2048)
    assert out["boxes"].shape == (M, 4)
    assert out["normalized_boxes"].shape == (M, 4)
    nb = np.asarray(out["normalized_boxes"])
    assert np.isfinite(np.asarray(out["roi_features"])).all()
    assert (nb >= 0).all() and (nb <= 1).all()
    assert out["obj_ids"].shape == (M,)
    assert out["attr_ids"].shape == (M,)


def test_preprocess_bgr_mean():
    img = jnp.full((64, 64, 3), 128, jnp.uint8)
    out = np.asarray(frcnn.preprocess(img, target_shortest=32,
                                      longest_cap=64))
    assert out.shape == (32, 32, 3)
    want = 128 - np.asarray([102.9801, 115.9465, 122.7717])
    np.testing.assert_allclose(out[0, 0], want, atol=1e-3)


def test_frcnn_converter_roundtrip():
    """Synthesize a detectron2-layout state dict (the unc-nlp key
    schema) and convert; forward runs and shapes land."""
    import torch

    from transformer_mm_explainability_tpu.utils import convert

    cfg = frcnn.FrcnnConfig(
        stages=(1, 1, 1, 1), anchor_sizes=(32, 64), aspect_ratios=(1.0,),
        pre_nms_topk=40, post_nms_topk=10, pooler_resolution=4,
        num_classes=9, num_attrs=5, max_detections=4)
    torch.manual_seed(0)
    sd = {}

    def conv(p, cout, cin, k, bias=False, norm=True):
        sd[f"{p}.weight"] = torch.randn(cout, cin, k, k) * 0.05
        if bias:
            sd[f"{p}.bias"] = torch.zeros(cout)
        if norm:
            sd[f"{p}.norm.weight"] = torch.ones(cout)
            sd[f"{p}.norm.bias"] = torch.zeros(cout)
            sd[f"{p}.norm.running_mean"] = torch.zeros(cout)
            sd[f"{p}.norm.running_var"] = torch.ones(cout)

    def lin(p, din, dout):
        sd[f"{p}.weight"] = torch.randn(dout, din) * 0.02
        sd[f"{p}.bias"] = torch.zeros(dout)

    conv("backbone.stem.conv1", 64, 3, 7)
    in_ch = 64
    for si in range(3):
        mid = 64 * 2 ** si
        p = f"backbone.res{si+2}.0"
        conv(f"{p}.conv1", mid, in_ch, 1)
        conv(f"{p}.conv2", mid, mid, 3)
        conv(f"{p}.conv3", mid * 4, mid, 1)
        conv(f"{p}.shortcut", mid * 4, in_ch, 1)
        in_ch = mid * 4
    p = "roi_heads.res5.0"
    mid = 512
    conv(f"{p}.conv1", mid, in_ch, 1)
    conv(f"{p}.conv2", mid, mid, 3)
    conv(f"{p}.conv3", 2048, mid, 1)
    conv(f"{p}.shortcut", 2048, in_ch, 1)
    conv("proposal_generator.rpn_head.conv", 1024, 1024, 3,
         bias=True, norm=False)
    conv("proposal_generator.rpn_head.objectness_logits", 2, 1024, 1,
         bias=True, norm=False)
    conv("proposal_generator.rpn_head.anchor_deltas", 8, 1024, 1,
         bias=True, norm=False)
    lin("roi_heads.box_predictor.cls_score", 2048, 10)
    lin("roi_heads.box_predictor.bbox_pred", 2048, 4)
    sd["roi_heads.box_predictor.cls_embedding.weight"] = \
        torch.randn(10, 256) * 0.02
    lin("roi_heads.box_predictor.fc_attr", 2048 + 256, 512)
    lin("roi_heads.box_predictor.attr_score", 512, 6)

    params = convert.frcnn_from_state_dict(sd, cfg)
    img = jnp.asarray(
        np.random.RandomState(0).randn(128, 160, 3).astype(np.float32))
    out = frcnn.forward(params, img, cfg)
    assert out["roi_features"].shape == (4, 2048)
    assert np.isfinite(np.asarray(out["roi_features"])).all()


def test_roi_pool_pallas_matches_xla():
    """ops/roi_pool_pallas (VMEM-resident kernel, interpret mode here)
    must be bit-exact vs the chunked-gather XLA path on random boxes
    incl. tiny / clipped / degenerate ones, and through the padded
    channel-tile path."""
    from transformer_mm_explainability_tpu.ops import roi_pool_pallas as rpp

    rng = np.random.RandomState(0)
    H, W, C, P = 25, 38, 96, 14
    feats = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    scale = 1 / 16.0
    b = rng.rand(11, 4).astype(np.float32)
    x0 = b[:, 0] * W * 14; y0 = b[:, 1] * H * 14
    boxes = np.stack([x0, y0, x0 + b[:, 2] * W * 10,
                      y0 + b[:, 3] * H * 10], 1)
    boxes[0] = [0, 0, 2, 2]                              # tiny
    boxes[1] = [W * 16 - 3, H * 16 - 3, W * 16 + 50, H * 16 + 50]  # clipped
    boxes[2] = [5, 5, 5, 5]                              # degenerate
    boxes = jnp.asarray(boxes)

    want = np.asarray(frcnn.roi_pool(feats, boxes, P, scale))
    got = np.asarray(rpp.roi_pool_pallas(feats, boxes, P, scale))
    np.testing.assert_array_equal(got, want)
    got64 = np.asarray(rpp.roi_pool_pallas(feats, boxes, P, scale,
                                           c_tile=64))
    np.testing.assert_array_equal(got64, want)


def test_frcnn_forward_pallas_roi_impl_matches():
    """cfg.roi_pool_impl='pallas' end-to-end == the default path."""
    import dataclasses

    params = frcnn.init_params(jax.random.PRNGKey(0), TINY)
    img = jnp.asarray(
        np.random.RandomState(5).randn(64, 80, 3).astype(np.float32))
    out_x = frcnn.forward(params, img, TINY)
    out_p = frcnn.forward(
        params, img, dataclasses.replace(TINY, roi_pool_impl="pallas"))
    for k in out_x:
        np.testing.assert_allclose(np.asarray(out_x[k]),
                                   np.asarray(out_p[k]), atol=1e-5,
                                   err_msg=k)


# ---------------------------------------------------------------------------
# nms_blocked == nms_fixed (exact greedy NMS, blocked evaluation)
# ---------------------------------------------------------------------------

def _random_boxes(rng, n, spread=60.0, size=40.0):
    """Clustered boxes with heavy mutual overlap (worst case for the
    fixpoint iteration: long suppression chains)."""
    ctr = rng.uniform(0, spread, (n, 2))
    wh = rng.uniform(4, size, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n,max_out,block", [
    (300, 100, 64),    # many blocks
    (300, 100, 512),   # single padded block
    (40, 100, 32),     # fewer candidates than max_out
])
def test_nms_blocked_matches_fixed(seed, n, max_out, block):
    rng = np.random.RandomState(seed)
    boxes = jnp.asarray(_random_boxes(rng, n))
    scores = jnp.asarray(rng.rand(n).astype(np.float32))
    for thresh in (0.3, 0.7):
        i0, ok0 = frcnn.nms_fixed(boxes, scores, thresh, max_out)
        i1, ok1 = frcnn.nms_blocked(boxes, scores, thresh, max_out,
                                    block=block)
        np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_nms_blocked_ties_valid_and_degenerate():
    rng = np.random.RandomState(7)
    n = 120
    boxes = _random_boxes(rng, n)
    boxes[10:14] = boxes[5]            # identical boxes
    boxes[20] = [3.0, 3.0, 3.0, 9.0]   # zero-area (degenerate)
    boxes[21] = [3.0, 3.0, 3.0, 9.0]
    scores = rng.rand(n).astype(np.float32)
    scores[10:18] = 0.5                # score ties -> first-index pick
    valid = rng.rand(n) > 0.3
    i0, ok0 = frcnn.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                              0.5, 50, valid=jnp.asarray(valid))
    i1, ok1 = frcnn.nms_blocked(jnp.asarray(boxes), jnp.asarray(scores),
                                0.5, 50, valid=jnp.asarray(valid),
                                block=32)
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_nms_blocked_long_chain():
    """A deliberate suppression chain (each box overlaps only its
    neighbour) — the depth-bound case for the within-block fixpoint."""
    n = 64
    # box i spans [i*5, i*5+8): IoU(i, i+1) = 3/13 > 0.2, IoU(i, i+2)=0
    boxes = np.stack([np.arange(n) * 5.0, np.zeros(n),
                      np.arange(n) * 5.0 + 8.0, np.full(n, 10.0)],
                     1).astype(np.float32)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)  # sorted order
    i0, ok0 = frcnn.nms_fixed(jnp.asarray(boxes), jnp.asarray(scores),
                              0.2, n)
    i1, ok1 = frcnn.nms_blocked(jnp.asarray(boxes), jnp.asarray(scores),
                                0.2, n, block=64)
    np.testing.assert_array_equal(np.asarray(ok0), np.asarray(ok1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    # chain semantics: evens survive (odd ones suppressed by neighbour)
    kept = np.asarray(i1)[np.asarray(ok1)]
    assert (kept == np.arange(0, n, 2)).all()


def test_forward_nms_impl_equivalence():
    """frcnn.forward with nms_impl='blocked' == 'argmax' end-to-end."""
    import dataclasses
    rng = np.random.RandomState(3)
    params = frcnn.init_params(jax.random.PRNGKey(0), TINY)
    img = frcnn.preprocess(
        rng.randint(0, 255, (96, 128, 3)).astype(np.uint8),
        target_shortest=64)
    outs = {}
    for impl in ("argmax", "blocked"):
        cfg = dataclasses.replace(TINY, nms_impl=impl)
        outs[impl] = jax.jit(lambda p, im: frcnn.forward(p, im, cfg))(
            params, img)
    for k in outs["argmax"]:
        np.testing.assert_array_equal(np.asarray(outs["argmax"][k]),
                                      np.asarray(outs["blocked"][k]),
                                      err_msg=k)
