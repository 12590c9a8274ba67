"""FRCNN end-to-end parity vs the reference detectron2 port
(lxmert/lxmert/src/modeling_frcnn.py) with shared random weights.

Stages compared (each against the torch model run in-process on CPU):
  res4 features → RPN objectness/deltas → post-NMS proposal set →
  RoIPooled+res5 features → final detection set (boxes, classes, probs,
  attrs, 2048-d ROI features).

The config mirrors the VG checkpoint's semantics (caffe maxpool,
stride_in_1x1, RES5HALVE=False with dilated res5, hidden-512 RPN,
background-last class layout, RoIPool) at a reduced scale so the CPU
run stays fast: ResNet-50 stages, 20 classes, 7 attrs, small topk.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

torch = pytest.importorskip("torch")

from transformer_mm_explainability_tpu.models import frcnn as jfrcnn
from transformer_mm_explainability_tpu.utils import convert

H_IMG, W_IMG = 224, 288
NUM_CLASSES, NUM_ATTRS = 20, 7
PRE_NMS, POST_NMS, MAX_DET = 1000, 100, 10


def _ref_config_dict():
    return {
        "model": {"device": "cpu", "max_pool": True,
                  "pixel_mean": [102.9801, 115.9465, 122.7717],
                  "pixel_std": [1.0, 1.0, 1.0]},
        "backbone": {"freeze_at": 3},
        "resnets": {"depth": 50, "norm": "BN", "num_groups": 1,
                    "out_features": ["res4"], "res2_out_channels": 256,
                    "res5_dilation": 1, "stem_out_channels": 64,
                    "stride_in_1x1": True, "width_per_group": 64},
        "anchor_generator": {"sizes": [[32, 64, 128, 256, 512]],
                             "aspect_ratios": [[0.5, 1.0, 2.0]],
                             "offset": 0.0},
        "proposal_generator": {"hidden_channels": 512, "min_size": 0},
        "rpn": {"batch_size_per_image": 256,
                "bbox_reg_weights": (1.0, 1.0, 1.0, 1.0),
                "boundary_thresh": -1, "in_features": ["res4"],
                "iou_labels": [0, -1, 1], "iou_thresholds": [0.3, 0.7],
                "loss_weight": 1.0, "nms_thresh": 0.7,
                "positive_fraction": 0.5,
                "pre_nms_topk_test": PRE_NMS, "pre_nms_topk_train": PRE_NMS,
                "post_nms_topk_test": POST_NMS,
                "post_nms_topk_train": POST_NMS,
                "smooth_l1_beta": 0.0},
        "roi_heads": {"in_features": ["res4"], "iou_labels": [0, 1],
                      "iou_thresholds": [0.5], "nms_thresh_test": 0.5,
                      "num_classes": NUM_CLASSES, "positive_fraction": 0.25,
                      "proposal_append_gt": False,
                      "score_thresh_test": 0.2},
        "roi_box_head": {"attr": True,
                         "bbox_reg_weights": (10.0, 10.0, 5.0, 5.0),
                         # do_nms's arange*K+cls gather requires
                         # per-class regression (see models/frcnn.py)
                         "cls_agnostic_bbox_reg": False,
                         "num_attrs": NUM_ATTRS,
                         "pooler_resolution": 14,
                         "pooler_sampling_ratio": 0,
                         "res5halve": False, "smooth_l1_beta": 0.0},
        "min_detections": 1,
        "max_detections": MAX_DET,
    }


def _jax_config():
    return jfrcnn.FrcnnConfig(
        stages=(3, 4, 6, 3), num_classes=NUM_CLASSES, num_attrs=NUM_ATTRS,
        pre_nms_topk=PRE_NMS, post_nms_topk=POST_NMS,
        max_detections=MAX_DET)


def _randomize(model):
    """Healthy random weights: He-scaled convs/linears, randomized BN
    running stats, spread-out classifier so detection rankings aren't
    decided by fp noise."""
    g = torch.Generator().manual_seed(0)
    for name, p in model.named_parameters():
        if "cell_anchors" in name:  # geometry constants, not weights
            continue
        if p.dim() >= 2:
            fan_in = int(np.prod(p.shape[1:]))
            p.data.normal_(0.0, (2.0 / fan_in) ** 0.5, generator=g)
        else:
            p.data.normal_(0.0, 0.02, generator=g)
    for name, b in model.named_buffers():
        if name.endswith("running_mean"):
            b.data.normal_(0.0, 0.1, generator=g)
        elif name.endswith("running_var"):
            b.data.uniform_(0.8, 1.2, generator=g)
    # spread the class scores and regressed boxes so detection rankings
    # and NMS decisions aren't decided by sub-1e-4 fp noise between
    # near-identical candidates (random nets are position-invariant
    # after mean pooling; real checkpoints don't have this degeneracy)
    sd = model.state_dict()
    sd["roi_heads.box_predictor.cls_score.weight"] *= 48.0
    sd["roi_heads.box_predictor.bbox_pred.weight"] *= 40.0
    sd["proposal_generator.rpn_head.objectness_logits.weight"] *= 4.0
    model.load_state_dict(sd)
    model.eval()


def _install_torchvision_shim():
    """Delegates to the canonical complete shim in tests/_shims.py
    (union of every symbol any reference import needs — round 1's
    per-file partial shims made the suite order-fragile)."""
    from _shims import install_torchvision

    install_torchvision()


@pytest.fixture(scope="module")
def both():
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    _install_torchvision_shim()
    # vqa_utils has module-level imports of download/vis helpers that
    # this image lacks and the Config/GeneralizedRCNN path never calls
    import importlib

    from _shims import ensure_stub

    for name in ("wget", "cv2"):
        ensure_stub(name)

    mf = importlib.import_module("lxmert.lxmert.src.modeling_frcnn")
    vu = importlib.import_module("lxmert.lxmert.src.vqa_utils")

    cfg = vu.Config(_ref_config_dict())
    model = mf.GeneralizedRCNN(cfg)
    _randomize(model)

    rng = np.random.RandomState(3)
    # low-frequency structure + noise: an iid-noise image makes a random
    # net produce near-identical pooled features for translated boxes,
    # so detection ranks degenerate into exact ties
    coarse = np.kron(rng.randn(H_IMG // 16, W_IMG // 16, 3),
                     np.ones((16, 16, 1)))
    img = (coarse * 70.0 + rng.randn(H_IMG, W_IMG, 3) * 25.0
           ).astype(np.float32)
    timg = torch.from_numpy(img.transpose(2, 0, 1))[None]
    sizes = torch.tensor([[H_IMG, W_IMG]])

    jcfg = _jax_config()
    params = convert.frcnn_from_state_dict(model.state_dict(), jcfg)
    return mf, model, timg, sizes, params, img, jcfg


@requires_reference
def test_res4_features(both):
    _, model, timg, _, params, img, jcfg = both
    with torch.no_grad():
        ref = model.backbone(timg)["res4"][0].numpy()          # [C, H, W]
    import jax.numpy as jnp

    got = np.asarray(
        jfrcnn._res4_features(params, jnp.asarray(img)[None], jcfg)[0])
    np.testing.assert_allclose(got.transpose(2, 0, 1), ref,
                               rtol=1e-3, atol=2e-3)


@requires_reference
def test_rpn_head_outputs(both):
    _, model, timg, _, params, img, jcfg = both
    with torch.no_grad():
        feats = model.backbone(timg)
        obj_l, delta_l = model.proposal_generator.rpn_head([feats["res4"]])
        ref_obj = obj_l[0].permute(0, 2, 3, 1).reshape(-1).numpy()
        ref_deltas = (delta_l[0].view(1, -1, 4,
                                      obj_l[0].shape[-2], obj_l[0].shape[-1])
                      .permute(0, 3, 4, 1, 2).reshape(-1, 4).numpy())
    import jax
    import jax.numpy as jnp
    from transformer_mm_explainability_tpu.models import resnet

    rpn = params["rpn"]
    f = jfrcnn._res4_features(params, jnp.asarray(img)[None], jcfg)
    t = jax.nn.relu(resnet.conv(f, rpn["conv"]["w"]) + rpn["conv"]["b"])
    obj = np.asarray((resnet.conv(t, rpn["objectness"]["w"])
                      + rpn["objectness"]["b"])[0]).reshape(-1)
    deltas = np.asarray((resnet.conv(t, rpn["deltas"]["w"])
                         + rpn["deltas"]["b"])[0]).reshape(-1, 4)
    np.testing.assert_allclose(obj, ref_obj, rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(deltas, ref_deltas, rtol=1e-3, atol=2e-3)


@requires_reference
def test_anchor_grid_matches(both):
    _, model, timg, _, _, img, jcfg = both
    with torch.no_grad():
        feats = model.backbone(timg)["res4"]
        ref = model.proposal_generator.anchor_generator([feats])
        ref = ref[0, 0].reshape(-1, 4).numpy()
    got = np.asarray(jfrcnn.anchor_grid(feats.shape[-2], feats.shape[-1],
                                        jcfg))
    np.testing.assert_allclose(got, ref, atol=1e-4)


@requires_reference
def test_post_nms_proposals(both):
    _, model, timg, sizes, params, img, jcfg = both
    with torch.no_grad():
        feats = model.backbone(timg)
        props, logits = model.proposal_generator(timg, sizes, feats)
        ref_boxes = props[0].numpy()                           # sorted desc
        ref_scores = logits[0].numpy()

    import jax.numpy as jnp

    out = jfrcnn.forward(params, jnp.asarray(img), jcfg)
    ok = np.asarray(out["roi_valid"])
    got = np.asarray(out["rois"])[ok]
    got_scores = np.asarray(out["roi_scores"])[ok]
    assert got.shape[0] == ref_boxes.shape[0], (
        f"proposal count {got.shape[0]} vs reference {ref_boxes.shape[0]}")
    n = len(ref_boxes)
    # score-descending score vectors must agree elementwise even where
    # fp noise swaps the rank of two near-tied boxes...
    np.testing.assert_allclose(got_scores, ref_scores, rtol=1e-3, atol=2e-3)
    # ...and ≥97% of the box SET must match exactly (rank flips at the
    # NMS boundary may substitute a couple of borderline boxes)
    d = np.abs(got[:, None, :] - ref_boxes[None, :, :]).max(-1)
    matched = (d.min(axis=1) < 5e-2).sum()
    assert matched >= n - max(2, n // 33), (
        f"only {matched}/{n} proposals found in the reference set")
    # and the confident head must match in exact order
    np.testing.assert_allclose(got[: n // 2], ref_boxes[: n // 2],
                               rtol=1e-3, atol=5e-2)


@requires_reference
def test_roi_head_stack_on_shared_proposals(both):
    """RoIPool → res5 → cls/box/attr heads, elementwise on the
    reference's own proposals — full head-stack parity with no NMS
    tie-breaking in the way."""
    _, model, timg, sizes, params, img, jcfg = both
    with torch.no_grad():
        feats = model.backbone(timg)
        props, _ = model.proposal_generator(timg, sizes, feats)
        obj_l, attr_l, deltas, pooled = model.roi_heads(feats, props)

    import jax
    import jax.numpy as jnp

    jfeats = jfrcnn._res4_features(params, jnp.asarray(img)[None], jcfg)[0]
    jpooled = jfrcnn.roi_pool(jfeats, jnp.asarray(props[0].numpy()),
                              jcfg.pooler_resolution,
                              1.0 / jcfg.feat_stride)
    feat_vec = jfrcnn._res5_head(params, jpooled, jcfg)
    np.testing.assert_allclose(np.asarray(feat_vec), pooled.numpy(),
                               rtol=1e-3, atol=5e-3)
    logits = np.asarray(feat_vec @ params["cls_score"]["w"]
                        + params["cls_score"]["b"])
    np.testing.assert_allclose(logits, obj_l.numpy(), rtol=1e-3, atol=2e-2)
    jdeltas = np.asarray(feat_vec @ params["bbox_pred"]["w"]
                         + params["bbox_pred"]["b"])
    np.testing.assert_allclose(jdeltas, deltas.numpy(),
                               rtol=1e-3, atol=5e-3)
    # attr head (cls embedding of the argmax over ALL classes, bg incl.)
    emb = params["attr_cls_emb"][jnp.argmax(jnp.asarray(logits), -1)]
    ah = jax.nn.relu(jnp.concatenate([feat_vec, emb], -1)
                     @ params["attr_fc"]["w"] + params["attr_fc"]["b"])
    jattr = np.asarray(ah @ params["attr_score"]["w"]
                       + params["attr_score"]["b"])
    np.testing.assert_allclose(jattr, attr_l.numpy(), rtol=1e-3, atol=2e-2)


@requires_reference
def test_final_detections_and_roi_features(both):
    """Final 36-slot output parity. Detection NMS over a random-weight
    net has EXACT score ties (border-clipped duplicates), where both
    implementations' picks are equally valid — so ranks are compared by
    score/class, boxes by set membership, and per-box payloads
    (features/attrs/normalised boxes) on the matched pairs."""
    mf, model, timg, sizes, params, img, jcfg = both
    with torch.no_grad():
        ref = model(timg, image_shapes=sizes,
                    scales_yx=torch.tensor([[1.0, 1.0]]),
                    padding="max_detections", max_detections=MAX_DET,
                    return_tensors="pt", location="cpu")
    n = int(ref["preds_per_image"][0])

    import jax.numpy as jnp

    out = jfrcnn.forward(params, jnp.asarray(img), jcfg)
    n_got = int(np.asarray(out["valid"]).sum())
    assert n_got == n, f"detection count {n_got} vs {n}"

    got_probs = np.asarray(out["obj_probs"])[:n]
    ref_probs = ref["obj_probs"][0, :n].numpy()
    np.testing.assert_allclose(got_probs, ref_probs, rtol=1e-3, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(out["obj_ids"])[:n],
                                  ref["obj_ids"][0, :n].numpy())

    got_boxes = np.asarray(out["boxes"])[:n]
    ref_boxes = ref["boxes"][0, :n].numpy()
    d = np.abs(got_boxes[:, None] - ref_boxes[None]).max(-1)
    match = d.argmin(1)
    is_matched = d[np.arange(n), match] < 5e-2
    assert is_matched.sum() >= max(1, n // 2), (
        f"only {is_matched.sum()}/{n} final boxes found in the "
        f"reference set")
    for i in np.where(is_matched)[0]:
        j = match[i]
        np.testing.assert_allclose(
            np.asarray(out["roi_features"])[i],
            ref["roi_features"][0, j].numpy(), rtol=1e-3, atol=5e-3)
        np.testing.assert_allclose(
            np.asarray(out["normalized_boxes"])[i],
            ref["normalized_boxes"][0, j].numpy(), rtol=1e-3, atol=1e-4)
        assert (int(np.asarray(out["attr_ids"])[i])
                == int(ref["attr_ids"][0, j]))
        np.testing.assert_allclose(
            float(np.asarray(out["attr_probs"])[i]),
            float(ref["attr_probs"][0, j]), rtol=1e-3, atol=1e-4)
    # unmatched ranks must be exact-tie substitutions, not divergence
    for i in np.where(~is_matched)[0]:
        assert abs(got_probs[i] - ref_probs[i]) < 2e-4


def test_roi_pool_matches_torchvision():
    """Isolated RoIPool parity on random boxes (the quantisation and
    empty-bin semantics are the easiest place to silently diverge)."""
    _install_torchvision_shim()
    tv = sys.modules["torchvision"]
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    feats = rng.randn(14, 18, 8).astype(np.float32)
    xy = rng.rand(25, 2, 2) * [[W_IMG], [H_IMG]][0]
    boxes = np.concatenate([xy.min(axis=1), xy.max(axis=1)], axis=1)
    boxes = boxes.astype(np.float32)
    # include degenerate boxes
    boxes[0] = [5.0, 5.0, 5.0, 5.0]
    boxes[1] = [0.0, 0.0, W_IMG, H_IMG]

    tfeats = torch.from_numpy(feats.transpose(2, 0, 1))[None]
    tboxes = torch.cat([torch.zeros(25, 1), torch.from_numpy(boxes)], dim=1)
    ref = tv.ops.roi_pool(tfeats, tboxes, output_size=7,
                          spatial_scale=1.0 / 16).numpy()

    got = np.asarray(jfrcnn.roi_pool(jnp.asarray(feats), jnp.asarray(boxes),
                                     7, 1.0 / 16, chunk=8))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-6)
