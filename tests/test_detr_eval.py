"""End-to-end DETR explanation-segmentation eval on a synthetic
mini-COCO (random weights — exercises the full protocol plumbing)."""

import dataclasses
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from transformer_mm_explainability_tpu.data.coco import CocoDetection
from transformer_mm_explainability_tpu.harness import detr_eval, detr_segm
from transformer_mm_explainability_tpu.models import detr as jdetr
from transformer_mm_explainability_tpu.models import detr_segm_heads

CFG = jdetr.DETRConfig(num_classes=5, num_queries=6, d_model=32, nheads=4,
                       num_encoder_layers=1, num_decoder_layers=1,
                       dim_feedforward=64)


@pytest.fixture(scope="module")
def mini_coco(tmp_path_factory):
    d = tmp_path_factory.mktemp("coco")
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for i in range(2):
        h, w = 96, 128
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i}.jpg")
        images.append({"id": i, "height": h, "width": w,
                       "file_name": f"img{i}.jpg"})
        annotations.append({
            "id": 100 + i, "image_id": i, "category_id": 1 + i % 2,
            "iscrowd": 0, "bbox": [10, 10, 40, 30],
            "segmentation": [[10, 10, 50, 10, 50, 40, 10, 40]],
        })
    data = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    path = d / "instances.json"
    path.write_text(json.dumps(data))
    return CocoDetection(str(path), image_root=str(d))


def test_detr_eval_end_to_end(mini_coco):
    params = jdetr.init_params(jax.random.PRNGKey(0), CFG)
    segm_cfg = detr_segm.SegmConfig(confidence_threshold=0.0,
                                    max_detections=4)
    result = detr_eval.evaluate(
        params, mini_coco, CFG, segm_cfg, max_images=2, shortest=64,
        printer=lambda *a: None)
    # the full COCOeval 12-stat vector
    for k in ("AP", "AP50", "AP75", "AP_small", "AP_medium", "AP_large",
              "AR_1", "AR_10", "AR_100"):
        assert k in result
        assert result[k] == -1.0 or 0.0 <= result[k] <= 1.0


def test_prepare_image_shapes():
    raw = (np.random.RandomState(1).rand(100, 140, 3) * 255).astype(np.uint8)
    img, valid = detr_eval.prepare_image(raw, shortest=64, longest=128)
    assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0
    v = np.asarray(valid)
    assert v.max() == 1.0 and v.min() == 0.0  # padded region exists


def test_segm_heads():
    rng = np.random.RandomState(2)
    B, Qn, D, H, W, heads = 1, 3, 32, 8, 8, 4
    q = jnp.asarray(rng.randn(B, Qn, D).astype(np.float32))
    feat = jnp.asarray(rng.randn(B, H, W, D).astype(np.float32))
    p_attn = {"q_w": jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1),
              "q_b": jnp.zeros(D),
              "k_w": jnp.asarray(rng.randn(D, D).astype(np.float32) * 0.1),
              "k_b": jnp.zeros(D)}
    maps = detr_segm_heads.mh_attention_map(p_attn, q, feat, heads)
    assert maps.shape == (B, Qn, heads, H, W)
    np.testing.assert_allclose(
        np.asarray(maps.reshape(B, Qn, heads, -1).sum(-1)), 1.0, atol=1e-5)

    # mask head: one conv stage, no FPN skips
    C_in = D + heads
    p_head = {
        "convs": [{
            "w": jnp.asarray(rng.randn(3, 3, C_in, 16).astype(np.float32) * 0.1),
            "b": jnp.zeros(16),
            "gn_scale": jnp.ones(16), "gn_bias": jnp.zeros(16),
        }],
        "adapters": [],
        "out": {"w": jnp.asarray(rng.randn(3, 3, 16, 1).astype(np.float32) * 0.1),
                "b": jnp.zeros(1)},
    }
    logits = detr_segm_heads.mask_head(p_head, feat, maps, [])
    assert logits.shape == (B * Qn, H, W, 1)
    masks = detr_segm_heads.post_process_segm(logits, (32, 32))
    assert masks.shape == (B * Qn, 32, 32)
    assert set(np.unique(np.asarray(masks))) <= {0.0, 1.0}


@pytest.mark.parametrize("method", [
    # DETR/mask_generator.py:95-115, verbatim
    "ours_with_lrp", "ours_no_lrp", "ablation_no_self_in_10",
    "ablation_no_aggregation", "ours_no_lrp_no_norm", "transformer_att",
    "raw_attn", "attn_gradcam", "rollout", "partial_lrp",
])
def test_segm_method_dispatch(method):
    """Every reference mask-generator method produces finite masks
    through the segm harness."""
    from transformer_mm_explainability_tpu.explain import detr as expl
    assert method in expl.DETR_METHODS

    params = jdetr.init_params(jax.random.PRNGKey(0), CFG)
    img = jnp.asarray(
        np.random.RandomState(0).randn(64, 96, 3).astype(np.float32))
    segm_cfg = detr_segm.SegmConfig(confidence_threshold=0.0,
                                    max_detections=3, method=method)
    out = detr_segm.explain_image(params, img, CFG, segm_cfg)
    assert out["masks"].shape == (3, 64, 96)
    assert np.isfinite(out["masks"]).all()
    assert set(np.unique(out["masks"])) <= {0.0, 1.0}


def test_unknown_segm_method_rejected():
    from transformer_mm_explainability_tpu.explain import detr as expl

    params = jdetr.init_params(jax.random.PRNGKey(0), CFG)
    img = jnp.zeros((64, 96, 3))
    with pytest.raises(ValueError, match="valid"):
        detr_segm.explain_image(
            params, img, CFG,
            detr_segm.SegmConfig(confidence_threshold=0.0,
                                 max_detections=2, method="bogus"))


def test_chunked_explain_matches_single_pass():
    """max_queries_per_pass < K explains in chunks; relevancy rows and
    masks must equal the one-pass result (each pass shares one forward
    via capture_multi, so chunking is pure batching)."""
    params = jdetr.init_params(jax.random.PRNGKey(0), CFG)
    img = jnp.asarray(
        np.random.RandomState(1).randn(64, 96, 3).astype(np.float32))
    base = detr_segm.SegmConfig(confidence_threshold=0.0,
                                max_detections=5, k_buckets=(5,),
                                max_queries_per_pass=32)
    chunked = dataclasses.replace(base, max_queries_per_pass=2)
    a = detr_segm.explain_image(params, img, CFG, base)
    b = detr_segm.explain_image(params, img, CFG, chunked)
    np.testing.assert_array_equal(a["query_idx"], b["query_idx"])
    np.testing.assert_allclose(a["masks"], b["masks"], atol=1e-6)
