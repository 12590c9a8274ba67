"""DETR augmentation transforms (C37, DETR/datasets/transforms.py):
hand-computed oracles for box/mask bookkeeping + pipeline invariants."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from transformer_mm_explainability_tpu.data import detr_transforms as T  # noqa: E402


def _target():
    return {
        "boxes": np.array([[10.0, 10.0, 30.0, 40.0],
                           [50.0, 5.0, 90.0, 25.0]], np.float32),
        "labels": np.array([1, 2]),
        "area": np.array([600.0, 800.0], np.float32),
        "iscrowd": np.array([0, 0]),
        "masks": np.zeros((2, 60, 100), bool),
    }


def test_crop_shifts_clamps_and_filters():
    img = np.random.RandomState(0).rand(60, 100, 3).astype(np.float32)
    t = _target()
    t["masks"][0, 10:40, 10:30] = True
    t["masks"][1, 5:25, 50:90] = True
    # crop region (i=0, j=0, h=45, w=45): box 2 clamps to x∈[45,45] → dropped
    out_img, out_t = T.crop(img, t, (0, 0, 45, 45))
    assert out_img.shape == (45, 45, 3)
    assert out_t["boxes"].shape == (1, 4)
    np.testing.assert_allclose(out_t["boxes"][0], [10, 10, 30, 40])
    assert out_t["labels"].tolist() == [1]
    assert out_t["area"][0] == pytest.approx(20 * 30)
    assert out_t["masks"].shape == (1, 45, 45)


def test_hflip_involution_and_boxes():
    img = np.random.RandomState(1).rand(60, 100, 3).astype(np.float32)
    t = _target()
    f_img, f_t = T.hflip(img, t)
    np.testing.assert_allclose(f_t["boxes"][0], [70, 10, 90, 40])
    ff_img, ff_t = T.hflip(f_img, f_t)
    np.testing.assert_allclose(ff_img, img)
    np.testing.assert_allclose(ff_t["boxes"], t["boxes"])


def test_resize_aspect_and_max_size():
    # reference get_size_with_aspect_ratio semantics (transforms.py:79-97)
    assert T.get_size_with_aspect_ratio((60, 100), 50) == (50, 83)
    assert T.get_size_with_aspect_ratio((100, 60), 50) == (83, 50)
    # max_size caps the longest edge
    oh, ow = T.get_size_with_aspect_ratio((500, 1000), 800,
                                          max_size=1333)
    assert max(oh, ow) <= 1334 and ow > oh
    img = np.random.RandomState(2).rand(60, 100, 3).astype(np.float32)
    t = _target()
    out_img, out_t = T.resize(img, t, 30)
    assert out_img.shape == (30, 50, 3)
    np.testing.assert_allclose(out_t["boxes"],
                               t["boxes"] * 0.5, atol=1e-5)
    np.testing.assert_allclose(out_t["area"], t["area"] * 0.25,
                               atol=1e-3)
    assert out_t["masks"].shape == (2, 30, 50)


def test_pad_and_normalize():
    img = np.ones((4, 6, 3), np.float32)
    t = {"boxes": np.array([[1.0, 1.0, 5.0, 3.0]], np.float32)}
    p_img, p_t = T.pad(img, dict(t), (2, 3))
    assert p_img.shape == (7, 8, 3)
    assert p_img[6, 7, 0] == 0.0
    n_img, n_t = T.Normalize()(p_img, p_t)
    # cxcywh normalized by the PADDED size
    np.testing.assert_allclose(n_t["boxes"][0],
                               [3 / 8, 2 / 7, 4 / 8, 2 / 7], atol=1e-6)


def test_make_coco_transforms_pipeline():
    rs = np.random.RandomState(3)
    img = (rs.rand(480, 640, 3) * 255).astype(np.uint8)
    t = {
        "boxes": np.array([[100.0, 100.0, 300.0, 360.0]], np.float32),
        "labels": np.array([5]),
        "area": np.array([200.0 * 260.0], np.float32),
        "iscrowd": np.array([0]),
    }
    for image_set in ("train", "val"):
        tf = T.make_coco_transforms(image_set, seed=7)
        out_img, out_t = tf(img.copy(), dict(t))
        assert out_img.dtype == np.float32
        if len(out_t["boxes"]):
            assert (out_t["boxes"] >= -1e-6).all()
            assert (out_t["boxes"] <= 1.0 + 1e-6).all()
    with pytest.raises(ValueError):
        T.make_coco_transforms("test2")
    # seeded determinism
    a = T.make_coco_transforms("train", seed=9)(img.copy(), dict(t))
    b = T.make_coco_transforms("train", seed=9)(img.copy(), dict(t))
    np.testing.assert_allclose(a[0], b[0])
