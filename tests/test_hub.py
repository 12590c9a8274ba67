"""hub constructors (DETR/hubconf.py): named builders return configs/
params/postprocessors with the right variants."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_mm_explainability_tpu import hub  # noqa: E402


def test_detr_resnet50_builds_and_runs():
    from transformer_mm_explainability_tpu.models import detr as jdetr
    cfg, params, pp = hub.detr_resnet50(return_postprocessor=True)
    assert cfg.backbone_stages == (3, 4, 6, 3) and not cfg.dilation
    assert [len(s) for s in params["backbone"]["layers"]] == [3, 4, 6, 3]
    img = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                      .astype(np.float32))
    out = jdetr.forward(params, img, cfg=cfg)
    assert out["pred_logits"].shape == (1, 100, 92)
    res = pp(out["pred_logits"], out["pred_boxes"],
             jnp.asarray([[64, 64]]))
    assert res["boxes"].shape == (1, 100, 4)


def test_variant_configs():
    cfg, _ = hub.detr_resnet101(seed=1)
    assert cfg.backbone_stages == (3, 4, 23, 3)
    cfg, _ = hub.detr_resnet50_dc5(seed=1)
    assert cfg.dilation
    cfg, params, pp = hub.detr_resnet50_panoptic(
        return_postprocessor=True, num_classes=250)
    assert cfg.num_classes == 250
    out = pp(np.random.RandomState(2).randn(100, 251).astype(np.float32),
             np.random.RandomState(3).randn(100, 8, 8).astype(np.float32),
             processed_size=(32, 32))
    assert out["id_map"].shape == (32, 32)


def test_pretrained_offline_gate():
    with pytest.raises(RuntimeError, match="offline"):
        hub.detr_resnet50(pretrained=True)
