"""Named model constructors — the torch.hub surface (C37).

Re-design of ``DETR/hubconf.py``: detr_resnet50(:26),
detr_resnet50_dc5(:42), detr_resnet101(:59), detr_resnet101_dc5(:74),
detr_resnet50_panoptic(:91), detr_resnet50_dc5_panoptic(:117),
detr_resnet101_panoptic(:143) — each returns ``(cfg, params)`` and
optionally the matching post-processor, mirroring
``return_postprocessor``.

``pretrained=True`` loads a local checkpoint path via the published
release schema (``utils/convert.detr_from_state_dict``); the hub
download URL is offline-gated like utils/download.py (zero egress).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax

from transformer_mm_explainability_tpu.models import detr as jdetr
from transformer_mm_explainability_tpu.models.matcher import post_process

R50 = (3, 4, 6, 3)
R101 = (3, 4, 23, 3)


def _make_detr(stages, dilation: bool, num_classes: int,
               pretrained, seed: int) -> Tuple[jdetr.DETRConfig, Dict]:
    cfg = jdetr.DETRConfig(num_classes=num_classes, dilation=dilation,
                           backbone_stages=tuple(stages))
    if pretrained:
        if pretrained is True:
            raise RuntimeError(
                "offline image: pass pretrained=<local .pth path> — "
                "the dl.fbaipublicfiles.com hub URLs are unreachable")
        import torch

        from transformer_mm_explainability_tpu.utils.convert import (
            detr_from_state_dict)
        sd = torch.load(pretrained, map_location="cpu",
                        weights_only=False)
        params = detr_from_state_dict(sd.get("model", sd), cfg)
    else:
        params = jdetr.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, params


def _entry(stages, dilation, default_classes):
    def build(pretrained=False, num_classes=None,
              return_postprocessor: bool = False, seed: int = 0):
        cfg, params = _make_detr(
            stages, dilation, num_classes or default_classes,
            pretrained, seed)
        if return_postprocessor:
            return cfg, params, post_process
        return cfg, params

    return build


detr_resnet50 = _entry(R50, False, 91)
detr_resnet50_dc5 = _entry(R50, True, 91)
detr_resnet101 = _entry(R101, False, 91)
detr_resnet101_dc5 = _entry(R101, True, 91)


def _panoptic_entry(stages, dilation):
    def build(pretrained=False, num_classes: int = 250,
              threshold: float = 0.85,
              return_postprocessor: bool = False, seed: int = 0):
        cfg, params = _make_detr(stages, dilation, num_classes,
                                 pretrained, seed)
        if return_postprocessor:
            from transformer_mm_explainability_tpu.harness.panoptic import (
                post_process_panoptic)
            is_thing_map = {i: i <= 90 for i in range(num_classes)}
            pp = functools.partial(post_process_panoptic,
                                   is_thing_map=is_thing_map,
                                   threshold=threshold)
            return cfg, params, pp
        return cfg, params

    return build


detr_resnet50_panoptic = _panoptic_entry(R50, False)
detr_resnet50_dc5_panoptic = _panoptic_entry(R50, True)
detr_resnet101_panoptic = _panoptic_entry(R101, False)
