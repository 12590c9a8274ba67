"""Published-checkpoint loaders (torch → JAX), SURVEY C35/C26.

``load_clip`` accepts the OpenAI CLIP release artifacts the reference's
``clip.load`` consumes (TorchScript archives or plain state dicts,
CLIP/clip/clip.py:75-163) and returns (params, CLIPConfig).
``load_timm_vit`` handles timm ``vit_base_patch16_224`` checkpoints
(the ViT notebook's model). ``load_lxmert_hf`` handles HF
``unc-nlp/lxmert-vqa-uncased`` state dicts. All torch usage is lazy
(conversion is a host-side, one-time step).
"""

from __future__ import annotations

from typing import Any, Dict


def _torch():
    import torch

    return torch


def _to_state_dict(obj) -> Dict[str, Any]:
    torch = _torch()
    if hasattr(obj, "state_dict"):
        return obj.state_dict()
    if isinstance(obj, dict):
        for key in ("state_dict", "model"):
            if key in obj and isinstance(obj[key], dict):
                return obj[key]
        return obj
    raise TypeError(f"cannot extract a state dict from {type(obj)}")


def load_clip(path: str):
    """OpenAI CLIP .pt (TorchScript archive or state dict) →
    (params, CLIPConfig)."""
    torch = _torch()
    from transformer_mm_explainability_tpu.utils import convert

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = _to_state_dict(torch.load(path, map_location="cpu"))
    return convert.clip_from_state_dict(sd)


def load_timm_vit(path: str):
    """timm vit_base_patch16_224 checkpoint → (params, ViTConfig)."""
    torch = _torch()
    from transformer_mm_explainability_tpu.utils import convert

    sd = _to_state_dict(torch.load(path, map_location="cpu"))
    return convert.vit_from_state_dict(sd)


def load_lxmert_hf(path: str, cfg=None):
    """HF lxmert (e.g. unc-nlp/lxmert-vqa-uncased pytorch_model.bin) →
    (params, cfg) for models/lxmert. ``cfg`` defaults to LXMERT_VQA."""
    torch = _torch()
    from transformer_mm_explainability_tpu.models.lxmert import LXMERT_VQA
    from transformer_mm_explainability_tpu.utils import convert

    cfg = cfg or LXMERT_VQA
    sd = _to_state_dict(torch.load(path, map_location="cpu"))
    return convert.lxmert_from_state_dict(sd, cfg), cfg


def load_detr(path: str, cfg=None):
    """DETR release checkpoint (detr-r50-e632da11.pth style) →
    (params, cfg) for models/detr (backbone + transformer + heads)."""
    torch = _torch()
    from transformer_mm_explainability_tpu.models.detr import DETR_R50
    from transformer_mm_explainability_tpu.utils import convert

    cfg = cfg or DETR_R50
    sd = _to_state_dict(torch.load(path, map_location="cpu"))
    return convert.detr_from_state_dict(sd, cfg), cfg
