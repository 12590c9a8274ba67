"""MMF VisualBERT checkpoint loader (the 5th published weight family).

The MMF tarballs (``visual_bert.finetuned.vqa2.from_coco_train``)
contain a torch ``model.ckpt`` whose keys are prefixed ``model.bert...``
/ ``model.classifier...`` with the visio-linguistic embedding extras
(mmf pretrained_state_mapping semantics, mmf/utils/checkpoint.py:367+).
Converts onto models/visual_bert's pytree.
"""

from __future__ import annotations

import tarfile
from typing import Any, Dict, Mapping

import jax.numpy as jnp


def _strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    out = {}
    for k, v in sd.items():
        for pre in ("model.", "module."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def visual_bert_from_state_dict(sd: Mapping[str, Any], cfg):
    """MMF visual_bert state dict → models/visual_bert params."""
    from transformer_mm_explainability_tpu.utils import convert

    sd = _strip_prefixes(sd)
    np_ = convert._np
    lin = convert._lin
    ln = convert._ln
    emb = "bert.embeddings"
    params: Dict[str, Any] = {
        "embeddings": {
            "word": jnp.asarray(np_(sd[f"{emb}.word_embeddings.weight"])),
            "position": jnp.asarray(
                np_(sd[f"{emb}.position_embeddings.weight"])),
            "token_type": jnp.asarray(
                np_(sd[f"{emb}.token_type_embeddings.weight"])),
            "ln": ln(sd, f"{emb}.LayerNorm"),
        },
        "visual": {
            "projection": dict(zip(
                ("w", "b"),
                (jnp.asarray(x) for x in lin(sd, f"{emb}.projection")))),
            "token_type": jnp.asarray(
                np_(sd[f"{emb}.token_type_embeddings_visual.weight"])),
            "position": jnp.asarray(
                np_(sd[f"{emb}.position_embeddings_visual.weight"])),
        },
        "encoder": convert.bert_encoder_from_state_dict(
            sd, cfg.bert.num_hidden_layers, prefix="bert.encoder.layer"),
        "pooler": dict(zip(
            ("w", "b"),
            (jnp.asarray(x) for x in lin(sd, "bert.pooler.dense")))),
    }
    tw, tb = lin(sd, "classifier.0.dense")
    cw, cb = lin(sd, "classifier.1")
    params["head"] = {
        "transform": {"w": jnp.asarray(tw), "b": jnp.asarray(tb),
                      "ln": ln(sd, "classifier.0.LayerNorm")},
        "classifier": {"w": jnp.asarray(cw), "b": jnp.asarray(cb)},
    }
    return params


def load_visual_bert(path: str, cfg=None):
    """Load an MMF visual_bert checkpoint (.ckpt/.pth, or a tarball
    containing one) → (params, VisualBERTConfig)."""
    import torch

    from transformer_mm_explainability_tpu.models.visual_bert import (
        VISUAL_BERT_VQA2,
    )

    cfg = cfg or VISUAL_BERT_VQA2
    if path.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(path) as tf:
            member = next(m for m in tf.getmembers()
                          if m.name.endswith((".ckpt", ".pth", ".pt")))
            f = tf.extractfile(member)
            sd = torch.load(f, map_location="cpu")
    else:
        sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return visual_bert_from_state_dict(sd, cfg), cfg
