"""PyTorch checkpoint → JAX param-pytree converters.

The published weights for every reference workload are torch state
dicts (SURVEY.md §5 "Checkpoint/resume": CLIP .pt archives, timm ViT,
DETR detr-r50 .pth, HF lxmert, MMF visual_bert tarballs). These
converters map them onto this framework's stacked-layer pytrees.

Conventions of the target layout:
  * all linear weights are stored input-major (``x @ w + b``), i.e. the
    transpose of torch's ``[out, in]``;
  * per-layer arrays are stacked along a leading layer axis for
    ``lax.scan`` (one compiled block instead of L);
  * patchify convs become ``[P*P*C, D]`` matmul weights matching
    ``models/vit.patchify``'s (row, col, channel) flattening order;
  * fused qkv stays fused ([D, 3D], q|k|v along columns — torch's
    ``in_proj_weight`` rows are q;k;v, CLIP/clip/auxilary.py in_proj
    convention).

Only numpy/jnp in the conversion path — torch is imported lazily so the
framework itself never depends on it.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping

import numpy as np
import jax.numpy as jnp

from transformer_mm_explainability_tpu.ops.attention import AttentionParams


def _np(t) -> np.ndarray:
    """torch tensor (or array) → float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd: Mapping[str, Any], prefix: str):
    """torch Linear -> (w [in, out], b [out])."""
    return _np(sd[f"{prefix}.weight"]).T, _np(sd[f"{prefix}.bias"])


def _ln(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
    }


def patch_conv_to_matmul(w) -> np.ndarray:
    """Conv [D, C, P, P] (stride=P patchify) → matmul weight [P*P*C, D]."""
    w = _np(w)
    D = w.shape[0]
    return w.transpose(2, 3, 1, 0).reshape(-1, D)


def stack(trees: List[Any]):
    """Stack a list of identical pytrees along a new leading layer axis."""
    import jax

    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *trees)


# ---------------------------------------------------------------------------
# CLIP (reference: CLIP/clip/model.py state dict; build_model :405-442)
# ---------------------------------------------------------------------------

def _clip_tower(sd: Mapping[str, Any], prefix: str, layers: int):
    blocks = []
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}"
        w_out, b_out = _lin(sd, f"{p}.attn.out_proj")
        w1, b1 = _lin(sd, f"{p}.mlp.c_fc")
        w2, b2 = _lin(sd, f"{p}.mlp.c_proj")
        blocks.append({
            "ln1": _ln(sd, f"{p}.ln_1"),
            "attn": AttentionParams(
                w_qkv=jnp.asarray(_np(sd[f"{p}.attn.in_proj_weight"]).T),
                b_qkv=jnp.asarray(_np(sd[f"{p}.attn.in_proj_bias"])),
                w_out=jnp.asarray(w_out),
                b_out=jnp.asarray(b_out),
            ),
            "ln2": _ln(sd, f"{p}.ln_2"),
            "mlp": {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
                    "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)},
        })
    return stack(blocks)


def clip_from_state_dict(sd: Mapping[str, Any], **config_overrides):
    """Convert an OpenAI-CLIP ViT state dict to (params, CLIPConfig).

    Hyperparameters are sniffed from tensor shapes the same way the
    reference's ``build_model`` does (CLIP/clip/model.py:405-430).
    Head counts are not recoverable from shapes (OpenAI CLIP always uses
    width/64); pass ``transformer_heads=...`` etc. as overrides for
    non-standard models.
    """
    import dataclasses as _dc

    from transformer_mm_explainability_tpu.models.clip import CLIPConfig

    if "visual.proj" not in sd:
        return _clip_resnet_from_state_dict(sd, config_overrides)
    vision_width = _np(sd["visual.conv1.weight"]).shape[0]
    patch = _np(sd["visual.conv1.weight"]).shape[-1]
    vision_layers = len({
        k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")
    })
    grid = int(round((_np(sd["visual.positional_embedding"]).shape[0] - 1) ** 0.5))
    cfg = CLIPConfig(
        embed_dim=_np(sd["text_projection"]).shape[1],
        image_resolution=grid * patch,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=patch,
        context_length=_np(sd["positional_embedding"]).shape[0],
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        transformer_width=_np(sd["ln_final.weight"]).shape[0],
        transformer_heads=_np(sd["ln_final.weight"]).shape[0] // 64,
        transformer_layers=len({
            k.split(".")[2] for k in sd
            if k.startswith("transformer.resblocks.")
        }),
    )
    if config_overrides:
        cfg = _dc.replace(cfg, **config_overrides)
    params = {
        "visual": {
            "conv1": jnp.asarray(patch_conv_to_matmul(sd["visual.conv1.weight"])),
            "class_embedding": jnp.asarray(_np(sd["visual.class_embedding"])),
            "positional_embedding": jnp.asarray(
                _np(sd["visual.positional_embedding"])),
            "ln_pre": _ln(sd, "visual.ln_pre"),
            "blocks": _clip_tower(sd, "visual.transformer", cfg.vision_layers),
            "ln_post": _ln(sd, "visual.ln_post"),
            "proj": jnp.asarray(_np(sd["visual.proj"])),
        },
        "text": {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
            "positional_embedding": jnp.asarray(_np(sd["positional_embedding"])),
            "blocks": _clip_tower(sd, "transformer", cfg.transformer_layers),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": jnp.asarray(_np(sd["text_projection"])),
        },
        "logit_scale": jnp.asarray(_np(sd["logit_scale"])),
    }
    return params, cfg


def _clip_resnet_from_state_dict(sd: Mapping[str, Any], config_overrides):
    """RN-family CLIP (build_model's ResNet branch, model.py:409-418):
    stage sizes counted from layerN block keys, width from the stem."""
    import dataclasses as _dc

    from transformer_mm_explainability_tpu.models import clip_resnet
    from transformer_mm_explainability_tpu.models.clip import CLIPConfig

    counts = []
    si = 1
    while f"visual.layer{si}.0.conv1.weight" in sd:
        bi = 0
        while f"visual.layer{si}.{bi}.conv1.weight" in sd:
            bi += 1
        counts.append(bi)
        si += 1
    vision_width = _np(sd["visual.layer1.0.conv1.weight"]).shape[1]
    embed_dim = _np(sd["visual.attnpool.c_proj.weight"]).shape[0]
    spacial = int(round((_np(
        sd["visual.attnpool.positional_embedding"]).shape[0] - 1) ** 0.5))
    cfg = CLIPConfig(
        embed_dim=embed_dim,
        image_resolution=spacial * 32,
        vision_layers=tuple(counts),
        vision_width=vision_width,
        vision_patch_size=32,
        context_length=_np(sd["positional_embedding"]).shape[0],
        vocab_size=_np(sd["token_embedding.weight"]).shape[0],
        transformer_width=_np(sd["ln_final.weight"]).shape[0],
        transformer_heads=_np(sd["ln_final.weight"]).shape[0] // 64,
        transformer_layers=len({
            k.split(".")[2] for k in sd
            if k.startswith("transformer.resblocks.")}),
    )
    if config_overrides:
        cfg = _dc.replace(cfg, **config_overrides)
    params = {
        "visual": clip_resnet.from_state_dict(sd),
        "text": {
            "token_embedding": jnp.asarray(_np(sd["token_embedding.weight"])),
            "positional_embedding": jnp.asarray(
                _np(sd["positional_embedding"])),
            "blocks": _clip_tower(sd, "transformer", cfg.transformer_layers),
            "ln_final": _ln(sd, "ln_final"),
            "text_projection": jnp.asarray(_np(sd["text_projection"])),
        },
        "logit_scale": jnp.asarray(_np(sd["logit_scale"])),
    }
    return params, cfg


# ---------------------------------------------------------------------------
# HF/MMF BERT encoder (q/k/v separate Linears → fused qkv, stacked layers)
# ---------------------------------------------------------------------------

def bert_encoder_from_state_dict(sd: Mapping[str, Any], num_layers: int,
                                 prefix: str = "layer"):
    """Convert an HF-layout BertEncoder state dict
    (``layer.N.attention.self.{query,key,value}`` /
    ``layer.N.attention.output`` / ``layer.N.{intermediate,output}``)
    to the stacked encoder pytree of models/bert.py."""
    layers = []
    for i in range(num_layers):
        p = f"{prefix}.{i}"
        wq, bq = _lin(sd, f"{p}.attention.self.query")
        wk, bk = _lin(sd, f"{p}.attention.self.key")
        wv, bv = _lin(sd, f"{p}.attention.self.value")
        wo, bo = _lin(sd, f"{p}.attention.output.dense")
        w1, b1 = _lin(sd, f"{p}.intermediate.dense")
        w2, b2 = _lin(sd, f"{p}.output.dense")
        layers.append({
            "attn": AttentionParams(
                w_qkv=jnp.asarray(np.concatenate([wq, wk, wv], axis=1)),
                b_qkv=jnp.asarray(np.concatenate([bq, bk, bv])),
                w_out=jnp.asarray(wo), b_out=jnp.asarray(bo),
            ),
            "attn_ln": _ln(sd, f"{p}.attention.output.LayerNorm"),
            "mlp": {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
                    "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)},
            "mlp_ln": _ln(sd, f"{p}.output.LayerNorm"),
        })
    return stack(layers)


def bert_embeddings_from_state_dict(sd: Mapping[str, Any],
                                    prefix: str = "embeddings"):
    """word/position/token_type embeddings + LN → models/bert layout."""
    return {
        "word": jnp.asarray(_np(sd[f"{prefix}.word_embeddings.weight"])),
        "position": jnp.asarray(_np(sd[f"{prefix}.position_embeddings.weight"])),
        "token_type": jnp.asarray(
            _np(sd[f"{prefix}.token_type_embeddings.weight"])),
        "ln": _ln(sd, f"{prefix}.LayerNorm"),
    }


# ---------------------------------------------------------------------------
# LXMERT (HF lxmert layout, incl. the reference's lxmert_lrp naming)
# ---------------------------------------------------------------------------

def _cross_attn(sd: Mapping[str, Any], att_prefix: str, out_prefix: str):
    """LxmertAttention (query/key/value) + LxmertAttentionOutput →
    CrossAttentionParams + LN dict."""
    from transformer_mm_explainability_tpu.ops.attention import (
        CrossAttentionParams,
    )

    wq, bq = _lin(sd, f"{att_prefix}.query")
    wk, bk = _lin(sd, f"{att_prefix}.key")
    wv, bv = _lin(sd, f"{att_prefix}.value")
    wo, bo = _lin(sd, f"{out_prefix}.dense")
    return (
        CrossAttentionParams(
            w_q=jnp.asarray(wq), b_q=jnp.asarray(bq),
            w_k=jnp.asarray(wk), b_k=jnp.asarray(bk),
            w_v=jnp.asarray(wv), b_v=jnp.asarray(bv),
            w_out=jnp.asarray(wo), b_out=jnp.asarray(bo),
        ),
        _ln(sd, f"{out_prefix}.LayerNorm"),
    )


def _ffn(sd: Mapping[str, Any], inter_prefix: str, out_prefix: str):
    w1, b1 = _lin(sd, f"{inter_prefix}.dense")
    w2, b2 = _lin(sd, f"{out_prefix}.dense")
    return {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
            "w2": jnp.asarray(w2), "b2": jnp.asarray(b2),
            "ln": _ln(sd, f"{out_prefix}.LayerNorm")}


def lxmert_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """Convert an HF/reference LXMERT state dict (``lxmert.`` prefix
    stripped or present) to the models/lxmert pytree. ``cfg`` is a
    models.lxmert.LxmertConfig (layer counts are taken from it)."""
    if any(k.startswith("lxmert.") for k in sd):
        sd = {(k[len("lxmert."):] if k.startswith("lxmert.") else k): v
              for k, v in sd.items()}

    x_layers = []
    for i in range(cfg.x_layers):
        p = f"encoder.x_layers.{i}"
        cross, cross_ln_lang = _cross_attn(
            sd, f"{p}.visual_attention.att", f"{p}.visual_attention.output")
        # the copy shares weights; its LN is the same module's output LN
        lang_self, lang_self_ln = _cross_attn(
            sd, f"{p}.lang_self_att.self", f"{p}.lang_self_att.output")
        visn_self, visn_self_ln = _cross_attn(
            sd, f"{p}.visn_self_att.self", f"{p}.visn_self_att.output")
        x_layers.append({
            "cross": cross,
            "cross_ln_lang": cross_ln_lang,
            "cross_ln_visn": cross_ln_lang,  # shared output module weights
            "lang_self": lang_self, "lang_self_ln": lang_self_ln,
            "visn_self": visn_self, "visn_self_ln": visn_self_ln,
            "lang_ffn": _ffn(sd, f"{p}.lang_inter", f"{p}.lang_output"),
            "visn_ffn": _ffn(sd, f"{p}.visn_inter", f"{p}.visn_output"),
        })

    fw, fb = _lin(sd, "encoder.visn_fc.visn_fc")
    pw, pb = _lin(sd, "encoder.visn_fc.box_fc")
    pool_w, pool_b = _lin(sd, "pooler.dense")
    a0w, a0b = _lin(sd, "answer_head.logit_fc.0")
    a3w, a3b = _lin(sd, "answer_head.logit_fc.3")
    return {
        "embeddings": bert_embeddings_from_state_dict(sd, "embeddings"),
        "visn_fc": {
            "feat": {"w": jnp.asarray(fw), "b": jnp.asarray(fb)},
            "feat_ln": _ln(sd, "encoder.visn_fc.visn_layer_norm"),
            "pos": {"w": jnp.asarray(pw), "b": jnp.asarray(pb)},
            "pos_ln": _ln(sd, "encoder.visn_fc.box_layer_norm"),
        },
        "lang_layers": bert_encoder_from_state_dict(
            sd, cfg.l_layers, prefix="encoder.layer"),
        "visn_layers": bert_encoder_from_state_dict(
            sd, cfg.r_layers, prefix="encoder.r_layers"),
        "x_layers": stack(x_layers),
        "pooler": {"w": jnp.asarray(pool_w), "b": jnp.asarray(pool_b)},
        "answer_head": {
            "w1": jnp.asarray(a0w), "b1": jnp.asarray(a0b),
            "ln": _ln(sd, "answer_head.logit_fc.2"),
            "w2": jnp.asarray(a3w), "b2": jnp.asarray(a3b),
        },
    }


# ---------------------------------------------------------------------------
# DETR (facebook detr-r50 release layout: torchvision ResNet under
# backbone.0.body.*, torch-MHA fused in_proj in the transformer)
# ---------------------------------------------------------------------------

def _conv_hwio(w) -> jnp.ndarray:
    """torch conv [out, in, kh, kw] → HWIO [kh, kw, in, out]."""
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _frozen_bn(sd, prefix) -> Dict[str, jnp.ndarray]:
    return {
        "weight": jnp.asarray(_np(sd[f"{prefix}.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.bias"])),
        "mean": jnp.asarray(_np(sd[f"{prefix}.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.running_var"])),
    }


def resnet_from_state_dict(sd: Mapping[str, Any], prefix: str = "",
                           stages=(3, 4, 6, 3)) -> Dict[str, Any]:
    """torchvision ResNet (with (frozen)BN) → models/resnet pytree."""
    g = lambda k: sd[f"{prefix}{k}"]
    params: Dict[str, Any] = {
        "conv1": {"w": _conv_hwio(g("conv1.weight"))},
        "bn1": _frozen_bn(sd, f"{prefix}bn1"),
        "layers": [],
    }
    for si, n_blocks in enumerate(stages):
        blocks = []
        for bi in range(n_blocks):
            p = f"{prefix}layer{si + 1}.{bi}"
            blk = {
                "conv1": {"w": _conv_hwio(sd[f"{p}.conv1.weight"])},
                "bn1": _frozen_bn(sd, f"{p}.bn1"),
                "conv2": {"w": _conv_hwio(sd[f"{p}.conv2.weight"])},
                "bn2": _frozen_bn(sd, f"{p}.bn2"),
                "conv3": {"w": _conv_hwio(sd[f"{p}.conv3.weight"])},
                "bn3": _frozen_bn(sd, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "w": _conv_hwio(sd[f"{p}.downsample.0.weight"])}
                blk["downsample_bn"] = _frozen_bn(sd, f"{p}.downsample.1")
            blocks.append(blk)
        params["layers"].append(blocks)
    return params


def _mha_from_in_proj(sd: Mapping[str, Any], prefix: str):
    """torch MultiheadAttention fused in_proj → CrossAttentionParams
    (the same split the reference performs at load,
    DETR/modules/layers.py:711-726)."""
    from transformer_mm_explainability_tpu.ops.attention import (
        CrossAttentionParams,
    )

    w = _np(sd[f"{prefix}.in_proj_weight"])
    b = _np(sd[f"{prefix}.in_proj_bias"])
    D = w.shape[1]
    wq, wk, wv = w[:D], w[D:2 * D], w[2 * D:]
    bq, bk, bv = b[:D], b[D:2 * D], b[2 * D:]
    wo, bo = _lin(sd, f"{prefix}.out_proj")
    return CrossAttentionParams(
        w_q=jnp.asarray(wq.T), b_q=jnp.asarray(bq),
        w_k=jnp.asarray(wk.T), b_k=jnp.asarray(bk),
        w_v=jnp.asarray(wv.T), b_v=jnp.asarray(bv),
        w_out=jnp.asarray(wo), b_out=jnp.asarray(bo),
    )


def detr_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """facebook/detr release checkpoint → models/detr pytree."""
    def ffn(p):
        w1, b1 = _lin(sd, f"{p}.linear1")
        w2, b2 = _lin(sd, f"{p}.linear2")
        return {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
                "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)}

    enc = []
    for i in range(cfg.num_encoder_layers):
        p = f"transformer.encoder.layers.{i}"
        enc.append({
            "self_attn": _mha_from_in_proj(sd, f"{p}.self_attn"),
            "norm1": _ln(sd, f"{p}.norm1"), "norm2": _ln(sd, f"{p}.norm2"),
            "ffn": ffn(p),
        })
    dec = []
    for i in range(cfg.num_decoder_layers):
        p = f"transformer.decoder.layers.{i}"
        dec.append({
            "self_attn": _mha_from_in_proj(sd, f"{p}.self_attn"),
            "cross_attn": _mha_from_in_proj(sd, f"{p}.multihead_attn"),
            "norm1": _ln(sd, f"{p}.norm1"), "norm2": _ln(sd, f"{p}.norm2"),
            "norm3": _ln(sd, f"{p}.norm3"), "ffn": ffn(p),
        })
    cw, cb = _lin(sd, "class_embed")
    bbox = []
    for i in range(3):
        w, b = _lin(sd, f"bbox_embed.layers.{i}")
        bbox.append({"w": jnp.asarray(w), "b": jnp.asarray(b)})
    ip_w = _np(sd["input_proj.weight"])[:, :, 0, 0]  # [D, C, 1, 1]
    return {
        "backbone": resnet_from_state_dict(sd, "backbone.0.body."),
        "input_proj": {"w": jnp.asarray(ip_w.T),
                       "b": jnp.asarray(_np(sd["input_proj.bias"]))},
        "query_embed": jnp.asarray(_np(sd["query_embed.weight"])),
        "encoder": stack(enc),
        "decoder": stack(dec),
        "decoder_norm": _ln(sd, "transformer.decoder.norm"),
        "class_embed": {"w": jnp.asarray(cw), "b": jnp.asarray(cb)},
        "bbox_embed": bbox,
    }


# ---------------------------------------------------------------------------
# Faster R-CNN (unc-nlp/frcnn-vg-finetuned — detectron2-port layout:
# backbone.stem + backbone.res2-4, roi_heads.res5, proposal_generator.
# rpn_head.{conv,objectness_logits,anchor_deltas}, roi_heads.
# box_predictor.{cls_score,bbox_pred,cls_embedding,fc_attr,attr_score};
# Conv2d norms are FrozenBatchNorm at ``.norm.*``
# (lxmert/src/modeling_frcnn.py:779-1667)
# ---------------------------------------------------------------------------

def _d2_bn(sd, prefix) -> Dict[str, jnp.ndarray]:
    return {
        "weight": jnp.asarray(_np(sd[f"{prefix}.norm.weight"])),
        "bias": jnp.asarray(_np(sd[f"{prefix}.norm.bias"])),
        "mean": jnp.asarray(_np(sd[f"{prefix}.norm.running_mean"])),
        "var": jnp.asarray(_np(sd[f"{prefix}.norm.running_var"])),
    }


def _d2_block(sd, p) -> Dict[str, Any]:
    blk = {
        "conv1": {"w": _conv_hwio(sd[f"{p}.conv1.weight"])},
        "bn1": _d2_bn(sd, f"{p}.conv1"),
        "conv2": {"w": _conv_hwio(sd[f"{p}.conv2.weight"])},
        "bn2": _d2_bn(sd, f"{p}.conv2"),
        "conv3": {"w": _conv_hwio(sd[f"{p}.conv3.weight"])},
        "bn3": _d2_bn(sd, f"{p}.conv3"),
    }
    if f"{p}.shortcut.weight" in sd:
        blk["downsample"] = {"w": _conv_hwio(sd[f"{p}.shortcut.weight"])}
        blk["downsample_bn"] = _d2_bn(sd, f"{p}.shortcut")
    return blk


def _conv_b(sd, p):
    return {"w": _conv_hwio(sd[f"{p}.weight"]),
            "b": jnp.asarray(_np(sd[f"{p}.bias"]))}


def frcnn_from_state_dict(sd: Mapping[str, Any], cfg) -> Dict[str, Any]:
    """unc-nlp/frcnn-vg-finetuned checkpoint → models/frcnn pytree.
    ``cfg`` is a models.frcnn.FrcnnConfig (stage sizes drive the walk)."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}

    layers = []
    for si, n_blocks in enumerate(cfg.stages[:3]):
        stage = f"backbone.res{si + 2}"
        layers.append([_d2_block(sd, f"{stage}.{bi}")
                       for bi in range(n_blocks)])
    layers.append([_d2_block(sd, f"roi_heads.res5.{bi}")
                   for bi in range(cfg.stages[3])])

    cls_w, cls_b = _lin(sd, "roi_heads.box_predictor.cls_score")
    bbox_w, bbox_b = _lin(sd, "roi_heads.box_predictor.bbox_pred")
    attr_fc_w, attr_fc_b = _lin(sd, "roi_heads.box_predictor.fc_attr")
    attr_w, attr_b = _lin(sd, "roi_heads.box_predictor.attr_score")
    return {
        "backbone": {
            "conv1": {"w": _conv_hwio(sd["backbone.stem.conv1.weight"])},
            "bn1": _d2_bn(sd, "backbone.stem.conv1"),
            "layers": layers,
        },
        "rpn": {
            "conv": _conv_b(sd, "proposal_generator.rpn_head.conv"),
            "objectness": _conv_b(
                sd, "proposal_generator.rpn_head.objectness_logits"),
            "deltas": _conv_b(
                sd, "proposal_generator.rpn_head.anchor_deltas"),
        },
        "cls_score": {"w": jnp.asarray(cls_w), "b": jnp.asarray(cls_b)},
        "bbox_pred": {"w": jnp.asarray(bbox_w), "b": jnp.asarray(bbox_b)},
        "attr_cls_emb": jnp.asarray(
            _np(sd["roi_heads.box_predictor.cls_embedding.weight"])),
        "attr_fc": {"w": jnp.asarray(attr_fc_w), "b": jnp.asarray(attr_fc_b)},
        "attr_score": {"w": jnp.asarray(attr_w), "b": jnp.asarray(attr_b)},
    }


# ---------------------------------------------------------------------------
# timm ViT (vit_base_patch16_224 layout — the ViT notebook's model)
# ---------------------------------------------------------------------------

def vit_from_state_dict(sd: Mapping[str, Any]):
    """Convert a timm ``vit_base_patch16_224``-layout state dict
    (patch_embed.proj / blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp} /
    norm / head) to (params, ViTConfig)."""
    from transformer_mm_explainability_tpu.models.vit import ViTConfig

    D = _np(sd["cls_token"]).shape[-1]
    depth = len({k.split(".")[1] for k in sd if k.startswith("blocks.")})
    patch = _np(sd["patch_embed.proj.weight"]).shape[-1]
    S = _np(sd["pos_embed"]).shape[-2]
    grid = int(round((S - 1) ** 0.5))
    num_classes = _np(sd["head.weight"]).shape[0]
    cfg = ViTConfig(
        image_size=grid * patch, patch_size=patch, width=D, depth=depth,
        num_heads=D // 64, num_classes=num_classes,
    )
    blocks = []
    for i in range(depth):
        p = f"blocks.{i}"
        w_qkv, b_qkv = _lin(sd, f"{p}.attn.qkv")
        w_out, b_out = _lin(sd, f"{p}.attn.proj")
        w1, b1 = _lin(sd, f"{p}.mlp.fc1")
        w2, b2 = _lin(sd, f"{p}.mlp.fc2")
        blocks.append({
            "ln1": _ln(sd, f"{p}.norm1"),
            "attn": AttentionParams(
                w_qkv=jnp.asarray(w_qkv), b_qkv=jnp.asarray(b_qkv),
                w_out=jnp.asarray(w_out), b_out=jnp.asarray(b_out),
            ),
            "ln2": _ln(sd, f"{p}.norm2"),
            "mlp": {"w1": jnp.asarray(w1), "b1": jnp.asarray(b1),
                    "w2": jnp.asarray(w2), "b2": jnp.asarray(b2)},
        })
    head_w, head_b = _lin(sd, "head")
    params = {
        "patch_embed": {
            "w": jnp.asarray(patch_conv_to_matmul(sd["patch_embed.proj.weight"])),
            "b": jnp.asarray(_np(sd["patch_embed.proj.bias"])),
        },
        "cls_token": jnp.asarray(_np(sd["cls_token"]).reshape(1, D)),
        "pos_embed": jnp.asarray(_np(sd["pos_embed"]).reshape(S, D)),
        "blocks": stack(blocks),
        "norm": _ln(sd, "norm"),
        "head": {"w": jnp.asarray(head_w), "b": jnp.asarray(head_b)},
    }
    return params, cfg
