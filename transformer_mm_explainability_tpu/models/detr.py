"""DETR (ResNet backbone + encoder-decoder transformer) with capture.

Re-implements the behaviour of the reference's RelProp-instrumented DETR
(DETR/models/detr.py:22-101, transformer.py:20-548,
position_encoding.py:12-51): post-LN 6+6 transformer at d_model 256 /
8 heads / FFN 2048 / ReLU, sine positional encodings added to q,k (not
v) in the encoder and to decoder queries/memory keys, 100 learned object
queries, class head (num_classes+1) and 3-layer box MLP with sigmoid.

TPU design: NHWC backbone (models/resnet.py), batch-first [B, S, D]
tensors, encoder/decoder layers stacked + scanned, attention capture via
taps on three families (encoder self, decoder self, decoder cross).
Padding is handled with a static-size mask (additive -inf bias), so one
compiled program serves any image in a padded size bucket.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import resnet
from transformer_mm_explainability_tpu.ops.attention import (
    CrossAttentionParams,
    layer_norm,
    multi_head_cross_attention,
)


@dataclasses.dataclass(frozen=True)
class DETRConfig:
    num_classes: int = 91
    num_queries: int = 100
    d_model: int = 256
    nheads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    backbone_channels: int = 2048
    dilation: bool = False  # DC5 variant
    backbone_stages: tuple = (3, 4, 6, 3)  # R50; R101 = (3, 4, 23, 3)


DETR_R50 = DETRConfig()


class DETRTaps(NamedTuple):
    enc_self: jnp.ndarray   # [Le, B, H, S, S]
    dec_self: jnp.ndarray   # [Ld, B, H, Q, Q]
    dec_cross: jnp.ndarray  # [Ld, B, H, Q, S]


def zero_taps(cfg: DETRConfig, B: int, S: int,
              dtype: jnp.dtype = jnp.float32) -> DETRTaps:
    H, Q = cfg.nheads, cfg.num_queries
    return DETRTaps(
        enc_self=jnp.zeros((cfg.num_encoder_layers, B, H, S, S), dtype),
        dec_self=jnp.zeros((cfg.num_decoder_layers, B, H, Q, Q), dtype),
        dec_cross=jnp.zeros((cfg.num_decoder_layers, B, H, Q, S), dtype),
    )


def sine_position_encoding(mask_valid: jnp.ndarray, num_pos_feats: int = 128,
                           temperature: float = 10000.0) -> jnp.ndarray:
    """DETR's normalised sine embedding (position_encoding.py:28-48).

    ``mask_valid``: [B, Hf, Wf] with 1 on VALID pixels (the reference's
    ``not_mask``). Returns [B, Hf, Wf, 2*num_pos_feats] (y-feats then
    x-feats, channel-last).
    """
    not_mask = mask_valid.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack(
        [jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1
    ).reshape(*pos_x.shape[:-1], -1)
    pos_y = jnp.stack(
        [jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1
    ).reshape(*pos_y.shape[:-1], -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def _init_attn(key, D, dtype):
    ks = jax.random.split(key, 4)
    u = lambda k, shape: (jax.random.uniform(k, shape, minval=-1, maxval=1)
                          * (1.0 / jnp.sqrt(shape[0]))).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    return CrossAttentionParams(
        w_q=u(ks[0], (D, D)), b_q=zeros((D,)),
        w_k=u(ks[1], (D, D)), b_k=zeros((D,)),
        w_v=u(ks[2], (D, D)), b_v=zeros((D,)),
        w_out=u(ks[3], (D, D)), b_out=zeros((D,)),
    )


def _init_ln(D, dtype):
    return {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)}


def init_params(key: jax.Array, cfg: DETRConfig = DETR_R50,
                dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    from transformer_mm_explainability_tpu.utils.convert import stack

    D, F = cfg.d_model, cfg.dim_feedforward
    ks = jax.random.split(key, 16)
    u = lambda k, shape, fan: (jax.random.uniform(
        k, shape, minval=-1, maxval=1) / jnp.sqrt(fan)).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)

    def ffn(k):
        k1, k2 = jax.random.split(k)
        return {"w1": u(k1, (D, F), D), "b1": zeros((F,)),
                "w2": u(k2, (F, D), F), "b2": zeros((D,))}

    enc_layers = [
        {"self_attn": _init_attn(k, D, dtype), "norm1": _init_ln(D, dtype),
         "ffn": ffn(k), "norm2": _init_ln(D, dtype)}
        for k in jax.random.split(ks[0], cfg.num_encoder_layers)
    ]
    dec_layers = [
        {"self_attn": _init_attn(k, D, dtype),
         "cross_attn": _init_attn(jax.random.fold_in(k, 1), D, dtype),
         "norm1": _init_ln(D, dtype), "norm2": _init_ln(D, dtype),
         "norm3": _init_ln(D, dtype), "ffn": ffn(jax.random.fold_in(k, 2))}
        for k in jax.random.split(ks[1], cfg.num_decoder_layers)
    ]
    return {
        "backbone": resnet.init_params(ks[2], stages=cfg.backbone_stages,
                                       dtype=dtype),
        "input_proj": {
            "w": u(ks[3], (cfg.backbone_channels, D), cfg.backbone_channels),
            "b": zeros((D,))},
        "query_embed": (jax.random.normal(ks[4], (cfg.num_queries, D))
                        ).astype(dtype),
        "encoder": stack(enc_layers),
        "decoder": stack(dec_layers),
        "decoder_norm": _init_ln(D, dtype),
        "class_embed": {"w": u(ks[5], (D, cfg.num_classes + 1), D),
                        "b": zeros((cfg.num_classes + 1,))},
        "bbox_embed": [
            {"w": u(k, (D, D), D), "b": zeros((D,))}
            for k in jax.random.split(ks[6], 2)
        ] + [{"w": u(ks[7], (D, 4), D), "b": zeros((4,))}],
    }


def _ffn_relu(p, x):
    return jax.nn.relu(x @ p["w1"] + p["b1"]) @ p["w2"] + p["b2"]


def transformer_forward(
    params: Dict[str, Any],
    src: jnp.ndarray,        # [B, S, D] projected features
    pos: jnp.ndarray,        # [B, S, D] positional encoding
    key_padding_bias: Optional[jnp.ndarray],  # [B, 1, 1, S] additive or None
    cfg: DETRConfig,
    taps: DETRTaps,
    return_tape: bool = False,
):
    """Returns (hs [B, Q, D], memory [B, S, D], attn probs[, tape])."""
    B = src.shape[0]
    H = cfg.nheads

    def enc_layer(x, inputs):
        p, tap = inputs
        qk = x + pos
        attn_out, probs = multi_head_cross_attention(
            p["self_attn"], qk, qk, H, mask=key_padding_bias, tap=tap,
            x_v=x,
        )
        x_in = x
        x = layer_norm(x + attn_out, p["norm1"]["scale"], p["norm1"]["bias"])
        x = layer_norm(x + _ffn_relu(p["ffn"], x),
                       p["norm2"]["scale"], p["norm2"]["bias"])
        return x, (probs, x_in)

    memory, (enc_probs, enc_tape) = jax.lax.scan(
        enc_layer, src, (params["encoder"], taps.enc_self))

    query_pos = jnp.broadcast_to(params["query_embed"],
                                 (B,) + params["query_embed"].shape)
    tgt = jnp.zeros_like(query_pos)

    def dec_layer(tgt, inputs):
        p, tap_self, tap_cross = inputs
        tgt_in = tgt
        qk = tgt + query_pos
        attn_out, self_probs = multi_head_cross_attention(
            p["self_attn"], qk, qk, H, tap=tap_self, x_v=tgt)
        tgt = layer_norm(tgt + attn_out, p["norm1"]["scale"], p["norm1"]["bias"])
        q = tgt + query_pos
        k = memory + pos
        attn_out, cross_probs = multi_head_cross_attention(
            p["cross_attn"], q, k, H, mask=key_padding_bias, tap=tap_cross,
            x_v=memory)
        tgt = layer_norm(tgt + attn_out, p["norm2"]["scale"], p["norm2"]["bias"])
        tgt = layer_norm(tgt + _ffn_relu(p["ffn"], tgt),
                         p["norm3"]["scale"], p["norm3"]["bias"])
        return tgt, (self_probs, cross_probs, tgt_in)

    hs, (dec_self_probs, dec_cross_probs, dec_tape) = jax.lax.scan(
        dec_layer, tgt, (params["decoder"], taps.dec_self, taps.dec_cross))
    hs = layer_norm(hs, params["decoder_norm"]["scale"],
                    params["decoder_norm"]["bias"])
    attn = DETRTaps(enc_self=enc_probs, dec_self=dec_self_probs,
                    dec_cross=dec_cross_probs)
    if return_tape:
        tape = {"enc": enc_tape, "dec": dec_tape, "memory": memory,
                "pos": pos, "query_pos": query_pos, "hs_prenorm": None}
        return hs, memory, attn, tape
    return hs, memory, attn


def forward(
    params: Dict[str, Any],
    images: jnp.ndarray,                     # [B, H, W, 3] normalised
    pad_mask: Optional[jnp.ndarray] = None,  # [B, H, W] 1 = valid pixel
    cfg: DETRConfig = DETR_R50,
    taps: Optional[DETRTaps] = None,
) -> Dict[str, Any]:
    """Full DETR. Returns {"pred_logits" [B, Q, C+1], "pred_boxes"
    [B, Q, 4] (cxcywh, sigmoid-normalised), "attn", "feat_hw"}."""
    B, Him, Wim, _ = images.shape
    feats = resnet.forward(params["backbone"], images,
                           dilation_last=cfg.dilation)
    B, Hf, Wf, C = feats.shape
    if pad_mask is None:
        feat_valid = jnp.ones((B, Hf, Wf), jnp.float32)
    else:
        # downsample the pixel validity mask to the feature grid the way
        # the reference does (F.interpolate of the bool mask, misc.py)
        stride_h, stride_w = Him // Hf, Wim // Wf
        feat_valid = pad_mask[:, ::stride_h, ::stride_w][:, :Hf, :Wf]
        feat_valid = feat_valid.astype(jnp.float32)

    pos = sine_position_encoding(feat_valid, cfg.d_model // 2)
    src = feats.reshape(B, Hf * Wf, C) @ params["input_proj"]["w"]
    src = src + params["input_proj"]["b"]
    pos = pos.reshape(B, Hf * Wf, cfg.d_model)
    S = Hf * Wf
    if pad_mask is None:
        bias = None
    else:
        bias = ((1.0 - feat_valid.reshape(B, S)) * -1e9)[:, None, None, :]

    if taps is None:
        taps = zero_taps(cfg, B, S, images.dtype)
    hs, memory, attn = transformer_forward(
        params, src, pos, bias, cfg, taps)

    logits = hs @ params["class_embed"]["w"] + params["class_embed"]["b"]
    x = hs
    for i, lp in enumerate(params["bbox_embed"]):
        x = x @ lp["w"] + lp["b"]
        if i < len(params["bbox_embed"]) - 1:
            x = jax.nn.relu(x)
    boxes = jax.nn.sigmoid(x)
    return {"pred_logits": logits, "pred_boxes": boxes, "attn": attn,
            "feat_hw": (Hf, Wf)}


def capture(
    params: Dict[str, Any],
    images: jnp.ndarray,
    one_hot: jnp.ndarray,  # [B, Q, C+1] target one-hot(s) over pred_logits
    pad_mask: Optional[jnp.ndarray] = None,
    cfg: DETRConfig = DETR_R50,
) -> Tuple[Dict[str, Any], DETRTaps, DETRTaps]:
    """One fwd+bwd for ∂(Σ one_hot ⊙ pred_logits)/∂A on all families.

    Batching per-query explanations = putting several one-hots in the
    B axis (repeat the image) or summing one-hots with disjoint queries
    is NOT equivalent (gradients mix); the DETR harness instead vmaps
    over one-hots — see explain/detr.py.
    """
    B, Him, Wim, _ = images.shape
    stride = 16 if cfg.dilation else 32
    S = (Him // stride) * (Wim // stride)

    def score_fn(taps):
        out = forward(params, images, pad_mask, cfg, taps)
        s = (out["pred_logits"] * one_hot).sum()
        return s, out

    grads, out = jax.grad(score_fn, has_aux=True)(
        zero_taps(cfg, B, S, jnp.float32))
    return out, out["attn"], grads


def capture_multi(
    params: Dict[str, Any],
    image: jnp.ndarray,                 # [H, W, 3] ONE image
    one_hots: jnp.ndarray,              # [K, Q, C+1] per-query targets
    pad_valid: Optional[jnp.ndarray] = None,   # [H, W] 1=valid
    cfg: DETRConfig = DETR_R50,
) -> Tuple[Dict[str, Any], DETRTaps, DETRTaps]:
    """Shared-forward capture for K per-query explanations of ONE image.

    ``capture`` batches K explanations by replicating the image on the
    batch axis — K full forwards (backbone + encoder + decoder) of the
    same pixels. Here the forward runs ONCE (B=1) and the K per-query
    gradients come from a vmapped VJP over the K one-hot cotangents:
    cost = 1 forward + one K-batched backward, and the backward stops
    at the taps, so the backbone is never differentiated. Numerically
    identical: ∂(pred_logits·oh)/∂taps IS the VJP with cotangent oh.
    (TPU-native replacement for the reference's per-detection
    re-forward loop, DETR/mask_generator.py:89-121.)

    Returns ``(out, attn, grads)`` shaped like a K-batched ``capture``
    (taps leaves [L, K, H, ...]); ``out`` leaves keep B=1.
    """
    Him, Wim, _ = image.shape
    stride = 16 if cfg.dilation else 32
    S = (Him // stride) * (Wim // stride)
    K = one_hots.shape[0]
    masks = None if pad_valid is None else pad_valid[None]

    def f(taps):
        out = forward(params, image[None], masks, cfg, taps)
        return out["pred_logits"][0], out

    _, vjp_fn, out = jax.vjp(f, zero_taps(cfg, 1, S, jnp.float32),
                             has_aux=True)
    grads_k = jax.vmap(lambda oh: vjp_fn(oh)[0])(one_hots)
    unbatch = lambda g: jnp.moveaxis(g[:, :, 0], 0, 1)   # → [L, K, H, ...]
    grads = DETRTaps(*(unbatch(g) for g in grads_k))
    bcast = lambda a: jnp.broadcast_to(
        a, (a.shape[0], K) + a.shape[2:])
    attn = DETRTaps(*(bcast(a) for a in out["attn"]))
    return out, attn, grads
