"""DETR LRP reverse pass (relprop).

Mirrors the reference chain DETR.relprop (models/detr.py:79-92: one-hot
→ class head → transformer) → TransformerDecoder.relprop
(transformer.py:166-198: reversed layers, per-layer memory cams summed
by a Clone over memory) → TransformerEncoder.relprop (:104-111).

Per-layer semantics (transformer.py forward_post_relprop :255-276
encoder, :417-439 decoder) with the reference DETR MultiheadAttention
relprop (modules/layers.py:769-801):
  * out_proj α-β → einsum2 split (probs/value) halved → attn cam saved
  * softmax/dropout identity; NO mask-add relprop in this variant
  * einsum1 split (q·kᵀ) halved — note q carries the 1/√d scaling
    INSIDE the einsum operand, so the q-side cam inherits that factor
  * q/k/v projection α-β; positional embeds pass cams through untouched
    (WithPosEmbd.relprop = identity, layers.py:107-108)
  * the all-zero-value-cam renormalisation branch (layers.py:786-799)
  * final stream merges: Clone-rule for (q,k) and the 3-way input clone
    in the encoder; the decoder merges its three tgt cams by plain sum
    (transformer.py:436-437).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models.detr import (
    DETRConfig,
    DETRTaps,
    _ffn_relu,
)
from transformer_mm_explainability_tpu.ops import lrp
from transformer_mm_explainability_tpu.ops.attention import (
    CrossAttentionParams,
    _merge_heads,
    _split_heads,
    layer_norm,
)


def mha_relprop(
    p: CrossAttentionParams,
    x_q: jnp.ndarray, x_k: jnp.ndarray, x_v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray],
    R: jnp.ndarray,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DETR-variant attention relprop. Returns
    (cam_q_in, cam_k_in, cam_v_in, attn_cam [B, H, Sq, Sk])."""
    H = num_heads
    # rematerialise with the reference's operand layout: q pre-scaled
    q = _split_heads(x_q @ p.w_q + p.b_q, H)
    dh = q.shape[-1]
    scaling = dh ** -0.5
    q = q * scaling
    k = _split_heads(x_k @ p.w_k + p.b_k, H)
    v = _split_heads(x_v @ p.w_v + p.b_v, H)
    kT = jnp.swapaxes(k, -1, -2)
    scores = q @ kT
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, -1)
    ctx = _merge_heads(probs @ v)

    cam = lrp.linear_alpha_beta(R, ctx, p.w_out, alpha)
    cam = _split_heads(cam, H)
    cam_probs, cam_v = lrp.matmul_relprop(probs, v, cam)
    attn_cam = cam_probs
    # softmax/dropout identity; the reference skips the mask add here
    cam_q, cam_kT = lrp.matmul_relprop(q, kT, cam_probs)
    cam_k = jnp.swapaxes(cam_kT, -1, -2)
    cam_q_in = lrp.linear_alpha_beta(_merge_heads(cam_q), x_q, p.w_q, alpha)
    cam_k_in = lrp.linear_alpha_beta(_merge_heads(cam_k), x_k, p.w_k, alpha)
    pre_zero = jnp.all(_merge_heads(cam_v) == 0.0)
    cam_v_in = lrp.linear_alpha_beta(_merge_heads(cam_v), x_v, p.w_v, alpha)

    # value-collapse renormalisation (layers.py:786-799): if the value
    # cam becomes all-zero during projection (but wasn't before),
    # redistribute the attention-output relevance onto q/k
    post_zero = jnp.all(cam_v_in == 0.0)
    collapse = post_zero & ~pre_zero
    k_sum, q_sum = cam_k_in.sum(), cam_q_in.sum()
    tot = jnp.abs(k_sum) + jnp.abs(q_sum)
    R_total = cam.sum()  # = the reference's cam_attn_output.sum()
    k_fact = lrp.safe_divide(jnp.abs(k_sum), tot) * R_total
    q_fact = lrp.safe_divide(jnp.abs(q_sum), tot) * R_total
    cam_k_in = jnp.where(collapse,
                         cam_k_in * lrp.safe_divide(k_fact, cam_k_in.sum()),
                         cam_k_in)
    cam_q_in = jnp.where(collapse,
                         cam_q_in * lrp.safe_divide(q_fact, cam_q_in.sum()),
                         cam_q_in)
    return cam_q_in, cam_k_in, cam_v_in, attn_cam


def _enc_layer_relprop(p, x_in, pos, mask, R, alpha, H):
    """Encoder layer reverse (forward_post_relprop :255-276).
    Returns (R_in, attn_cam)."""
    # rematerialise
    qk = x_in + pos
    from transformer_mm_explainability_tpu.ops.attention import (
        multi_head_cross_attention,
    )

    attn_out, _ = multi_head_cross_attention(
        p["self_attn"], qk, qk, H, mask=mask, x_v=x_in)
    x1 = layer_norm(x_in + attn_out, p["norm1"]["scale"], p["norm1"]["bias"])
    ffn_out = _ffn_relu(p["ffn"], x1)

    # reverse
    cam = R  # norm2 identity
    cam_res2, cam_ffn = lrp.add_relprop(x1, ffn_out, cam)
    h1 = jax.nn.relu(x1 @ p["ffn"]["w1"] + p["ffn"]["b1"])
    cam_h1 = lrp.linear_alpha_beta(cam_ffn, h1, p["ffn"]["w2"], alpha)
    cam_x1a = lrp.linear_alpha_beta(cam_h1, x1, p["ffn"]["w1"], alpha)
    cam_x1 = lrp.clone_relprop(x1, [cam_x1a, cam_res2])
    # norm1 identity
    cam_res1, cam_attn = lrp.add_relprop(x_in, attn_out, cam_x1)
    cam_q, cam_k, cam_v, attn_cam = mha_relprop(
        p["self_attn"], qk, qk, x_in, H, mask, cam_attn, alpha)
    cam_webmd = lrp.clone_relprop(qk, [cam_q, cam_k])
    # WithPosEmbd identity → webmd cam goes to the src stream
    R_in = lrp.clone_relprop(x_in, [cam_webmd, cam_v, cam_res1])
    return R_in, attn_cam


def _dec_layer_relprop(p, tgt_in, memory, pos, query_pos, mask, R, alpha, H):
    """Decoder layer reverse (:417-439). Returns
    (R_tgt_in, cam_memory, self_cam, cross_cam)."""
    from transformer_mm_explainability_tpu.ops.attention import (
        multi_head_cross_attention,
    )

    qk = tgt_in + query_pos
    self_out, _ = multi_head_cross_attention(
        p["self_attn"], qk, qk, H, x_v=tgt_in)
    t1 = layer_norm(tgt_in + self_out, p["norm1"]["scale"], p["norm1"]["bias"])
    q2 = t1 + query_pos
    k2 = memory + pos
    cross_out, _ = multi_head_cross_attention(
        p["cross_attn"], q2, k2, H, mask=mask, x_v=memory)
    t2 = layer_norm(t1 + cross_out, p["norm2"]["scale"], p["norm2"]["bias"])
    ffn_out = _ffn_relu(p["ffn"], t2)

    cam = R  # norm3 identity
    cam_res3, cam_ffn = lrp.add_relprop(t2, ffn_out, cam)
    h1 = jax.nn.relu(t2 @ p["ffn"]["w1"] + p["ffn"]["b1"])
    cam_h1 = lrp.linear_alpha_beta(cam_ffn, h1, p["ffn"]["w2"], alpha)
    cam_t2a = lrp.linear_alpha_beta(cam_h1, t2, p["ffn"]["w1"], alpha)
    cam_t2 = lrp.clone_relprop(t2, [cam_t2a, cam_res3])
    # norm2 identity
    cam_res2, cam_cross = lrp.add_relprop(t1, cross_out, cam_t2)
    cam_q, cam_k, cam_mem_v, cross_cam = mha_relprop(
        p["cross_attn"], q2, k2, memory, H, mask, cam_cross, alpha)
    cam_memory = lrp.clone_relprop(memory, [cam_k, cam_mem_v])
    cam_t1 = lrp.clone_relprop(t1, [cam_q, cam_res2])
    # norm1 identity
    cam_res1, cam_self = lrp.add_relprop(tgt_in, self_out, cam_t1)
    cam_sq, cam_sk, cam_sv, self_cam = mha_relprop(
        p["self_attn"], qk, qk, tgt_in, H, None, cam_self, alpha)
    cam_webmd = lrp.clone_relprop(qk, [cam_sq, cam_sk])
    # reference sums the three tgt streams directly (transformer.py:437)
    R_tgt = cam_webmd + cam_sv + cam_res1
    return R_tgt, cam_memory, self_cam, cross_cam


def relprop(
    params: Dict[str, Any],
    tape: Dict[str, Any],
    hs: jnp.ndarray,                    # [B, Q, D] final decoder output
    one_hot: jnp.ndarray,               # [B, Q, C+1]
    cfg: DETRConfig,
    mask: Optional[jnp.ndarray] = None,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, DETRTaps]:
    """Full DETR relprop → (cam at the encoder input [B, S, D], attn
    cams for all three families)."""
    cam_hs = lrp.linear_alpha_beta(one_hot, hs, params["class_embed"]["w"],
                                   alpha)
    return relprop_from_hs(params, tape, cam_hs, cfg, mask, alpha)


def relprop_from_hs(
    params: Dict[str, Any],
    tape: Dict[str, Any],
    cam_hs: jnp.ndarray,                # [B, Q, D]
    cfg: DETRConfig,
    mask: Optional[jnp.ndarray] = None,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, DETRTaps]:
    """Transformer-level relprop given the relevance of hs."""
    H = cfg.nheads
    # decoder_norm identity
    memory = tape["memory"]
    pos, query_pos = tape["pos"], tape["query_pos"]

    def dec_step(carry, inputs):
        cam_tgt = carry
        p, tgt_in = inputs
        cam_tgt, cam_mem_i, self_cam, cross_cam = _dec_layer_relprop(
            p, tgt_in, memory, pos, query_pos, mask, cam_tgt, alpha, H)
        return cam_tgt, (cam_mem_i, self_cam, cross_cam)

    cam_tgt, (cam_mems, dec_self_cams, dec_cross_cams) = jax.lax.scan(
        dec_step, cam_hs, (params["decoder"], tape["dec"]), reverse=True)
    # Clone over memory merges the per-layer memory cams (+ a zero seed)
    cam_memory = lrp.clone_relprop(
        memory, [cam_mems[i] for i in range(cam_mems.shape[0])])

    def enc_step(carry, inputs):
        cam = carry
        p, x_in = inputs
        cam, attn_cam = _enc_layer_relprop(p, x_in, pos, mask, cam, alpha, H)
        return cam, attn_cam

    cam_src, enc_cams = jax.lax.scan(
        enc_step, cam_memory, (params["encoder"], tape["enc"]), reverse=True)
    cams = DETRTaps(enc_self=enc_cams, dec_self=dec_self_cams,
                    dec_cross=dec_cross_cams)
    return cam_src, cams
