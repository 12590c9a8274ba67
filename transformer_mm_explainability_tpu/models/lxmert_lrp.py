"""Full LXMERT LRP reverse pass (relprop).

Mirrors lxmert_lrp.py's model-level relprop chain:
  LxmertForQuestionAnswering.relprop (:1688-1692): answer head →
  seed cam_vis = 0 → LxmertModel.relprop → pooler (IndexSelect on CLS)
  → LxmertEncoder.relprop (:855-865): reversed x_layers →
  reversed r_layers → reversed language layers.
  LxmertXLayer.relprop (:735-741): output FFNs → self attns → cross
  attns (both directions share weights; clone merges).

Activations are rematerialised from the forward tape
(models/lxmert.forward(..., return_tape=True)). Emits the attention
cams for all six families (the ``get_attn_cam()`` captures the
generators read for use_lrp=True / partial_lrp / transformer_att).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert_lrp
from transformer_mm_explainability_tpu.models.lxmert import (
    LxmertConfig,
    LxmertTaps,
)
from transformer_mm_explainability_tpu.ops import lrp
from transformer_mm_explainability_tpu.ops.attention import (
    CrossAttentionParams,
    gelu,
    layer_norm,
    multi_head_cross_attention,
)


def _attn_parts(p: CrossAttentionParams):
    return p.w_q, p.b_q, p.w_k, p.b_k, p.w_v, p.b_v, p.w_out, p.b_out


def _attn_block_forward(p_attn, p_ln, x_q, x_kv, H, mask, eps):
    out, _ = multi_head_cross_attention(p_attn, x_q, x_kv, H, mask=mask)
    return layer_norm(x_q + out, p_ln["scale"], p_ln["bias"], eps), out


def _attn_block_relprop(p_attn, x_q, x_kv, H, mask, attn_out_pre_res, R,
                        alpha, self_attention):
    """Reverse (attention + residual + LN): returns
    (cam_q_stream incl. residual merge, cam_ctx, attn_cam)."""
    cam_att, cam_res = lrp.add_relprop(attn_out_pre_res, x_q, R)
    cam_q, cam_ctx, attn_cam = bert_lrp.attention_relprop(
        *_attn_parts(p_attn), x_q, x_kv, H, mask, cam_att, alpha,
        uniform=True, self_attention=self_attention)
    if self_attention:
        cam_stream = lrp.clone_relprop(x_q, [cam_q, cam_res])
        return cam_stream, None, attn_cam
    cam_stream = lrp.clone_relprop(x_q, [cam_q, cam_res])
    return cam_stream, cam_ctx, attn_cam


def _ffn_relprop(p, x_in, R, alpha, eps):
    """Reverse (dense→gelu→dense + residual + LN) given block input."""
    h1 = x_in @ p["w1"] + p["b1"]
    g1 = gelu(h1)
    ffn_out = g1 @ p["w2"] + p["b2"]
    cam_ffn, cam_res = lrp.add_relprop(ffn_out, x_in, R)
    cam_g1 = lrp.linear_alpha_beta(cam_ffn, g1, p["w2"], alpha)
    cam_in = lrp.linear_alpha_beta(cam_g1, x_in, p["w1"], alpha)
    return lrp.clone_relprop(x_in, [cam_in, cam_res])


def relprop(
    params: Dict[str, Any],
    tape: Dict[str, Any],
    one_hot: jnp.ndarray,            # [B, num_qa_labels]
    lang_mask: Optional[jnp.ndarray],
    visn_mask: Optional[jnp.ndarray],
    cfg: LxmertConfig,
    alpha: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, LxmertTaps]:
    """Returns (cam_lang [B,St,D], cam_vis [B,Sv,D], attn cams for all
    six families as an LxmertTaps)."""
    H = cfg.num_attention_heads
    eps = cfg.layer_norm_eps

    # --- answer head (Linear→GELU→LN→Linear reversed; :941-960) ----------
    ah = params["answer_head"]
    # rematerialise pooled & hidden activations
    lang_out_final = tape["lang_final"]
    pooled_pre = lang_out_final[:, 0] @ params["pooler"]["w"] + params["pooler"]["b"]
    pooled = jnp.tanh(pooled_pre)
    h1 = pooled @ ah["w1"] + ah["b1"]
    g1 = layer_norm(gelu(h1), ah["ln"]["scale"], ah["ln"]["bias"], eps)
    cam = lrp.linear_alpha_beta(one_hot, g1, ah["w2"], alpha)
    cam = lrp.linear_alpha_beta(cam, pooled, ah["w1"], alpha)

    # --- pooler (dense + IndexSelect on token 0; :868-888) ----------------
    cam = lrp.linear_alpha_beta(cam, lang_out_final[:, 0], params["pooler"]["w"],
                                alpha)
    cam_lang = jnp.zeros_like(lang_out_final).at[:, 0].set(cam)
    cam_vis = jnp.zeros_like(tape["visn_final"])

    # --- x-layers reversed -------------------------------------------------
    lang_tape_x, visn_tape_x = tape["x"]

    def x_step(carry, inputs):
        cam_lang, cam_vis = carry
        p, lang_in, visn_in = inputs
        # rematerialise the intra-layer streams
        lang1, cross_out_l = _attn_block_forward(
            p["cross"], p["cross_ln_lang"], lang_in, visn_in, H, visn_mask, eps)
        visn1, cross_out_v = _attn_block_forward(
            p["cross"], p["cross_ln_visn"], visn_in, lang_in, H, lang_mask, eps)
        lang2, self_out_l = _attn_block_forward(
            p["lang_self"], p["lang_self_ln"], lang1, lang1, H, lang_mask, eps)
        visn2, self_out_v = _attn_block_forward(
            p["visn_self"], p["visn_self_ln"], visn1, visn1, H, visn_mask, eps)

        # reverse FFNs (relprop_output, :691-700)
        cam_lang = _ffn_relprop(p["lang_ffn"], lang2, cam_lang, alpha, eps)
        cam_vis = _ffn_relprop(p["visn_ffn"], visn2, cam_vis, alpha, eps)
        # reverse self attns (:676-680)
        cam_lang, _, cam_ls = _attn_block_relprop(
            p["lang_self"], lang1, lang1, H, lang_mask, self_out_l,
            cam_lang, alpha, self_attention=True)
        cam_vis, _, cam_vs = _attn_block_relprop(
            p["visn_self"], visn1, visn1, H, visn_mask, self_out_v,
            cam_vis, alpha, self_attention=True)
        # reverse cross attns (:712-719): visn side (copy) first, then lang
        cam_vis_stream, cam_lang_ctx, cam_vc = _attn_block_relprop(
            p["cross"], visn_in, lang_in, H, lang_mask, cross_out_v,
            cam_vis, alpha, self_attention=False)
        cam_lang_stream, cam_vis_ctx, cam_lc = _attn_block_relprop(
            p["cross"], lang_in, visn_in, H, visn_mask, cross_out_l,
            cam_lang, alpha, self_attention=False)
        cam_lang = lrp.clone_relprop(lang_in, [cam_lang_stream, cam_lang_ctx])
        cam_vis = lrp.clone_relprop(visn_in, [cam_vis_stream, cam_vis_ctx])
        return (cam_lang, cam_vis), (cam_lc, cam_vc, cam_ls, cam_vs)

    (cam_lang, cam_vis), (x_lc, x_vc, x_ls, x_vs) = jax.lax.scan(
        x_step, (cam_lang, cam_vis),
        (params["x_layers"], lang_tape_x, visn_tape_x), reverse=True)

    # --- relational (visual) stack reversed -------------------------------
    r_cfg = dataclasses.replace(cfg.bert, num_hidden_layers=cfg.r_layers)
    cam_vis, visn_cams = bert_lrp.bert_encoder_relprop(
        params["visn_layers"], tape["visn"], visn_mask, cam_vis, r_cfg, alpha)

    # --- language stack reversed ------------------------------------------
    cam_lang, lang_cams = bert_lrp.bert_encoder_relprop(
        params["lang_layers"], tape["lang"], lang_mask, cam_lang, cfg.bert,
        alpha)

    cams = LxmertTaps(lang=lang_cams, visn=visn_cams, x_lang_cross=x_lc,
                      x_visn_cross=x_vc, x_lang_self=x_ls, x_visn_self=x_vs)
    return cam_lang, cam_vis, cams
