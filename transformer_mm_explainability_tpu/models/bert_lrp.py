"""LRP reverse pass for the BERT encoder family (VisualBERT, LXMERT
single-modality stacks).

The reference's relprop walks module state backwards
(BERT_ours.py BertEncoder.relprop :152-156, BertLayer.relprop :505-516,
BertSelfAttention.relprop :354-394). Here the reverse pass is a
``lax.scan`` over layers in reverse that REMATERIALISES each layer's
internals from the taped layer inputs (bert.encoder(..., return_tape))
and applies the pure rules of ops/lrp.py. Alongside the relevance it
emits the per-layer attention cams (``get_attn_cam()`` equivalents),
which is what the explanation generators consume.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models.bert import BertConfig
from transformer_mm_explainability_tpu.ops import lrp
from transformer_mm_explainability_tpu.ops.attention import (
    AttentionParams,
    gelu,
    layer_norm,
    _merge_heads,
    _split_heads,
)


def attention_relprop(
    w_q, b_q, w_k, b_k, w_v, b_v, w_out, b_out,
    x_q: jnp.ndarray,
    x_ctx: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray],
    R: jnp.ndarray,
    alpha: float = 1.0,
    uniform: bool = True,
    self_attention: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Relprop through one attention (self if x_q is x_ctx, else cross).

    ``R`` is the relevance of the attention's dense output [B, S_q, D].
    Returns (cam_x_q, cam_x_ctx, attn_cam [B, H, S_q, S_k]).
    Mirrors BertSelfAttention.relprop / LxmertAttention.relprop exactly
    (matmul halving, mask-add split, clone sums).
    """
    # rematerialise
    q = _split_heads(x_q @ w_q + b_q, num_heads)
    k = _split_heads(x_ctx @ w_k + b_k, num_heads)
    v = _split_heads(x_ctx @ w_v + b_v, num_heads)
    dh = q.shape[-1]
    kT = jnp.swapaxes(k, -1, -2)
    scores_raw = q @ kT
    scores = scores_raw / jnp.sqrt(jnp.asarray(dh, q.dtype))
    if mask is not None:
        scores_masked = scores + mask
    probs = jax.nn.softmax(scores if mask is None else scores_masked, -1)
    ctx = _merge_heads(probs @ v)

    # reverse
    cam_ctx_out = lrp.linear_alpha_beta(R, ctx, w_out, alpha, uniform)
    cam = _split_heads(cam_ctx_out, num_heads)
    cam_probs, cam_v = lrp.matmul_relprop(probs, v, cam)  # halves both
    attn_cam = cam_probs
    # dropout, softmax: identity
    if mask is not None:
        cam_probs, _ = lrp.add_relprop(scores, mask, cam_probs)
    cam_q, cam_kT = lrp.matmul_relprop(q, kT, cam_probs)
    cam_q = lrp.linear_alpha_beta(_merge_heads(cam_q), x_q, w_q, alpha, uniform)
    cam_k = lrp.linear_alpha_beta(
        _merge_heads(jnp.swapaxes(cam_kT, -1, -2)), x_ctx, w_k, alpha, uniform)
    cam_v = lrp.linear_alpha_beta(_merge_heads(cam_v), x_ctx, w_v, alpha, uniform)

    if self_attention:
        # self-attention: 3-way clone of the input (BERT_ours.py:304)
        cam_x = lrp.clone_relprop(x_q, [cam_q, cam_k, cam_v])
        return cam_x, cam_x, attn_cam
    # cross: context cloned into key/value (lxmert_lrp.py:386-391)
    cam_ctx = lrp.clone_relprop(x_ctx, [cam_k, cam_v])
    return cam_q, cam_ctx, attn_cam


def _split_qkv(p: AttentionParams):
    D = p.w_qkv.shape[0]
    wq, wk, wv = jnp.split(p.w_qkv, 3, axis=-1)
    bq, bk, bv = jnp.split(p.b_qkv, 3, axis=-1)
    return wq, bq, wk, bk, wv, bv


def bert_layer_relprop(
    p: Dict[str, Any],
    x_in: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    R: jnp.ndarray,
    cfg: BertConfig,
    alpha: float = 1.0,
    uniform: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Relprop one post-LN BERT layer given its taped input.
    Returns (R_in, attn_cam)."""
    H = cfg.num_attention_heads
    eps = cfg.layer_norm_eps
    wq, bq, wk, bk, wv, bv = _split_qkv(p["attn"])

    # rematerialise forward
    q = _split_heads(x_in @ wq + bq, H)
    k = _split_heads(x_in @ wk + bk, H)
    v = _split_heads(x_in @ wv + bv, H)
    ctx = None  # recomputed inside attention_relprop; here we need the
    # residual stream values
    import jax.nn as jnn

    dh = q.shape[-1]
    scores = (q @ jnp.swapaxes(k, -1, -2)) / jnp.sqrt(jnp.asarray(dh, q.dtype))
    if mask is not None:
        scores = scores + mask
    probs = jnn.softmax(scores, -1)
    ctx = _merge_heads(probs @ v)
    attn_out = ctx @ p["attn"].w_out + p["attn"].b_out
    attn_ln_out = layer_norm(x_in + attn_out, p["attn_ln"]["scale"],
                             p["attn_ln"]["bias"], eps)
    h1 = attn_ln_out @ p["mlp"]["w1"] + p["mlp"]["b1"]
    g1 = gelu(h1)
    ffn_out = g1 @ p["mlp"]["w2"] + p["mlp"]["b2"]

    # reverse: mlp_ln identity → add → ffn → clone → attn_ln identity →
    # add → output dense → attention internals
    cam_ffn, cam_ao2 = lrp.add_relprop(ffn_out, attn_ln_out, R)
    cam_g1 = lrp.linear_alpha_beta(cam_ffn, g1, p["mlp"]["w2"], alpha, uniform)
    cam_ao1 = lrp.linear_alpha_beta(cam_g1, attn_ln_out, p["mlp"]["w1"],
                                    alpha, uniform)
    cam_attn_ln = lrp.clone_relprop(attn_ln_out, [cam_ao1, cam_ao2])
    cam_attn_out, cam_res = lrp.add_relprop(attn_out, x_in, cam_attn_ln)
    cam_attn_in, _, attn_cam = attention_relprop(
        wq, bq, wk, bk, wv, bv, p["attn"].w_out, p["attn"].b_out,
        x_in, x_in, H, mask, cam_attn_out, alpha, uniform,
        self_attention=True)
    R_in = lrp.clone_relprop(x_in, [cam_attn_in, cam_res])
    return R_in, attn_cam


def bert_encoder_relprop(
    params: Dict[str, Any],
    tape: jnp.ndarray,           # [L, B, S, D] layer inputs
    mask: Optional[jnp.ndarray],
    R: jnp.ndarray,              # [B, S, D]
    cfg: BertConfig,
    alpha: float = 1.0,
    uniform: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reversed relprop over the whole encoder (BertEncoder.relprop).
    Returns (R at embeddings, attn_cams [L, B, H, S, S])."""
    stacked = {k: params[k] for k in ("attn", "attn_ln", "mlp", "mlp_ln")}

    def step(R, inputs):
        p, x_in = inputs
        R_in, attn_cam = bert_layer_relprop(p, x_in, mask, R, cfg, alpha,
                                            uniform)
        return R_in, attn_cam

    R_out, cams_rev = jax.lax.scan(step, R, (stacked, tape), reverse=True)
    return R_out, cams_rev
