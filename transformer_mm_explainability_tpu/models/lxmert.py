"""LXMERT (9 language / 5 visual / 5 cross-modal layers) with capture.

Re-implements the behaviour of the reference's instrumented LXMERT
(lxmert/lxmert/src/lxmert_lrp.py): embeddings (:268-320), visual feature
encoder ``(LN(W_f f) + LN(W_p p))/2`` (:742-772), BERT-style layers,
``LxmertXLayer`` cross→self→FFN on both streams (:609-741), pooler on
the language CLS (:868-888) and the VQA answer head
``Linear→GELU→LN→Linear`` (:941-960).

Key reference quirk preserved: both cross-attention directions use the
SAME weights — ``visual_attention_copy`` is a lazy deepcopy whose only
purpose is separate hook state (:640-641). Functionally the two
directions here simply apply the shared cross-attention parameters with
independent capture taps.

Capture: six stacked attention families (see ``LxmertTaps``) matching
exactly the capture points the explanation generator reads
(lxmert ExplanationGenerator.py:61-129).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert
from transformer_mm_explainability_tpu.ops.attention import (
    CrossAttentionParams,
    gelu,
    layer_norm,
    multi_head_cross_attention,
)


@dataclasses.dataclass(frozen=True)
class LxmertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    l_layers: int = 9
    x_layers: int = 5
    r_layers: int = 5
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4
    num_qa_labels: int = 3129
    layer_norm_eps: float = 1e-12

    @property
    def bert(self) -> bert.BertConfig:
        return bert.BertConfig(
            vocab_size=self.vocab_size,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.l_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            max_position_embeddings=self.max_position_embeddings,
            type_vocab_size=self.type_vocab_size,
            layer_norm_eps=self.layer_norm_eps,
        )


LXMERT_VQA = LxmertConfig()


class LxmertTaps(NamedTuple):
    """Additive taps / capture outputs for all six attention families.

    lang:   [Ll, B, H, St, St]   language self-attention stack
    visn:   [Lr, B, H, Sv, Sv]   visual (relational) self-attention stack
    x_lang_cross: [Lx, B, H, St, Sv]  txt←img cross (``visual_attention``)
    x_visn_cross: [Lx, B, H, Sv, St]  img←txt cross (``..._copy``)
    x_lang_self:  [Lx, B, H, St, St]
    x_visn_self:  [Lx, B, H, Sv, Sv]
    """

    lang: jnp.ndarray
    visn: jnp.ndarray
    x_lang_cross: jnp.ndarray
    x_visn_cross: jnp.ndarray
    x_lang_self: jnp.ndarray
    x_visn_self: jnp.ndarray


def zero_taps(cfg: LxmertConfig, B: int, St: int, Sv: int,
              dtype: jnp.dtype = jnp.float32) -> LxmertTaps:
    H = cfg.num_attention_heads
    z = lambda L, Sq, Sk: jnp.zeros((L, B, H, Sq, Sk), dtype)
    return LxmertTaps(
        lang=z(cfg.l_layers, St, St),
        visn=z(cfg.r_layers, Sv, Sv),
        x_lang_cross=z(cfg.x_layers, St, Sv),
        x_visn_cross=z(cfg.x_layers, Sv, St),
        x_lang_self=z(cfg.x_layers, St, St),
        x_visn_self=z(cfg.x_layers, Sv, Sv),
    )


def _init_cross_attn(key, D, dtype):
    ks = jax.random.split(key, 4)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    return CrossAttentionParams(
        w_q=nrm(ks[0], (D, D)), b_q=zeros((D,)),
        w_k=nrm(ks[1], (D, D)), b_k=zeros((D,)),
        w_v=nrm(ks[2], (D, D)), b_v=zeros((D,)),
        w_out=nrm(ks[3], (D, D)), b_out=zeros((D,)),
    )


def _init_ffn(key, D, Dm, dtype):
    ks = jax.random.split(key, 2)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    return {
        "w1": nrm(ks[0], (D, Dm)), "b1": zeros((Dm,)),
        "w2": nrm(ks[1], (Dm, D)), "b2": zeros((D,)),
        "ln": {"scale": ones((D,)), "bias": zeros((D,))},
    }


def _init_x_layer(key, cfg: LxmertConfig, dtype):
    D, Dm = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(key, 9)
    ones = lambda shape: jnp.ones(shape, dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    return {
        "cross": _init_cross_attn(ks[0], D, dtype),
        "cross_ln_lang": {"scale": ones((D,)), "bias": zeros((D,))},
        "cross_ln_visn": {"scale": ones((D,)), "bias": zeros((D,))},
        "lang_self": _init_cross_attn(ks[1], D, dtype),
        "lang_self_ln": {"scale": ones((D,)), "bias": zeros((D,))},
        "visn_self": _init_cross_attn(ks[2], D, dtype),
        "visn_self_ln": {"scale": ones((D,)), "bias": zeros((D,))},
        "lang_ffn": _init_ffn(ks[3], D, Dm, dtype),
        "visn_ffn": _init_ffn(ks[4], D, Dm, dtype),
    }


def init_params(key: jax.Array, cfg: LxmertConfig = LXMERT_VQA,
                dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    D = cfg.hidden_size
    ks = jax.random.split(key, 12)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    from transformer_mm_explainability_tpu.utils.convert import stack

    return {
        "embeddings": bert.init_embedding_params(ks[0], cfg.bert, dtype),
        "visn_fc": {
            "feat": {"w": nrm(ks[1], (cfg.visual_feat_dim, D)), "b": zeros((D,))},
            "feat_ln": {"scale": ones((D,)), "bias": zeros((D,))},
            "pos": {"w": nrm(ks[2], (cfg.visual_pos_dim, D)), "b": zeros((D,))},
            "pos_ln": {"scale": ones((D,)), "bias": zeros((D,))},
        },
        "lang_layers": bert.init_encoder_params(
            ks[3], dataclasses.replace(cfg.bert), dtype),
        "visn_layers": bert.init_encoder_params(
            ks[4], dataclasses.replace(cfg.bert,
                                       num_hidden_layers=cfg.r_layers), dtype),
        "x_layers": stack([
            _init_x_layer(k, cfg, dtype)
            for k in jax.random.split(ks[5], cfg.x_layers)
        ]),
        "pooler": {"w": nrm(ks[6], (D, D)), "b": zeros((D,))},
        "answer_head": {
            "w1": nrm(ks[7], (D, 2 * D)), "b1": zeros((2 * D,)),
            "ln": {"scale": ones((2 * D,)), "bias": zeros((2 * D,))},
            "w2": nrm(ks[8], (2 * D, cfg.num_qa_labels)),
            "b2": zeros((cfg.num_qa_labels,)),
        },
    }


def _attn_block(p_attn, p_ln, x_q, x_kv, H, mask, tap, eps):
    """attention + residual + LN (LxmertSelfAttentionLayer /
    LxmertCrossAttentionLayer + LxmertAttentionOutput)."""
    out, probs = multi_head_cross_attention(p_attn, x_q, x_kv, H,
                                            mask=mask, tap=tap)
    return layer_norm(x_q + out, p_ln["scale"], p_ln["bias"], eps), probs


def _ffn_block(p, x, eps):
    h = gelu(x @ p["w1"] + p["b1"])
    h = h @ p["w2"] + p["b2"]
    return layer_norm(x + h, p["ln"]["scale"], p["ln"]["bias"], eps)


def forward(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    visual_feats: jnp.ndarray,
    visual_pos: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    visual_mask: Optional[jnp.ndarray] = None,
    cfg: LxmertConfig = LXMERT_VQA,
    taps: Optional[LxmertTaps] = None,
    return_tape: bool = False,
) -> Dict[str, Any]:
    """Returns {"qa_scores": [B, A], "attn": LxmertTaps of probs,
    "lang_output", "visn_output", "pooled"} (+ "tape" with per-layer
    inputs for the LRP reverse pass when ``return_tape``).
    """
    B, St = input_ids.shape
    Sv = visual_feats.shape[1]
    H = cfg.num_attention_heads
    eps = cfg.layer_norm_eps
    if taps is None:
        taps = zero_taps(cfg, B, St, Sv)

    # --- embeddings -------------------------------------------------------
    emb = bert.text_embeddings(params["embeddings"], input_ids, token_type_ids)
    ln = params["embeddings"]["ln"]
    lang = layer_norm(emb, ln["scale"], ln["bias"], eps)

    vf = params["visn_fc"]
    fx = visual_feats @ vf["feat"]["w"] + vf["feat"]["b"]
    fx = layer_norm(fx, vf["feat_ln"]["scale"], vf["feat_ln"]["bias"], eps)
    px = visual_pos @ vf["pos"]["w"] + vf["pos"]["b"]
    px = layer_norm(px, vf["pos_ln"]["scale"], vf["pos_ln"]["bias"], eps)
    visn = (fx + px) / 2.0

    lang_mask = bert.extended_attention_mask(attention_mask, lang.dtype)
    visn_mask = (None if visual_mask is None
                 else bert.extended_attention_mask(visual_mask, lang.dtype))

    # --- language + relational single-modality stacks ---------------------
    lang, lang_attn, lang_tape = bert.encoder(
        params["lang_layers"], lang, cfg.bert, lang_mask, taps.lang,
        return_tape=True)
    visn, visn_attn, visn_tape = bert.encoder(
        params["visn_layers"], visn,
        dataclasses.replace(cfg.bert, num_hidden_layers=cfg.r_layers),
        visn_mask, taps.visn, return_tape=True)

    # --- cross-modality layers (scan) -------------------------------------
    def x_layer(carry, inputs):
        lang, visn = carry
        p, tap_lc, tap_vc, tap_ls, tap_vs = inputs
        # cross attention, both directions from the PRE-update streams,
        # shared weights (lxmert_lrp.py:624-658)
        lang1, probs_lc = _attn_block(
            p["cross"], p["cross_ln_lang"], lang, visn, H, visn_mask, tap_lc, eps)
        visn1, probs_vc = _attn_block(
            p["cross"], p["cross_ln_visn"], visn, lang, H, lang_mask, tap_vc, eps)
        # self attention
        lang2, probs_ls = _attn_block(
            p["lang_self"], p["lang_self_ln"], lang1, lang1, H, lang_mask,
            tap_ls, eps)
        visn2, probs_vs = _attn_block(
            p["visn_self"], p["visn_self_ln"], visn1, visn1, H, visn_mask,
            tap_vs, eps)
        # FFNs
        lang3 = _ffn_block(p["lang_ffn"], lang2, eps)
        visn3 = _ffn_block(p["visn_ffn"], visn2, eps)
        return ((lang3, visn3),
                (probs_lc, probs_vc, probs_ls, probs_vs, (lang, visn)))

    (lang, visn), (x_lc, x_vc, x_ls, x_vs, x_tape) = jax.lax.scan(
        x_layer, (lang, visn),
        (params["x_layers"], taps.x_lang_cross, taps.x_visn_cross,
         taps.x_lang_self, taps.x_visn_self),
    )

    pooled = jnp.tanh(lang[:, 0] @ params["pooler"]["w"] + params["pooler"]["b"])
    ah = params["answer_head"]
    h = gelu(pooled @ ah["w1"] + ah["b1"])
    h = layer_norm(h, ah["ln"]["scale"], ah["ln"]["bias"], eps)
    qa_scores = h @ ah["w2"] + ah["b2"]

    attn = LxmertTaps(lang=lang_attn, visn=visn_attn, x_lang_cross=x_lc,
                      x_visn_cross=x_vc, x_lang_self=x_ls, x_visn_self=x_vs)
    out = {"qa_scores": qa_scores, "attn": attn,
           "lang_output": lang, "visn_output": visn, "pooled": pooled}
    if return_tape:
        out["tape"] = {"lang": lang_tape, "visn": visn_tape, "x": x_tape,
                       "lang_final": lang, "visn_final": visn,
                       "lang_mask": lang_mask, "visn_mask": visn_mask}
    return out


def capture(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    targets: jnp.ndarray,
    cfg: LxmertConfig = LXMERT_VQA,
) -> Tuple[jnp.ndarray, LxmertTaps, LxmertTaps]:
    """One fwd+bwd: (qa_scores, attn probs, attn gradients).
    ``targets=None`` explains the PREDICTED answer (the reference
    default: ExplanationGenerator.py ``index=None → argmax(output)``),
    resolved in the same fwd+bwd via a stop-gradient argmax."""
    B, St = batch["input_ids"].shape
    Sv = batch["visual_feats"].shape[1]

    def score_fn(taps):
        out = forward(
            params, batch["input_ids"], batch["attention_mask"],
            batch["visual_feats"], batch["visual_pos"],
            batch.get("token_type_ids"), batch.get("visual_mask"),
            cfg, taps,
        )
        t = (jnp.argmax(jax.lax.stop_gradient(out["qa_scores"]), axis=-1)
             if targets is None else targets)
        s = jnp.take_along_axis(out["qa_scores"], t[:, None], axis=1).sum()
        return s, (out["qa_scores"], out["attn"])

    grads, (scores, attn) = jax.grad(score_fn, has_aux=True)(
        zero_taps(cfg, B, St, Sv)
    )
    return scores, attn, grads
