"""TPU-native ViLBERT: two-stream co-attentional transformer (C12).

Re-design of ``VisualBERT/mmf/models/vilbert.py`` (BertSelfAttention:
32-119, BertLayer:134-154, BertImageSelfAttention:156-272 incl. the
dynamic-attention gates, BertImageLayer:336-368, BertBiAttention:
370-537, BertBiOutput:539-575, BertConnectionLayer:577-620,
BertEncoder:622-861, poolers:864-892, heads:894-954,
BertImageFeatureEmbeddings:956-980, ViLBERTBase:982-1118,
ViLBERTForPretraining:1120-1307, ViLBERTForClassification:1309-1401).

The reference keeps its explainability instrumentation dormant
(vilbert_lrp.py:66-394 is commented out) but the base model still
*saves* per-layer attention maps through module state + hooks; here
every forward optionally RETURNS the text/image/co attention stacks
(functional taps), which is what a relevancy method needs.

TPU design notes:

* the interleaved text/image/co-attention schedule
  (v_biattention_id × t_biattention_id, encoder:653-861) is unrolled
  at trace time — it is static config, so XLA sees one straight-line
  program;
* ``fixed_t_layer``/``fixed_v_layer`` (reference: ``torch.no_grad``
  re-runs) map to ``lax.stop_gradient`` over those layers' outputs;
* the two streams have different widths (768 text / 1024 image by
  default) — kept as separate tensors, fused only through the
  bi-attention's shared ``bi_hidden`` projections.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import mmf_layers as L
from transformer_mm_explainability_tpu.ops.attention import gelu, layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViLBERTConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    v_feature_size: int = 2048
    v_target_size: int = 1601
    v_hidden_size: int = 1024
    v_num_hidden_layers: int = 6
    v_num_attention_heads: int = 8
    v_intermediate_size: int = 1024
    bi_hidden_size: int = 1024
    bi_num_attention_heads: int = 8
    v_biattention_id: Tuple[int, ...] = (0, 1, 2, 3, 4, 5)
    t_biattention_id: Tuple[int, ...] = (6, 7, 8, 9, 10, 11)
    fusion_method: str = "mul"
    with_coattention: bool = True
    dynamic_attention: bool = False
    fixed_t_layer: int = 0
    fixed_v_layer: int = 0
    num_labels: int = 3129
    training_head_type: str = "vqa2"
    layer_norm_eps: float = 1e-12


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def _attn_block(key, d, d_mid, dtype):
    """One post-LN transformer block's params (q/k/v/out + FFN)."""
    ks = jax.random.split(key, 6)
    return {
        "q": L.init_linear(ks[0], d, d, dtype),
        "k": L.init_linear(ks[1], d, d, dtype),
        "v": L.init_linear(ks[2], d, d, dtype),
        "out": L.init_linear(ks[3], d, d, dtype),
        "out_ln": _ln(d, dtype),
        "inter": L.init_linear(ks[4], d, d_mid, dtype),
        "ffn_out": L.init_linear(ks[5], d_mid, d, dtype),
        "ffn_ln": _ln(d, dtype),
    }


def init_vilbert(key: jax.Array, cfg: ViLBERTConfig,
                 dtype=jnp.float32) -> Params:
    D, V, BI = cfg.hidden_size, cfg.v_hidden_size, cfg.bi_hidden_size
    n_c = len(cfg.v_biattention_id)
    ks = jax.random.split(key, 12 + cfg.num_hidden_layers
                          + cfg.v_num_hidden_layers + n_c)
    nrm = lambda k, s: (jax.random.normal(k, s) * 0.02).astype(dtype)
    k_i = iter(range(12 + cfg.num_hidden_layers + cfg.v_num_hidden_layers
                     + n_c))
    nk = lambda: ks[next(k_i)]

    t_layers = [_attn_block(nk(), D, cfg.intermediate_size, dtype)
                for _ in range(cfg.num_hidden_layers)]
    v_layers = []
    for _ in range(cfg.v_num_hidden_layers):
        blk = _attn_block(nk(), V, cfg.v_intermediate_size, dtype)
        if cfg.dynamic_attention:
            k1, k2 = jax.random.split(
                jax.random.fold_in(ks[0], len(v_layers)))
            blk["dy_q"] = L.init_linear(k1, D, V, dtype)
            blk["dy_k"] = L.init_linear(k2, D, V, dtype)
        v_layers.append(blk)
    c_layers = []
    for _ in range(n_c):
        kk = jax.random.split(nk(), 12)
        c_layers.append({
            # BertBiAttention (vilbert.py:389-401): stream-1 = vision
            "q1": L.init_linear(kk[0], V, BI, dtype),
            "k1": L.init_linear(kk[1], V, BI, dtype),
            "v1": L.init_linear(kk[2], V, BI, dtype),
            "q2": L.init_linear(kk[3], D, BI, dtype),
            "k2": L.init_linear(kk[4], D, BI, dtype),
            "v2": L.init_linear(kk[5], D, BI, dtype),
            # BertBiOutput (vilbert.py:539-575)
            "dense1": L.init_linear(kk[6], BI, V, dtype),
            "ln1": _ln(V, dtype),
            "dense2": L.init_linear(kk[7], BI, D, dtype),
            "ln2": _ln(D, dtype),
            # per-stream FFNs
            "v_inter": L.init_linear(kk[8], V, cfg.v_intermediate_size,
                                     dtype),
            "v_out": L.init_linear(kk[9], cfg.v_intermediate_size, V,
                                   dtype),
            "v_ln": _ln(V, dtype),
            "t_inter": L.init_linear(kk[10], D, cfg.intermediate_size,
                                     dtype),
            "t_out": L.init_linear(kk[11], cfg.intermediate_size, D, dtype),
            "t_ln": _ln(D, dtype),
        })

    bert_cfg = jbert.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=D,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        layer_norm_eps=cfg.layer_norm_eps)
    return {
        "embeddings": jbert.init_embedding_params(nk(), bert_cfg, dtype),
        "v_embeddings": {
            "image": L.init_linear(nk(), cfg.v_feature_size, V, dtype),
            "loc": L.init_linear(nk(), 5, V, dtype),
            "ln": _ln(V, dtype),
        },
        "t_layers": t_layers, "v_layers": v_layers, "c_layers": c_layers,
        "t_pooler": L.init_linear(nk(), D, BI, dtype),
        "v_pooler": L.init_linear(nk(), V, BI, dtype),
        "classifier": {
            "transform": {"w": nrm(nk(), (BI, BI)),
                          "b": jnp.zeros((BI,), dtype), "ln": _ln(BI, dtype)},
            "out": L.init_linear(nk(), BI, cfg.num_labels, dtype),
        },
        "cls": {
            # BertPreTrainingHeads (vilbert.py:926-954)
            "lm_transform": {"w": nrm(nk(), (D, D)),
                             "b": jnp.zeros((D,), dtype),
                             "ln": _ln(D, dtype)},
            "lm_bias": jnp.zeros((cfg.vocab_size,), dtype),
            "bi_seq_relationship": L.init_linear(nk(), BI, 2, dtype),
            "img_transform": {"w": nrm(nk(), (V, V)),
                              "b": jnp.zeros((V,), dtype),
                              "ln": _ln(V, dtype)},
            "img_decoder": L.init_linear(nk(), V, cfg.v_target_size, dtype),
        },
    }


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _heads_split(x, n_heads):
    B, S, D = x.shape
    return x.reshape(B, S, n_heads, D // n_heads).transpose(0, 2, 1, 3)


def _mha(q, k, v, mask_bias):
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(dh, q.dtype))
    if mask_bias is not None:
        scores = scores + mask_bias
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    B, H, S, Dh = ctx.shape
    return ctx.transpose(0, 2, 1, 3).reshape(B, S, H * Dh), probs


def _post_ln_tail(p, attn_out, x, eps):
    h = layer_norm(L.linear_fwd(p["out"], attn_out) + x,
                   p["out_ln"]["scale"], p["out_ln"]["bias"], eps)
    m = gelu(L.linear_fwd(p["inter"], h))
    return layer_norm(L.linear_fwd(p["ffn_out"], m) + h,
                      p["ffn_ln"]["scale"], p["ffn_ln"]["bias"], eps)


def text_layer(p: Params, x: jnp.ndarray, mask_bias, n_heads: int,
               eps: float):
    """BertLayer (vilbert.py:134-154); returns (hidden, attn probs)."""
    q = _heads_split(L.linear_fwd(p["q"], x), n_heads)
    k = _heads_split(L.linear_fwd(p["k"], x), n_heads)
    v = _heads_split(L.linear_fwd(p["v"], x), n_heads)
    attn_out, probs = _mha(q, k, v, mask_bias)
    return _post_ln_tail(p, attn_out, x, eps), probs


def image_layer(p: Params, x: jnp.ndarray, mask_bias,
                txt: jnp.ndarray, txt_mask2, n_heads: int, eps: float,
                dynamic_attention: bool = False):
    """BertImageLayer (vilbert.py:336-368) with the optional
    dynamic-attention gating (vilbert.py:218-232)."""
    mq = L.linear_fwd(p["q"], x)
    mk = L.linear_fwd(p["k"], x)
    if dynamic_attention and "dy_q" in p:
        pool = (txt * txt_mask2).sum(1) / txt_mask2.sum(1)
        gate_q = 1.0 + jax.nn.sigmoid(L.linear_fwd(p["dy_q"], pool))
        gate_k = 1.0 + jax.nn.sigmoid(L.linear_fwd(p["dy_k"], pool))
        mq = mq * gate_q[:, None, :]
        mk = mk * gate_k[:, None, :]
    q = _heads_split(mq, n_heads)
    k = _heads_split(mk, n_heads)
    v = _heads_split(L.linear_fwd(p["v"], x), n_heads)
    attn_out, probs = _mha(q, k, v, mask_bias)
    return _post_ln_tail(p, attn_out, x, eps), probs


def connection_layer(p: Params, v_in: jnp.ndarray, v_mask_bias,
                     t_in: jnp.ndarray, t_mask_bias, n_heads: int,
                     eps: float):
    """BertConnectionLayer (vilbert.py:577-620): bi-attention + per-
    stream output/FFN.  Returns (v_out, t_out, (probs_tq, probs_vq))."""
    q1 = _heads_split(L.linear_fwd(p["q1"], v_in), n_heads)
    k1 = _heads_split(L.linear_fwd(p["k1"], v_in), n_heads)
    v1 = _heads_split(L.linear_fwd(p["v1"], v_in), n_heads)
    q2 = _heads_split(L.linear_fwd(p["q2"], t_in), n_heads)
    k2 = _heads_split(L.linear_fwd(p["k2"], t_in), n_heads)
    v2 = _heads_split(L.linear_fwd(p["v2"], t_in), n_heads)
    # text queries attend image keys/values (vilbert.py:475-495)
    ctx1, probs1 = _mha(q2, k1, v1, v_mask_bias)
    # image queries attend text keys/values (vilbert.py:497-525)
    ctx2, probs2 = _mha(q1, k2, v2, t_mask_bias)
    # BertBiOutput: ctx2 → vision stream, ctx1 → text stream
    h_v = layer_norm(L.linear_fwd(p["dense1"], ctx2) + v_in,
                     p["ln1"]["scale"], p["ln1"]["bias"], eps)
    h_t = layer_norm(L.linear_fwd(p["dense2"], ctx1) + t_in,
                     p["ln2"]["scale"], p["ln2"]["bias"], eps)
    m_v = gelu(L.linear_fwd(p["v_inter"], h_v))
    out_v = layer_norm(L.linear_fwd(p["v_out"], m_v) + h_v,
                       p["v_ln"]["scale"], p["v_ln"]["bias"], eps)
    m_t = gelu(L.linear_fwd(p["t_inter"], h_t))
    out_t = layer_norm(L.linear_fwd(p["t_out"], m_t) + h_t,
                       p["t_ln"]["scale"], p["t_ln"]["bias"], eps)
    return out_v, out_t, (probs1, probs2)


# ---------------------------------------------------------------------------
# encoder schedule + base forward
# ---------------------------------------------------------------------------

def vilbert_encoder(params: Params, cfg: ViLBERTConfig,
                    txt: jnp.ndarray, img: jnp.ndarray,
                    t_bias, t_mask2, v_bias,
                    collect_attn: bool = False):
    """BertEncoder.forward schedule (vilbert.py:653-861), unrolled."""
    eps = cfg.layer_norm_eps
    attn_t: List = []
    attn_v: List = []
    attn_c: List = []
    t_start = v_start = 0
    for count, (v_end, t_end) in enumerate(
            zip(cfg.v_biattention_id, cfg.t_biattention_id)):
        for i in range(t_start, t_end):
            txt, pa = text_layer(params["t_layers"][i], txt, t_bias,
                                 cfg.num_attention_heads, eps)
            if i < cfg.fixed_t_layer:
                txt = jax.lax.stop_gradient(txt)
            if collect_attn:
                attn_t.append(pa)
        for i in range(v_start, v_end):
            img, pa = image_layer(params["v_layers"][i], img, v_bias, txt,
                                  t_mask2, cfg.v_num_attention_heads, eps,
                                  cfg.dynamic_attention)
            if i < cfg.fixed_v_layer:
                img = jax.lax.stop_gradient(img)
            if collect_attn:
                attn_v.append(pa)
        if cfg.with_coattention:
            img, txt, pc = connection_layer(
                params["c_layers"][count], img, v_bias, txt, t_bias,
                cfg.bi_num_attention_heads, eps)
            if collect_attn:
                attn_c.append(pc)
        t_start, v_start = t_end, v_end
    for i in range(v_start, cfg.v_num_hidden_layers):
        img, pa = image_layer(params["v_layers"][i], img, v_bias, txt,
                              t_mask2, cfg.v_num_attention_heads, eps,
                              cfg.dynamic_attention)
        if collect_attn:
            attn_v.append(pa)
    for i in range(t_start, cfg.num_hidden_layers):
        txt, pa = text_layer(params["t_layers"][i], txt, t_bias,
                             cfg.num_attention_heads, eps)
        if collect_attn:
            attn_t.append(pa)
    return txt, img, (attn_t, attn_v, attn_c)


def vilbert_base(params: Params, cfg: ViLBERTConfig,
                 input_txt: jnp.ndarray, image_feature: jnp.ndarray,
                 image_location: jnp.ndarray,
                 token_type_ids: Optional[jnp.ndarray] = None,
                 attention_mask: Optional[jnp.ndarray] = None,
                 image_attention_mask: Optional[jnp.ndarray] = None,
                 collect_attn: bool = False):
    """ViLBERTBase.forward (vilbert.py:1001-1118) →
    (seq_t, seq_v, pooled_t, pooled_v, attn)."""
    eps = cfg.layer_norm_eps
    B, T = input_txt.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, T), jnp.float32)
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_txt)
    if image_attention_mask is None:
        image_attention_mask = jnp.ones(image_feature.shape[:2],
                                        jnp.float32)
    t_bias = jbert.extended_attention_mask(attention_mask)
    v_bias = jbert.extended_attention_mask(image_attention_mask)
    t_mask2 = attention_mask.astype(jnp.float32)[:, :, None]

    emb = params["embeddings"]
    txt = (emb["word"][input_txt] + emb["position"][jnp.arange(T)][None]
           + emb["token_type"][token_type_ids])
    txt = layer_norm(txt, emb["ln"]["scale"], emb["ln"]["bias"], eps)
    ve = params["v_embeddings"]
    img = layer_norm(L.linear_fwd(ve["image"], image_feature)
                     + L.linear_fwd(ve["loc"], image_location),
                     ve["ln"]["scale"], ve["ln"]["bias"], eps)

    txt, img, attn = vilbert_encoder(params, cfg, txt, img, t_bias,
                                     t_mask2, v_bias, collect_attn)
    pooled_t = jax.nn.relu(L.linear_fwd(params["t_pooler"], txt[:, 0]))
    pooled_v = jax.nn.relu(L.linear_fwd(params["v_pooler"], img[:, 0]))
    return txt, img, pooled_t, pooled_v, attn


def _fuse(cfg: ViLBERTConfig, pooled_t, pooled_v):
    if cfg.fusion_method == "sum":
        return pooled_t + pooled_v
    if cfg.fusion_method == "mul":
        return pooled_t * pooled_v
    raise ValueError(f"unknown fusion {cfg.fusion_method!r}")


def _transform(p, x, eps):
    h = gelu(x @ p["w"].T + p["b"])
    return layer_norm(h, p["ln"]["scale"], p["ln"]["bias"], eps)


def vilbert_for_classification(params: Params, cfg: ViLBERTConfig,
                               input_txt: jnp.ndarray,
                               image_feature: jnp.ndarray,
                               image_location: jnp.ndarray,
                               **kw) -> jnp.ndarray:
    """ViLBERTForClassification.forward (vilbert.py:1347-1401).  For
    the nlvr2 head the pooled pair is reshaped to [B/2, 2*bi]."""
    _, _, pt, pv, _ = vilbert_base(params, cfg, input_txt, image_feature,
                                   image_location, **kw)
    pooled = _fuse(cfg, pt, pv)
    if cfg.training_head_type == "nlvr2":
        pooled = pooled.reshape(-1, pooled.shape[1] * 2)
    h = _transform(params["classifier"]["transform"], pooled,
                   cfg.layer_norm_eps)
    return L.linear_fwd(params["classifier"]["out"], h)


def vilbert_pretraining_heads(params: Params, cfg: ViLBERTConfig,
                              seq_t, seq_v, pooled_t, pooled_v):
    """BertPreTrainingHeads.forward (vilbert.py:934-954): text LM
    logits (decoder tied to word embedding), image predictions, and
    the bi-modal seq-relationship score."""
    cls = params["cls"]
    h = _transform(cls["lm_transform"], seq_t, cfg.layer_norm_eps)
    scores_t = h @ params["embeddings"]["word"].T + cls["lm_bias"]
    hv = _transform(cls["img_transform"], seq_v, cfg.layer_norm_eps)
    scores_v = L.linear_fwd(cls["img_decoder"], hv)
    seq_rel = L.linear_fwd(cls["bi_seq_relationship"],
                           _fuse(cfg, pooled_t, pooled_v))
    return scores_t, scores_v, seq_rel


def vilbert_pretrain_losses(params: Params, cfg: ViLBERTConfig,
                            input_txt, image_feature, image_location,
                            masked_lm_labels, image_label, image_target,
                            visual_target: int = 0,
                            **kw) -> Dict[str, jnp.ndarray]:
    """ViLBERTForPretraining.forward losses (vilbert.py:1163-1307):
    masked-LM CE (ignore −1) and the masked-region loss — KLDiv over
    log-softmax for visual_target 0, MSE for 1.  (Variant 2's random
    negative sampling draws randomness inside the module; callers that
    need it should sample indices host-side.)"""
    seq_t, seq_v, pt, pv, _ = vilbert_base(params, cfg, input_txt,
                                           image_feature, image_location,
                                           **kw)
    scores_t, scores_v, _ = vilbert_pretraining_heads(params, cfg, seq_t,
                                                      seq_v, pt, pv)
    out: Dict[str, jnp.ndarray] = {}
    labels = masked_lm_labels.reshape(-1)
    valid = labels != -1
    logp = jax.nn.log_softmax(scores_t.reshape(-1, cfg.vocab_size), -1)
    nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None],
                               axis=1)[:, 0]
    out["masked_lm_loss"] = (jnp.where(valid, nll, 0.0).sum()
                             / jnp.maximum(valid.sum(), 1))
    sel = (image_label == 1).astype(scores_v.dtype)[:, :, None]
    if visual_target == 0:
        # KLDivLoss(reduction="none")(log_softmax(pred), target) with
        # torch's 0·log0 = 0 convention
        logq = jax.nn.log_softmax(scores_v, axis=2)
        kld = jnp.where(
            image_target > 0,
            image_target * (jnp.log(jnp.maximum(image_target, 1e-30))
                            - logq),
            0.0)
        out["masked_img_loss"] = (kld * sel).sum() / jnp.maximum(
            (image_label == 1).sum(), 1)
    elif visual_target == 1:
        mse = (scores_v - image_target) ** 2
        out["masked_img_loss"] = (mse * sel).sum() / jnp.maximum(
            (sel * jnp.ones_like(mse)).sum(), 1)
    return out
