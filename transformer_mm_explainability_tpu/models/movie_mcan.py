"""TPU-native MoVie+MCAN (grid-feature VQA, arXiv:2004.11883) — C34.

Re-design of ``VisualBERT/mmf/models/movie_mcan.py`` (MoVieMcan:21-274)
and its blocks: MCAN attention stack
(``mmf/modules/attention.py`` MovieMcanMultiHeadAttention:166-215,
SelfAttention:218-236, SelfGuidedAttention:239-277), the embeddings
(``mmf/modules/embeddings.py`` SAEmbedding:460-501, SGAEmbedding:
503-540, CBNEmbedding:542-599, TwoBranchEmbedding:601-640), the MoVie
bottleneck (``mmf/modules/bottleneck.py`` SEModule:21-51,
Modulation:54-68, MovieBottleneck:71-164) and the fusion head
(``mmf/modules/layers.py`` BranchCombineLayer:690-729,
AttnPool1d:731-758, TripleLinear:671-687).

TPU notes: the CBN branch's conv1x1 stages are einsum matmuls over the
channel axis (MXU); the 3x3 runs through ``lax.conv`` in NCHW; frozen
batch-norms fold into scale/shift.  All blocks are inference-faithful
(dropout == eval), with the TripleLinear's train/eval split exposed via
``training=``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import mmf_layers as L
from transformer_mm_explainability_tpu.ops.attention import layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MovieMcanConfig:
    vocab_size: int = 100
    num_answers: int = 10
    embedding_dim: int = 300
    hidden_dim: int = 1024
    num_attn: int = 8
    num_layers: int = 6         # MCAN SA/SGA depth
    cbn_num_layers: int = 4
    image_feature_dim: int = 2048
    num_feat: int = 2           # attn-pool glimpses of the text vec
    compressed: bool = True
    use_se: bool = True
    cbn_out_dim: int = 1024
    layer_norm_eps: float = 1e-5  # torch nn.LayerNorm default


# ---------------------------------------------------------------------------
# MCAN attention blocks
# ---------------------------------------------------------------------------

def _init_mcan_mha(key, d, dtype):
    ks = jax.random.split(key, 4)
    return {"linears": [L.init_linear(k, d, d, dtype) for k in ks]}


def mcan_mha_fwd(p: Params, q, k, v, mask, num_attn: int):
    """MovieMcanMultiHeadAttention (attention.py:166-215).  ``mask``
    is [B, S_k] True-at-pad → scores −1e9 (or None)."""
    B = q.shape[0]
    dh = q.shape[-1] // num_attn

    def split(x, lin):
        y = L.linear_fwd(lin, x)
        return y.reshape(B, -1, num_attn, dh).transpose(0, 2, 1, 3)

    qh = split(q, p["linears"][0])
    kh = split(k, p["linears"][1])
    vh = split(v, p["linears"][2])
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(
        jnp.asarray(dh, q.dtype))
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -1e9, scores)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, -1, num_attn * dh)
    return L.linear_fwd(p["linears"][3], ctx)


def _init_mcan_ffn(key, d, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": L.init_linear(k1, d, 4 * d, dtype),
            "fc2": L.init_linear(k2, 4 * d, d, dtype)}


def _mcan_ffn(p, x):
    return L.linear_fwd(p["fc2"], jax.nn.relu(L.linear_fwd(p["fc1"], x)))


def init_self_attention(key, d, dtype):
    k1, k2 = jax.random.split(key)
    return {"mha": _init_mcan_mha(k1, d, dtype),
            "ffn": _init_mcan_ffn(k2, d, dtype),
            "ln_mha": {"scale": jnp.ones((d,), dtype),
                       "bias": jnp.zeros((d,), dtype)},
            "ln_fcn": {"scale": jnp.ones((d,), dtype),
                       "bias": jnp.zeros((d,), dtype)}}


def self_attention_fwd(p: Params, x, x_mask, num_attn: int,
                       eps: float = 1e-5):
    """SelfAttention (attention.py:218-236): post-LN MHA + FFN."""
    x = layer_norm(x + mcan_mha_fwd(p["mha"], x, x, x, x_mask, num_attn),
                   p["ln_mha"]["scale"], p["ln_mha"]["bias"], eps)
    return layer_norm(x + _mcan_ffn(p["ffn"], x),
                      p["ln_fcn"]["scale"], p["ln_fcn"]["bias"], eps)


def init_self_guided_attention(key, d, dtype):
    ks = jax.random.split(key, 3)
    return {"mha0": _init_mcan_mha(ks[0], d, dtype),
            "mha1": _init_mcan_mha(ks[1], d, dtype),
            "ffn": _init_mcan_ffn(ks[2], d, dtype),
            "ln0": {"scale": jnp.ones((d,), dtype),
                    "bias": jnp.zeros((d,), dtype)},
            "ln1": {"scale": jnp.ones((d,), dtype),
                    "bias": jnp.zeros((d,), dtype)},
            "ln_fcn": {"scale": jnp.ones((d,), dtype),
                       "bias": jnp.zeros((d,), dtype)}}


def self_guided_attention_fwd(p: Params, x, y, x_mask, y_mask,
                              num_attn: int, eps: float = 1e-5):
    """SelfGuidedAttention (attention.py:239-277): self then guided."""
    x = layer_norm(x + mcan_mha_fwd(p["mha0"], x, x, x, x_mask, num_attn),
                   p["ln0"]["scale"], p["ln0"]["bias"], eps)
    x = layer_norm(x + mcan_mha_fwd(p["mha1"], x, y, y, y_mask, num_attn),
                   p["ln1"]["scale"], p["ln1"]["bias"], eps)
    return layer_norm(x + _mcan_ffn(p["ffn"], x),
                      p["ln_fcn"]["scale"], p["ln_fcn"]["bias"], eps)


def init_attn_pool_1d(key, d, num_attn, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": L.init_linear(k1, d, d // 2, dtype),
            "fc2": L.init_linear(k2, d // 2, num_attn, dtype)}


def attn_pool_1d_fwd(p: Params, query, value,
                     mask: Optional[jnp.ndarray] = None):
    """AttnPool1d (layers.py:731-758): MLP scores → masked softmax over
    positions → weighted sum per glimpse."""
    score = L.linear_fwd(p["fc2"],
                         jax.nn.relu(L.linear_fwd(p["fc1"], query)))
    score = jnp.swapaxes(score, -2, -1)           # [B, n_attn, S]
    if mask is not None:
        score = jnp.where(mask[:, None, :], -1e9, score)
    probs = jax.nn.softmax(score, axis=-1)
    out = jnp.einsum("bns,bsd->bnd", probs, value)
    return out


# ---------------------------------------------------------------------------
# MoVie bottleneck branch (NCHW)
# ---------------------------------------------------------------------------

def _conv_init(key, cout, cin, k, dtype):
    fan_in = cin * k * k
    bound = jnp.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, (cout, cin, k, k), dtype, -bound, bound)


def _conv2d(x, w, stride=1, padding=0, bias=None):
    pad = [(padding, padding), (padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if bias is not None:
        y = y + bias[None, :, None, None]
    return y


def _frozen_bn(x, p):
    scale = (p["scale"] / jnp.sqrt(p["var"] + 1e-5))[None, :, None, None]
    shift = (p["bias"] - p["mean"] * p["scale"]
             / jnp.sqrt(p["var"] + 1e-5))[None, :, None, None]
    return x * scale + shift


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def init_movie_bottleneck(key, inplanes, planes, cond_planes,
                          downsample: bool, compressed=True, use_se=True,
                          dtype=jnp.float32):
    """MovieBottleneck (bottleneck.py:71-164), expansion 4."""
    ks = jax.random.split(key, 8)
    width = planes
    out_c = planes * 4
    p: Params = {
        "conv1": _conv_init(ks[0], width, inplanes, 1, dtype),
        "bn1": _bn_init(width, dtype),
        "conv2": _conv_init(ks[1], width, width, 3, dtype),
        "bn2": _bn_init(width, dtype),
        "conv3": _conv_init(ks[2], out_c, width, 1, dtype),
        "bn3": _bn_init(out_c, dtype),
        # the reference Modulation hard-codes 256 out-channels when
        # compressed (bottleneck.py:59-61) — legal only because MoVie's
        # single published config has width==256.  We generalize to
        # ``width`` (identical weights at the published scale) so tiny
        # configs are constructible.
        "cond": {"linear": L.init_linear(ks[3], cond_planes, inplanes,
                                         dtype),
                 "conv": _conv_init(ks[4],
                                    width if compressed else inplanes,
                                    inplanes, 1, dtype),
                 "conv_b": jnp.zeros((width if compressed else inplanes,),
                                     dtype)},
    }
    if downsample:
        p["downsample"] = _conv_init(ks[5], out_c, inplanes, 1, dtype)
    if use_se:
        p["se"] = {"conv1": _conv_init(ks[6], out_c // 4, out_c, 1, dtype),
                   "conv2": _conv_init(ks[7], out_c, out_c // 4, 1, dtype),
                   "attn_conv": _conv_init(
                       jax.random.fold_in(ks[6], 1), 1, 1, 7, dtype)}
    return p


def _se_module(p, x):
    """SEModule (bottleneck.py:21-51): channel gate + spatial gate."""
    pooled = x.mean(axis=(2, 3), keepdims=True)
    g = jax.nn.relu(_conv2d(pooled, p["conv1"]))
    g = jax.nn.sigmoid(_conv2d(g, p["conv2"]))
    x = x * g
    # ChannelPool: mean over channels, then 7x7 conv + sigmoid
    cp = x.mean(axis=1, keepdims=True)
    a = jax.nn.sigmoid(_conv2d(cp, p["attn_conv"], padding=3))
    return x * a


def movie_bottleneck_fwd(p: Params, x, cond, compressed=True):
    """MovieBottleneck.forward (bottleneck.py:128-164), cond given."""
    identity = x
    gate = L.linear_fwd(p["cond"]["linear"], cond)[:, :, None, None]
    mod = _conv2d(x * gate, p["cond"]["conv"], bias=p["cond"]["conv_b"])
    if compressed:
        x = _conv2d(x, p["conv1"]) + mod
    else:
        # the reference's ``x += self.cond(x, cond)`` (bottleneck.py:138)
        # is in-place, so the ``identity`` alias captured at :133 also
        # sees the modulated tensor — the shortcut uses x+mod, not x.
        x = x + mod
        identity = x
        x = _conv2d(x, p["conv1"])
    out = jax.nn.relu(_frozen_bn(x, p["bn1"]))
    out = jax.nn.relu(_frozen_bn(_conv2d(out, p["conv2"], padding=1),
                                 p["bn2"]))
    out = _frozen_bn(_conv2d(out, p["conv3"]), p["bn3"])
    shortcut = (_conv2d(identity, p["downsample"])
                if "downsample" in p else identity)
    if "se" in p:
        out = _se_module(p["se"], out)
    return jax.nn.relu(out + shortcut)


# ---------------------------------------------------------------------------
# embeddings + model
# ---------------------------------------------------------------------------

def init_movie_mcan(key: jax.Array, cfg: MovieMcanConfig,
                    dtype=jnp.float32) -> Params:
    H, E = cfg.hidden_dim, cfg.embedding_dim
    ks = jax.random.split(key, 16 + 2 * cfg.num_layers
                          + cfg.cbn_num_layers)
    it = iter(ks)
    nk = lambda: next(it)
    word = (jax.random.normal(nk(), (cfg.vocab_size, E)) * 0.02
            ).astype(dtype)
    cbns = []
    inplanes = cfg.image_feature_dim
    for i in range(cfg.cbn_num_layers):
        cbns.append(init_movie_bottleneck(
            nk(), inplanes, cfg.cbn_out_dim // 4, cfg.hidden_dim,
            downsample=(inplanes != cfg.cbn_out_dim),
            compressed=cfg.compressed, use_se=cfg.use_se, dtype=dtype))
        inplanes = cfg.cbn_out_dim
    out2 = cfg.hidden_dim * 2
    return {
        "word_embedding": word,
        "sa": {  # SAEmbedding
            "lstm": L.init_lstm(nk(), E, H, dtype),
            "blocks": [init_self_attention(nk(), H, dtype)
                       for _ in range(cfg.num_layers)],
            "attn_pool": init_attn_pool_1d(nk(), H, cfg.num_feat, dtype),
        },
        "sga": {  # SGAEmbedding
            "linear": L.init_linear(nk(), cfg.image_feature_dim, H, dtype),
            "blocks": [init_self_guided_attention(nk(), H, dtype)
                       for _ in range(cfg.num_layers)],
        },
        "sga_pool": init_attn_pool_1d(nk(), H, 1, dtype),
        "cbn": {"cbns": cbns,
                "ln": {"scale": jnp.ones((cfg.cbn_out_dim,), dtype),
                       "bias": jnp.zeros((cfg.cbn_out_dim,), dtype)}},
        "combine": {  # BranchCombineLayer
            "linear_cga": [L.init_linear(nk(), H, out2, dtype)
                           for _ in range(2)],
            "linear_cbn": [L.init_linear(nk(), cfg.cbn_out_dim, out2,
                                         dtype) for _ in range(2)],
            "linear_ques": [L.init_linear(nk(), H, out2, dtype)
                            for _ in range(2)],
            "ln": [{"scale": jnp.ones((out2,), dtype),
                    "bias": jnp.zeros((out2,), dtype)} for _ in range(3)],
        },
        "classifier": [L.init_linear(nk(), out2, cfg.num_answers, dtype)
                       for _ in range(3)],   # TripleLinear
    }


def sa_embedding_fwd(p: Params, x, mask, cfg: MovieMcanConfig):
    """SAEmbedding.forward (embeddings.py:488-501): LSTM → N self-attn
    blocks → attn-pool vec [B, num_feat, H]."""
    out = L.lstm_fwd(p["lstm"], x)
    for blk in p["blocks"]:
        out = self_attention_fwd(blk, out, mask, cfg.num_attn,
                                 cfg.layer_norm_eps)
    B = x.shape[0]
    vec = attn_pool_1d_fwd(p["attn_pool"], out, out, mask).reshape(
        B, cfg.num_feat, -1)
    return out, vec


def sga_embedding_fwd(p: Params, x, y, y_mask, cfg: MovieMcanConfig):
    """SGAEmbedding.forward (embeddings.py:523-540); x is NCHW grid
    features → [B, HW, C] → linear → N guided blocks."""
    if x.ndim == 4:
        B, C, Hh, Ww = x.shape
        x = x.reshape(B, C, Hh * Ww).transpose(0, 2, 1)
    x = L.linear_fwd(p["linear"], x)
    for blk in p["blocks"]:
        x = self_guided_attention_fwd(blk, x, y, None, y_mask,
                                      cfg.num_attn, cfg.layer_norm_eps)
    return x


def cbn_embedding_fwd(p: Params, x, v, cfg: MovieMcanConfig):
    """CBNEmbedding.forward (embeddings.py:589-599)."""
    for cbn in p["cbns"]:
        x = movie_bottleneck_fwd(cbn, x, v, cfg.compressed)
    pooled = x.mean(axis=(2, 3))
    return layer_norm(pooled, p["ln"]["scale"], p["ln"]["bias"],
                      cfg.layer_norm_eps)


def branch_combine_fwd(p: Params, v_cga, v_cbn, q, eps: float,
                       training: bool = False):
    """BranchCombineLayer.forward (layers.py:713-729)."""
    f0 = layer_norm(L.linear_fwd(p["linear_ques"][0], q)
                    + L.linear_fwd(p["linear_cbn"][0], v_cbn)
                    + L.linear_fwd(p["linear_cga"][0], v_cga),
                    p["ln"][0]["scale"], p["ln"][0]["bias"], eps)
    if not training:
        return f0
    f1 = layer_norm(L.linear_fwd(p["linear_cbn"][1], v_cbn),
                    p["ln"][1]["scale"], p["ln"][1]["bias"], eps)
    f2 = layer_norm(L.linear_fwd(p["linear_ques"][1], q)
                    + L.linear_fwd(p["linear_cga"][1], v_cga),
                    p["ln"][2]["scale"], p["ln"][2]["bias"], eps)
    return jnp.stack([f0, f1, f2], axis=1)


def movie_mcan_forward(params: Params, cfg: MovieMcanConfig,
                       text_tokens: jnp.ndarray, image: jnp.ndarray,
                       training: bool = False) -> jnp.ndarray:
    """MoVieMcan.forward (movie_mcan.py:253-274).  ``image`` is NCHW
    grid features.  Eval returns the fused branch through
    TripleLinear's first head; training returns [B, 3, A]."""
    text_mask = text_tokens == 0
    x = params["word_embedding"][text_tokens]
    text_total, text_vec = sa_embedding_fwd(params["sa"], x, text_mask,
                                            cfg)
    sga = sga_embedding_fwd(params["sga"], image, text_total, text_mask,
                            cfg)
    sga_pooled = attn_pool_1d_fwd(params["sga_pool"], sga, sga,
                                  None)[:, 0]
    cbn = cbn_embedding_fwd(params["cbn"], image, text_vec[:, 0], cfg)
    joint = branch_combine_fwd(params["combine"], sga_pooled, cbn,
                               text_vec[:, 1], cfg.layer_norm_eps,
                               training)
    if training:
        return jnp.stack(
            [L.linear_fwd(params["classifier"][i], joint[:, i])
             for i in range(3)], axis=1)
    return L.linear_fwd(params["classifier"][0], joint)
