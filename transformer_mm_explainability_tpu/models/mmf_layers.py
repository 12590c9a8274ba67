"""TPU-native MMF module library: the building blocks of the MMF model
zoo (Pythia / LoRRA / BUTD / BAN / CNNLSTM / TopDownBottomUp).

Functional JAX re-designs of the reference torch modules in
``VisualBERT/mmf/modules/layers.py`` (ReLUWithWeightNormFC:86-97,
ClassifierLayer:99-124, LogitClassifier:185-214,
WeightNormClassifier:216-230, NonLinearElementMultiply:363-396,
TopDownAttentionLSTM:398-435, TwoLayerElementMultiply:437-468,
BCNet:531-604, FCNet:606-638, BiAttention:640-668, ConvNet:12-42),
``mmf/modules/attention.py`` (TopDownAttention:116-163) and
``mmf/modules/embeddings.py`` (AttentionTextEmbedding:132-190,
BiLSTMTextEmbedding:71-112, ImageFeatureEmbedding:218-261,
ImageFinetune:285-302).

TPU-first design decisions (not a port):

* every block is a pure ``init_* / *_fwd`` pair over a params pytree —
  no registry-mediated hidden state: the BUTD dual-LSTM state the
  reference smuggles through a global registry
  (``registry.register(f"{device}_lstm_state", ...)``) is an explicit
  ``lax.scan`` carry here;
* recurrent nets hoist the input projection out of the time loop: the
  ``x @ W_ih^T`` product for *all* timesteps is one large MXU matmul,
  and the scan body only carries the [B,H]x[H,4H] recurrent product;
* k=1 convolutions are expressed as einsum matmuls (MXU) rather than
  ``lax.conv`` with singleton windows;
* weight-norm layers keep the torch parameterisation (v, g) so
  published checkpoints convert 1:1, but fold ``g/||v||`` into the
  weight *once* per forward instead of per-call.

Dropout is omitted (inference semantics == reference ``.eval()``);
training paths thread an optional rng through ``dropout()``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initialisers
# ---------------------------------------------------------------------------

def _kaiming_linear(key: jax.Array, out_dim: int, in_dim: int,
                    dtype=jnp.float32) -> Params:
    """torch nn.Linear default init (kaiming uniform, bound 1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def init_linear(key: jax.Array, in_dim: int, out_dim: int,
                dtype=jnp.float32) -> Params:
    return _kaiming_linear(key, out_dim, in_dim, dtype)


def linear_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"].T + p["b"]


def init_weight_norm_fc(key: jax.Array, in_dim: int, out_dim: int,
                        dtype=jnp.float32) -> Params:
    """weight_norm(nn.Linear, dim=None): v [out,in], scalar g = ||v||_F
    at init (torch initialises g to the norm of the initial weight)."""
    p = _kaiming_linear(key, out_dim, in_dim, dtype)
    v = p["w"]
    return {"v": v, "g": jnp.linalg.norm(v).astype(dtype), "b": p["b"]}


def weight_norm_fc_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ (g * v/||v||_F)^T + b — the dim=None weight_norm."""
    w = p["v"] * (p["g"] / jnp.linalg.norm(p["v"]))
    return x @ w.T + p["b"]


def init_weight_norm_fc_dim0(key: jax.Array, in_dim: int, out_dim: int,
                             dtype=jnp.float32) -> Params:
    """weight_norm(nn.Linear) default dim=0: per-output-row g [out]."""
    p = _kaiming_linear(key, out_dim, in_dim, dtype)
    v = p["w"]
    g = jnp.linalg.norm(v, axis=1).astype(dtype)
    return {"v": v, "g": g, "b": p["b"]}


def weight_norm_fc_dim0_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = p["v"] * (p["g"] / jnp.linalg.norm(p["v"], axis=1))[:, None]
    return x @ w.T + p["b"]


def init_relu_weight_norm_fc(key: jax.Array, in_dim: int, out_dim: int,
                             dtype=jnp.float32) -> Params:
    """ReLUWithWeightNormFC (layers.py:86-97)."""
    return init_weight_norm_fc(key, in_dim, out_dim, dtype)


def relu_weight_norm_fc_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.relu(weight_norm_fc_fwd(p, x))


def init_gated_tanh(key: jax.Array, in_dim: int, out_dim: int,
                    dtype=jnp.float32) -> Params:
    """GatedTanh (layers.py:59-84): y~ = tanh(Wx+b), g = sigmoid(W'x+b'),
    y = y~ * g."""
    k1, k2 = jax.random.split(key)
    return {"fc": init_linear(k1, in_dim, out_dim, dtype),
            "gate": init_linear(k2, in_dim, out_dim, dtype)}


def gated_tanh_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.tanh(linear_fwd(p["fc"], x)) * jax.nn.sigmoid(
        linear_fwd(p["gate"], x))


# ---------------------------------------------------------------------------
# recurrent cores (torch gate semantics, MXU-hoisted input projection)
# ---------------------------------------------------------------------------

def init_lstm(key: jax.Array, input_size: int, hidden_size: int,
              dtype=jnp.float32) -> Params:
    """One torch nn.LSTM layer (gate order i,f,g,o; two bias vectors)."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_size)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (4 * hidden_size, input_size)),
        "w_hh": u(ks[1], (4 * hidden_size, hidden_size)),
        "b_ih": u(ks[2], (4 * hidden_size,)),
        "b_hh": u(ks[3], (4 * hidden_size,)),
    }


def lstm_cell(p: Params, x_proj: jnp.ndarray, h: jnp.ndarray,
              c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One LSTM step.  ``x_proj`` is the precomputed x@W_ih^T + b_ih
    (hoisted out of the scan so the big matmul runs once on the MXU)."""
    gates = x_proj + h @ p["w_hh"].T + p["b_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def lstm_cell_fwd(p: Params, x: jnp.ndarray, h: jnp.ndarray,
                  c: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """nn.LSTMCell semantics on an un-projected input."""
    return lstm_cell(p, x @ p["w_ih"].T + p["b_ih"], h, c)


def lstm_fwd(p: Params, x: jnp.ndarray,
             reverse: bool = False) -> jnp.ndarray:
    """Run one LSTM direction over [B, T, E] → outputs [B, T, H]."""
    H = p["w_hh"].shape[1]
    B = x.shape[0]
    x_proj = x @ p["w_ih"].T + p["b_ih"]              # [B, T, 4H] one matmul
    x_proj = jnp.swapaxes(x_proj, 0, 1)               # [T, B, 4H] scan axis

    def step(carry, xp):
        h, c = carry
        h, c = lstm_cell(p, xp, h, c)
        return (h, c), h

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    (_, _), out = jax.lax.scan(step, init, x_proj, reverse=reverse)
    return jnp.swapaxes(out, 0, 1)


def init_gru(key: jax.Array, input_size: int, hidden_size: int,
             dtype=jnp.float32) -> Params:
    """One torch nn.GRU layer (gate order r,z,n; b_hn inside r-gate)."""
    ks = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden_size)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (3 * hidden_size, input_size)),
        "w_hh": u(ks[1], (3 * hidden_size, hidden_size)),
        "b_ih": u(ks[2], (3 * hidden_size,)),
        "b_hh": u(ks[3], (3 * hidden_size,)),
    }


def gru_fwd(p: Params, x: jnp.ndarray,
            reverse: bool = False) -> jnp.ndarray:
    """[B, T, E] → [B, T, H] with exact torch GRU gate math:
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))."""
    H = p["w_hh"].shape[1]
    B = x.shape[0]
    x_proj = x @ p["w_ih"].T + p["b_ih"]
    x_proj = jnp.swapaxes(x_proj, 0, 1)

    def step(h, xp):
        hp = h @ p["w_hh"].T + p["b_hh"]
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    init = jnp.zeros((B, H), x.dtype)
    _, out = jax.lax.scan(step, init, x_proj, reverse=reverse)
    return jnp.swapaxes(out, 0, 1)


def init_birnn(key: jax.Array, init_one, input_size: int, hidden_size: int,
               bidirectional: bool, dtype=jnp.float32) -> Params:
    kf, kb = jax.random.split(key)
    p = {"fwd": init_one(kf, input_size, hidden_size, dtype)}
    if bidirectional:
        p["bwd"] = init_one(kb, input_size, hidden_size, dtype)
    return p


def birnn_fwd(p: Params, fwd_one, x: jnp.ndarray) -> jnp.ndarray:
    out = fwd_one(p["fwd"], x)
    if "bwd" in p:
        out = jnp.concatenate([out, fwd_one(p["bwd"], x, reverse=True)],
                              axis=-1)
    return out


# ---------------------------------------------------------------------------
# text embeddings
# ---------------------------------------------------------------------------

def init_attention_text_embedding(
        key: jax.Array, hidden_dim: int, embedding_dim: int,
        conv1_out: int, conv2_out: int, bidirectional: bool = False,
        dtype=jnp.float32) -> Params:
    """AttentionTextEmbedding (embeddings.py:132-190): LSTM → two k=1
    convs → per-glimpse softmax over T → glimpse-weighted sum."""
    ks = jax.random.split(key, 3)
    H = hidden_dim // 2 if bidirectional else hidden_dim
    return {
        "lstm": init_birnn(ks[0], init_lstm, embedding_dim, H,
                           bidirectional, dtype),
        # k=1 conv1d == linear over the channel dim: store as [out,in]
        "conv1": _kaiming_linear(ks[1], conv1_out, hidden_dim, dtype),
        "conv2": _kaiming_linear(ks[2], conv2_out, conv1_out, dtype),
    }


def attention_text_embedding_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, T, E] word vectors → [B, conv2_out * hidden_dim]."""
    lstm_out = birnn_fwd(p["lstm"], lstm_fwd, x)       # [B, T, H]
    a = jax.nn.relu(jnp.einsum("bth,oh->bto", lstm_out, p["conv1"]["w"])
                    + p["conv1"]["b"])
    a = jnp.einsum("btc,oc->bto", a, p["conv2"]["w"]) + p["conv2"]["b"]
    att = jax.nn.softmax(a, axis=1)                    # softmax over T
    feat = jnp.einsum("btg,bth->bgh", att, lstm_out)   # [B, G, H]
    return feat.reshape(feat.shape[0], -1)


def init_bilstm_text_embedding(key: jax.Array, hidden_dim: int,
                               embedding_dim: int, bidirectional: bool,
                               rnn_type: str = "GRU",
                               dtype=jnp.float32) -> Params:
    init_one = init_lstm if rnn_type == "LSTM" else init_gru
    return {"rnn": init_birnn(key, init_one, embedding_dim, hidden_dim,
                              bidirectional, dtype)}


def bilstm_text_embedding_forward_all(p: Params, x: jnp.ndarray,
                                      rnn_type: str = "GRU") -> jnp.ndarray:
    """Static config (rnn_type) stays OUT of the params pytree so the
    whole tree jits as a plain argument."""
    fwd_one = lstm_fwd if rnn_type == "LSTM" else gru_fwd
    return birnn_fwd(p["rnn"], fwd_one, x)


# ---------------------------------------------------------------------------
# modal combine layers
# ---------------------------------------------------------------------------

def init_non_linear_element_multiply(
        key: jax.Array, image_feat_dim: int, ques_emb_dim: int,
        hidden_dim: int, context_dim: Optional[int] = None,
        dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    p = {"fa_image": init_weight_norm_fc(ks[0], image_feat_dim, hidden_dim,
                                         dtype),
         "fa_txt": init_weight_norm_fc(ks[1], ques_emb_dim, hidden_dim,
                                       dtype)}
    if context_dim is not None:
        p["fa_context"] = init_weight_norm_fc(ks[2], context_dim,
                                              hidden_dim, dtype)
    return p


def non_linear_element_multiply_fwd(
        p: Params, image_feat: jnp.ndarray, question_embedding: jnp.ndarray,
        context_embedding: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """NonLinearElementMultiply (layers.py:363-396)."""
    image_fa = jax.nn.relu(weight_norm_fc_fwd(p["fa_image"], image_feat))
    question_fa = jax.nn.relu(weight_norm_fc_fwd(p["fa_txt"],
                                                 question_embedding))
    if image_feat.ndim == 3 and question_fa.ndim != 3:
        question_fa = question_fa[:, None, :]
    joint = image_fa * question_fa
    if context_embedding is not None:
        context_fa = jax.nn.relu(weight_norm_fc_fwd(p["fa_context"],
                                                    context_embedding))
        joint = jnp.concatenate([joint, context_fa * question_fa], axis=1)
    return joint


def init_two_layer_element_multiply(
        key: jax.Array, image_feat_dim: int, ques_emb_dim: int,
        hidden_dim: int, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "fa_image1": init_weight_norm_fc(ks[0], image_feat_dim, hidden_dim,
                                         dtype),
        "fa_image2": init_weight_norm_fc(ks[1], hidden_dim, hidden_dim,
                                         dtype),
        "fa_txt1": init_weight_norm_fc(ks[2], ques_emb_dim, hidden_dim,
                                       dtype),
        "fa_txt2": init_weight_norm_fc(ks[3], hidden_dim, hidden_dim, dtype),
    }


def two_layer_element_multiply_fwd(p: Params, image_feat: jnp.ndarray,
                                   question_embedding: jnp.ndarray
                                   ) -> jnp.ndarray:
    image_fa = relu_weight_norm_fc_fwd(
        p["fa_image2"], relu_weight_norm_fc_fwd(p["fa_image1"], image_feat))
    question_fa = relu_weight_norm_fc_fwd(
        p["fa_txt2"], relu_weight_norm_fc_fwd(p["fa_txt1"],
                                              question_embedding))
    if image_feat.ndim == 3:
        question_fa = question_fa[:, None, :]
    return image_fa * question_fa


def init_mfb_expand(key: jax.Array, img_feat_dim: int, txt_emb_dim: int,
                    hidden_dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"lc_image": init_linear(k1, img_feat_dim, hidden_dim, dtype),
            "lc_ques": init_linear(k2, txt_emb_dim, hidden_dim, dtype)}


def mfb_expand_fwd(p: Params, image_feat: jnp.ndarray,
                   question_embed: jnp.ndarray) -> jnp.ndarray:
    image1 = linear_fwd(p["lc_image"], image_feat)
    ques1 = linear_fwd(p["lc_ques"], question_embed)
    if image_feat.ndim == 3:
        ques1 = ques1[:, None, :]
    return image1 * ques1


def _mfb_squeeze(joint: jnp.ndarray, pool_size: int) -> jnp.ndarray:
    """MFH.mfb_squeeze (layers.py:322-360): sum-pool, signed sqrt, L2."""
    squeezed = joint.ndim == 2
    if squeezed:
        joint = joint[:, None, :]
    B, K, D = joint.shape
    pooled = joint.reshape(B, K, D // pool_size, pool_size).sum(-1)
    sqrt = jnp.sqrt(jax.nn.relu(pooled)) - jnp.sqrt(jax.nn.relu(-pooled))
    flat = sqrt.reshape(B, -1)
    # F.normalize: x / max(||x||_2, eps)
    norm = jnp.maximum(jnp.linalg.norm(flat, axis=-1, keepdims=True), 1e-12)
    out = (flat / norm).reshape(B, K, D // pool_size)
    return out[:, 0, :] if squeezed else out


def init_mfh(key: jax.Array, image_feat_dim: int, ques_emb_dim: int,
             hidden_sizes: Sequence[int], dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, len(hidden_sizes))
    return {"expand": [init_mfb_expand(k, image_feat_dim, ques_emb_dim, h,
                                       dtype)
                       for k, h in zip(ks, hidden_sizes)]}


def mfh_fwd(p: Params, image_feat: jnp.ndarray,
            question_embedding: jnp.ndarray, pool_size: int) -> jnp.ndarray:
    """MFH (layers.py:280-321): chained MFB blocks, concatenated."""
    feats = []
    prev = 1.0
    for exp_p in p["expand"]:
        z = mfb_expand_fwd(exp_p, image_feat, question_embedding)
        z = prev * z if not isinstance(prev, float) else z
        prev = z
        feats.append(_mfb_squeeze(z, pool_size))
    return jnp.concatenate(feats, axis=-1)


# ---------------------------------------------------------------------------
# top-down attention (the Pythia image-attention core)
# ---------------------------------------------------------------------------

_TDA_EPS = 1.0e-08


def mask_attentions(attention: jnp.ndarray,
                    image_locs: jnp.ndarray) -> jnp.ndarray:
    """TopDownAttention._mask_attentions (attention.py:124-138): zero
    all locations >= the per-sample valid count."""
    K = attention.shape[1]
    idx = jnp.arange(K, dtype=attention.dtype)[None, :]
    mask = idx >= image_locs.astype(attention.dtype)[:, None]
    return jnp.where(mask[:, :, None], 0.0, attention)


def top_down_attention_fwd(combined: jnp.ndarray, transform_p: Params,
                           normalization: str,
                           image_locs: Optional[jnp.ndarray] = None
                           ) -> jnp.ndarray:
    """TopDownAttention.forward (attention.py:140-163) given the already
    modal-combined features [B, K, hidden]; returns [B, K, n_att].

    The transform is a LinearTransform (layers.py:488-497) — a
    weight-norm (dim=None) linear, NOT a plain one."""
    raw = weight_norm_fc_fwd(transform_p, combined)
    if normalization.lower() == "softmax":
        att = jax.nn.softmax(raw, axis=1)
        if image_locs is not None:
            att = mask_attentions(att, image_locs)
            s = att.sum(axis=1, keepdims=True)
            s = s + (s == 0).astype(att.dtype) + _TDA_EPS
            att = att / s
    elif normalization.lower() == "sigmoid":
        att = jax.nn.sigmoid(raw)
        if image_locs is not None:
            att = mask_attentions(att, image_locs)
    else:
        raise ValueError(f"unknown normalization {normalization!r}")
    return att


def image_feature_embedding_fwd(
        attention: jnp.ndarray, image_feat: jnp.ndarray,
        order_vectors: Optional[jnp.ndarray] = None
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ImageFeatureEmbedding.forward (embeddings.py:240-261): weighted
    sum of (optionally order-augmented) features per attention glimpse."""
    if order_vectors is not None:
        image_feat = jnp.concatenate([image_feat, order_vectors], axis=-1)
    emb = jnp.einsum("bkg,bkd->bgd", attention, image_feat)
    return emb.reshape(emb.shape[0], -1), attention


# ---------------------------------------------------------------------------
# classifiers
# ---------------------------------------------------------------------------

def init_logit_classifier(key: jax.Array, in_dim: int, out_dim: int,
                          text_hidden_dim: int, img_hidden_dim: int,
                          dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "f_o_text": init_weight_norm_fc(ks[0], in_dim, text_hidden_dim,
                                        dtype),
        "f_o_image": init_weight_norm_fc(ks[1], in_dim, img_hidden_dim,
                                         dtype),
        "linear_text": init_linear(ks[2], text_hidden_dim, out_dim, dtype),
        "linear_image": init_linear(ks[3], img_hidden_dim, out_dim, dtype),
    }


def logit_classifier_fwd(p: Params, joint: jnp.ndarray) -> jnp.ndarray:
    """LogitClassifier (layers.py:185-214): two-branch sum."""
    text_val = linear_fwd(p["linear_text"],
                          relu_weight_norm_fc_fwd(p["f_o_text"], joint))
    image_val = linear_fwd(p["linear_image"],
                           relu_weight_norm_fc_fwd(p["f_o_image"], joint))
    return text_val + image_val


def init_weight_norm_classifier(key: jax.Array, in_dim: int, out_dim: int,
                                hidden_dim: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fc1": init_weight_norm_fc(k1, in_dim, hidden_dim, dtype),
            "fc2": init_weight_norm_fc(k2, hidden_dim, out_dim, dtype)}


def weight_norm_classifier_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return weight_norm_fc_fwd(p["fc2"],
                              jax.nn.relu(weight_norm_fc_fwd(p["fc1"], x)))


def init_mlp_classifier(key: jax.Array, in_dim: int, out_dim: int,
                        hidden_dim: Optional[int] = None,
                        num_layers: int = 0, dtype=jnp.float32) -> Params:
    """MLPClassifer (layers.py:148-182) with batch_norm in eval mode."""
    if hidden_dim is None:
        hidden_dim = in_dim
    ks = jax.random.split(key, num_layers + 1)
    hidden = []
    d = in_dim
    for i in range(num_layers):
        hidden.append({
            "lin": init_linear(ks[i], d, hidden_dim, dtype),
            "bn": {"scale": jnp.ones((hidden_dim,), dtype),
                   "bias": jnp.zeros((hidden_dim,), dtype),
                   "mean": jnp.zeros((hidden_dim,), dtype),
                   "var": jnp.ones((hidden_dim,), dtype)},
        })
        d = hidden_dim
    return {"hidden": hidden, "out": init_linear(ks[-1], d, out_dim, dtype)}


def mlp_classifier_fwd(p: Params, x: jnp.ndarray,
                       bn_eps: float = 1e-5) -> jnp.ndarray:
    for layer in p["hidden"]:
        x = linear_fwd(layer["lin"], x)
        bn = layer["bn"]
        x = (x - bn["mean"]) / jnp.sqrt(bn["var"] + bn_eps)
        x = x * bn["scale"] + bn["bias"]
        x = jax.nn.relu(x)
    return linear_fwd(p["out"], x)


# ---------------------------------------------------------------------------
# BAN blocks: FCNet / BCNet / BiAttention
# ---------------------------------------------------------------------------

def init_fc_net(key: jax.Array, dims: Sequence[int],
                act: Optional[str] = None, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, len(dims) - 1)
    return {"layers": [init_weight_norm_fc(ks[i], dims[i], dims[i + 1],
                                           dtype)
                       for i in range(len(dims) - 1)]}


def fc_net_fwd(p: Params, x: jnp.ndarray,
               act: Optional[str] = None) -> jnp.ndarray:
    """FCNet (layers.py:606-638): weight-norm linears + optional act.
    ``act`` is static config, passed per call (never stored in params)."""
    fn = {None: lambda y: y, "ReLU": jax.nn.relu,
          "LeakyReLU": jax.nn.leaky_relu}[act]
    for layer in p["layers"]:
        x = fn(weight_norm_fc_fwd(layer, x))
    return x


def init_bc_net(key: jax.Array, v_dim: int, q_dim: int, h_dim: int,
                h_out: Optional[int], act: str = "ReLU", k: int = 3,
                dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {
        "v_net": init_fc_net(ks[0], [v_dim, h_dim * k], act, dtype),
        "q_net": init_fc_net(ks[1], [q_dim, h_dim * k], act, dtype),
    }
    if h_out is not None and h_out <= 32:
        p["h_mat"] = jax.random.normal(ks[2], (1, h_out, 1, h_dim * k),
                                       dtype)
        p["h_bias"] = jax.random.normal(ks[3], (1, h_out, 1, 1), dtype)
    elif h_out is not None:
        p["h_net"] = init_weight_norm_fc(ks[2], h_dim * k, h_out, dtype)
    return p


def bc_net_fwd(p: Params, v: jnp.ndarray, q: jnp.ndarray,
               h_out: Optional[int],
               h_mat: Optional[jnp.ndarray] = None,
               act: str = "ReLU") -> jnp.ndarray:
    """BCNet.forward (layers.py:566-591) — h_out <= c branch returns
    [B, h_out, K, T] glimpse logits.  ``h_mat`` overrides the stored
    parameter (BiAttention weight-norms it externally); ``h_out``/``act``
    are static config, passed per call."""
    v_ = fc_net_fwd(p["v_net"], v, act)                # [B, K, h*k]
    q_ = fc_net_fwd(p["q_net"], q, act)                # [B, T, h*k]
    if h_out is None:
        return jnp.einsum("bkd,btd->bktd", v_, q_)     # d_ spread (unused)
    if h_out <= 32:
        hm = p["h_mat"] if h_mat is None else h_mat
        h_ = v_[:, None, :, :] * hm                    # [B, G, K, h*k]
        logits = jnp.einsum("bgkd,btd->bgkt", h_, q_)
        return logits + p["h_bias"]
    d_ = jnp.einsum("bkd,btd->bktd", v_, q_)
    return jnp.moveaxis(weight_norm_fc_fwd(p["h_net"], d_), 3, 1)


def bc_net_forward_with_weights(p: Params, v: jnp.ndarray, q: jnp.ndarray,
                                w: jnp.ndarray, k: int = 1,
                                act: str = "ReLU") -> jnp.ndarray:
    """BCNet.forward_with_weights (layers.py:593-604): bilinear pooling
    through one glimpse's attention map w [B, K, T]."""
    v_ = fc_net_fwd(p["v_net"], v, act)                # [B, K, D]
    q_ = fc_net_fwd(p["q_net"], q, act)                # [B, T, D]
    logits = jnp.einsum("bkd,bkt,btd->bd", v_, w, q_)
    if k > 1:
        B, D = logits.shape
        logits = logits.reshape(B, D // k, k).mean(-1) * k
    return logits


def init_bi_attention(key: jax.Array, x_dim: int, y_dim: int, z_dim: int,
                      glimpse: int, k: int = 3, dtype=jnp.float32) -> Params:
    """BiAttention (layers.py:640-668): BCNet with weight-normed h_mat
    (name="h_mat", dim=None ⇒ scalar g over the whole tensor)."""
    p = init_bc_net(key, x_dim, y_dim, z_dim, glimpse, k=k, dtype=dtype)
    v = p.pop("h_mat")
    p["h_mat_v"] = v
    p["h_mat_g"] = jnp.linalg.norm(v).astype(dtype)
    return {"logits": p}


def bi_attention_forward_all(p: Params, v: jnp.ndarray, q: jnp.ndarray,
                             v_mask: bool = True, act: str = "ReLU"
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    bc = p["logits"]
    h_mat = bc["h_mat_v"] * (bc["h_mat_g"] / jnp.linalg.norm(bc["h_mat_v"]))
    glimpse = h_mat.shape[1]                           # static [1,G,1,D]
    logits = bc_net_fwd(bc, v, q, glimpse, h_mat=h_mat, act=act)
    if v_mask:
        empty = (jnp.abs(v).sum(2) == 0)               # [B, K]
        logits = jnp.where(empty[:, None, :, None], -jnp.inf, logits)
    B, G, K, T = logits.shape
    att = jax.nn.softmax(logits.reshape(B, G, K * T), axis=2)
    return att.reshape(B, G, K, T), logits


# ---------------------------------------------------------------------------
# classic (pre-top-down) attentions — TopDownBottomUp model inputs
# ---------------------------------------------------------------------------

def init_concatenation_attention(key: jax.Array, image_feat_dim: int,
                                 txt_emb_dim: int, hidden_size: int,
                                 dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"fa": init_gated_tanh(k1, image_feat_dim + txt_emb_dim,
                                  hidden_size, dtype),
            "lc": init_linear(k2, hidden_size, 1, dtype)}


def concatenation_attention_fwd(p: Params, image_feat: jnp.ndarray,
                                question_embedding: jnp.ndarray
                                ) -> jnp.ndarray:
    """ConcatenationAttention (attention.py:40-58): concat → GatedTanh →
    linear → softmax over locations, broadcast to feature width."""
    K = image_feat.shape[1]
    q = jnp.broadcast_to(question_embedding[:, None, :],
                         (image_feat.shape[0], K,
                          question_embedding.shape[-1]))
    raw = linear_fwd(p["lc"], gated_tanh_fwd(
        p["fa"], jnp.concatenate([image_feat, q], axis=2)))
    att = jax.nn.softmax(raw, axis=1)
    return jnp.broadcast_to(att, image_feat.shape)


def init_project_attention(key: jax.Array, image_feat_dim: int,
                           txt_emb_dim: int, hidden_size: int,
                           dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 3)
    return {"fa_image": init_gated_tanh(ks[0], image_feat_dim, hidden_size,
                                        dtype),
            "fa_txt": init_gated_tanh(ks[1], txt_emb_dim, hidden_size,
                                      dtype),
            "lc": init_linear(ks[2], hidden_size, 1, dtype)}


def project_attention_raw(p: Params, image_feat: jnp.ndarray,
                          question_embedding: jnp.ndarray) -> jnp.ndarray:
    image_fa = gated_tanh_fwd(p["fa_image"], image_feat)
    question_fa = gated_tanh_fwd(p["fa_txt"], question_embedding)
    return linear_fwd(p["lc"], image_fa * question_fa[:, None, :])


def project_attention_fwd(p: Params, image_feat: jnp.ndarray,
                          question_embedding: jnp.ndarray) -> jnp.ndarray:
    """ProjectAttention (attention.py:61-89)."""
    att = jax.nn.softmax(project_attention_raw(p, image_feat,
                                               question_embedding), axis=1)
    return jnp.broadcast_to(att, image_feat.shape)


def init_double_project_attention(key: jax.Array, image_feat_dim: int,
                                  txt_emb_dim: int, hidden_size: int,
                                  dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {"att1": init_project_attention(k1, image_feat_dim, txt_emb_dim,
                                           hidden_size, dtype),
            "att2": init_project_attention(k2, image_feat_dim, txt_emb_dim,
                                           hidden_size, dtype)}


def double_project_attention_fwd(p: Params, image_feat: jnp.ndarray,
                                 question_embedding: jnp.ndarray
                                 ) -> jnp.ndarray:
    """DoubleProjectAttention (attention.py:92-112): sum of two raw
    project attentions, one softmax."""
    raw = (project_attention_raw(p["att1"], image_feat, question_embedding)
           + project_attention_raw(p["att2"], image_feat,
                                   question_embedding))
    att = jax.nn.softmax(raw, axis=1)
    return jnp.broadcast_to(att, image_feat.shape)


# ---------------------------------------------------------------------------
# BUTD recurrent attention blocks
# ---------------------------------------------------------------------------

def init_top_down_attention_lstm(key: jax.Array, image_feat_dim: int,
                                 embed_dim: int, hidden_dim: int,
                                 attention_dim: int,
                                 dtype=jnp.float32) -> Params:
    """TopDownAttentionLSTM (layers.py:398-435).  fa_image/fa_hidden are
    default weight_norm (dim=0)."""
    ks = jax.random.split(key, 3)
    return {
        "fa_image": init_weight_norm_fc_dim0(ks[0], image_feat_dim,
                                             attention_dim, dtype),
        "fa_hidden": init_weight_norm_fc_dim0(ks[1], hidden_dim,
                                              attention_dim, dtype),
        "td_lstm": init_lstm(ks[2], embed_dim + image_feat_dim + hidden_dim,
                             hidden_dim, dtype),
    }


def top_down_attention_lstm_fwd(
        p: Params, image_feat: jnp.ndarray, embedding: jnp.ndarray,
        h1: jnp.ndarray, c1: jnp.ndarray, h2: jnp.ndarray
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One step: explicit (h1, c1) carry instead of the reference's
    registry-side-channel state.  Returns (joint [B,K,att], h1', c1')."""
    image_feat_mean = image_feat.mean(1)
    x = jnp.concatenate([h2, image_feat_mean, embedding], axis=1)
    h1, c1 = lstm_cell_fwd(p["td_lstm"], x, h1, c1)
    image_fa = weight_norm_fc_dim0_fwd(p["fa_image"], image_feat)
    hidden_fa = weight_norm_fc_dim0_fwd(p["fa_hidden"], h1)
    joint = jax.nn.relu(image_fa + hidden_fa[:, None, :])
    return joint, h1, c1


def init_language_decoder(key: jax.Array, in_dim: int, out_dim: int,
                          hidden_dim: int, fc_bias_init: float = 0.0,
                          dtype=jnp.float32) -> Params:
    """LanguageDecoder (decoders.py:55-86): weight_norm fc (dim=0),
    bias filled with fc_bias_init.  (The reference's
    ``fc.weight.data.uniform_`` after weight_norm wrapping is a no-op —
    weight_norm recomputes the weight from weight_v/weight_g on every
    forward — so it is deliberately not reproduced.)"""
    k1, k2 = jax.random.split(key)
    v = jax.random.uniform(k1, (out_dim, hidden_dim), dtype, -0.1, 0.1)
    fc = {"v": v, "g": jnp.linalg.norm(v, axis=1).astype(dtype),
          "b": jnp.full((out_dim,), fc_bias_init, dtype)}
    return {"fc": fc,
            "lm_lstm": init_lstm(k2, in_dim + hidden_dim, hidden_dim,
                                 dtype)}


def language_decoder_fwd(p: Params, weighted_attn: jnp.ndarray,
                         h1: jnp.ndarray, h2: jnp.ndarray, c2: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One step; explicit (h2, c2) carry.  Returns (logits, h2', c2')."""
    x = jnp.concatenate([weighted_attn, h1], axis=1)
    h2, c2 = lstm_cell_fwd(p["lm_lstm"], x, h2, c2)
    return weight_norm_fc_dim0_fwd(p["fc"], h2), h2, c2


def init_visdial_discriminator(key: jax.Array, emb_out_dim: int,
                               hidden_dim: int, dtype=jnp.float32) -> Params:
    """VisDialDiscriminator (decoders.py:8-52): project embedded answer
    options into the joint space, score by dot product."""
    return {"projection": init_linear(key, emb_out_dim, hidden_dim, dtype)}


def visdial_discriminator_fwd(p: Params, option_embeddings: jnp.ndarray,
                              encoder_output: jnp.ndarray) -> jnp.ndarray:
    """option_embeddings [N, n_options, emb_out] (already text-embedded,
    the caller runs the shared TextEmbedding), encoder_output
    [N, hidden] → scores [N, n_options]."""
    opts = linear_fwd(p["projection"], option_embeddings)
    return (opts * encoder_output[:, None, :]).sum(-1)


# ---------------------------------------------------------------------------
# CNN blocks (cnn_lstm baseline)
# ---------------------------------------------------------------------------

def init_conv_net(key: jax.Array, in_channels: int, out_channels: int,
                  kernel_size: int, dtype=jnp.float32) -> Params:
    """ConvNet (layers.py:12-42): conv → leaky_relu → maxpool → BN."""
    kw, kb = jax.random.split(key)
    fan_in = in_channels * kernel_size * kernel_size
    bound = 1.0 / jnp.sqrt(fan_in)
    return {
        "w": jax.random.uniform(
            kw, (out_channels, in_channels, kernel_size, kernel_size),
            dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_channels,), dtype, -bound, bound),
        "bn": {"scale": jnp.ones((out_channels,), dtype),
               "bias": jnp.zeros((out_channels,), dtype),
               "mean": jnp.zeros((out_channels,), dtype),
               "var": jnp.ones((out_channels,), dtype)},
    }


def conv_net_fwd(p: Params, x: jnp.ndarray, pool_stride: int = 2,
                 bn_eps: float = 1e-5) -> jnp.ndarray:
    """x: [B, C, H, W] (NCHW, torch layout)."""
    k = p["w"].shape[-1]
    pad = k // 2
    x = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = x + p["b"][None, :, None, None]
    x = jax.nn.leaky_relu(x, negative_slope=0.01)
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 1, pool_stride, pool_stride),
        window_strides=(1, 1, pool_stride, pool_stride),
        padding="VALID")
    bn = p["bn"]
    x = (x - bn["mean"][None, :, None, None]) / jnp.sqrt(
        bn["var"][None, :, None, None] + bn_eps)
    return x * bn["scale"][None, :, None, None] + bn["bias"][None, :, None,
                                                             None]


# ---------------------------------------------------------------------------
# remaining TextEmbedding family (embeddings.py:21-303)
# ---------------------------------------------------------------------------

def bilstm_text_embedding_fwd(p: Params, x: jnp.ndarray,
                              rnn_type: str = "GRU",
                              bidirectional: bool = True) -> jnp.ndarray:
    """BiLSTMTextEmbedding.forward (embeddings.py:99-107): last-state
    summary.  The reference's branches are inverted AND the
    non-bidirectional path reads an undefined ``self.num_hid`` —
    dead code that crashes (pinned in tests).  We implement the
    documented intent: bidirectional → [last fwd state ‖ first bwd
    state], unidirectional → last state."""
    out = bilstm_text_embedding_forward_all(p, x, rnn_type)
    if not bidirectional:
        return out[:, -1]
    H = out.shape[-1] // 2
    return jnp.concatenate([out[:, -1, :H], out[:, 0, H:]], axis=1)


def init_vocab_embedding(key: jax.Array, vocab_size: int,
                         embedding_dim: int,
                         vectors: Optional[jnp.ndarray] = None,
                         dtype=jnp.float32) -> Params:
    """VocabEmbedding (embeddings.py:59-68): an embedding table,
    optionally seeded from the Vocab's pretrained vectors."""
    if vectors is not None:
        return {"table": jnp.asarray(vectors, dtype)}
    table = jax.random.normal(key, (vocab_size, embedding_dim)) \
        .astype(dtype)
    return {"table": table}


def vocab_embedding_fwd(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return p["table"][x]


class PreExtractedEmbedding:
    """PreExtractedEmbedding (embeddings.py:114-129): per-qid .npy
    lookup with an LRU cache — host-side IO, returns a stacked batch."""

    def __init__(self, out_dim: int, base_path: str,
                 cache_size: int = 5000):
        import functools
        import os

        self.text_out_dim = out_dim
        self.base_path = base_path

        import numpy as _np

        @functools.lru_cache(maxsize=cache_size)
        def get_item(qid: int):
            return _np.load(os.path.join(base_path, f"{qid}.npy"))

        self.get_item = get_item

    def __call__(self, qids) -> jnp.ndarray:
        import numpy as _np
        return jnp.asarray(_np.stack([self.get_item(int(q))
                                      for q in qids], axis=0))


def init_multi_head_image_feature_embedding(
        key: jax.Array, img_dim: int, question_dim: int, num_heads: int,
        dtype=jnp.float32) -> Params:
    """MultiHeadImageFeatureEmbedding (embeddings.py:264-282):
    torch nn.MultiheadAttention(embed_dim=question_dim, kdim=img_dim,
    vdim=img_dim) — separate q/k/v projection shapes, xavier-uniform
    init like torch."""
    ks = jax.random.split(key, 5)

    def xavier(k, shape):
        bound = jnp.sqrt(6.0 / (shape[0] + shape[1]))
        return jax.random.uniform(k, shape, dtype, -bound, bound)

    D, E = question_dim, img_dim
    # static config (num_heads) stays OUT of the params pytree so the
    # tree jits/maps as plain weights — pass it to the fwd instead
    return {
        "q": {"w": xavier(ks[0], (D, D)), "b": jnp.zeros((D,), dtype)},
        "k": {"w": xavier(ks[1], (D, E)), "b": jnp.zeros((D,), dtype)},
        "v": {"w": xavier(ks[2], (D, E)), "b": jnp.zeros((D,), dtype)},
        "out": {"w": xavier(ks[3], (D, D)), "b": jnp.zeros((D,), dtype)},
    }


def multi_head_image_feature_embedding_fwd(
        p: Params, image_feat: jnp.ndarray, question: jnp.ndarray,
        num_heads: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """question [B, D] attends over image_feat [B, N, E] →
    (context [B, D], averaged attention weights [B, 1, N]) — the
    torch MHA convention of head-averaged weights.  ``num_heads`` is
    static config, not a pytree leaf."""
    H = num_heads
    B, N, _ = image_feat.shape
    D = p["q"]["w"].shape[0]
    dh = D // H
    q = (question @ p["q"]["w"].T + p["q"]["b"]).reshape(B, 1, H, dh)
    k = (image_feat @ p["k"]["w"].T + p["k"]["b"]).reshape(B, N, H, dh)
    v = (image_feat @ p["v"]["w"].T + p["v"]["b"]).reshape(B, N, H, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(dh, q.dtype))
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, 1, D)
    out = ctx @ p["out"]["w"].T + p["out"]["b"]
    return out[:, 0], probs.mean(axis=1)


TEXT_EMBEDDING_TYPES = ("identity", "vocab", "projection",
                        "preextracted", "bilstm", "attention", "mcan",
                        "torch")


def init_text_embedding(key: jax.Array, emb_type: str, dtype=jnp.float32,
                        **kwargs):
    """TextEmbedding dispatcher (embeddings.py:21-56) → (params, fwd).
    'mcan' (SAEmbedding) lives in models/movie_mcan; 'projection' in
    models/encoders — both dispatched here for registry completeness."""
    if emb_type == "identity":
        return {}, lambda p, x: x
    if emb_type in ("vocab", "torch"):
        p = init_vocab_embedding(key, kwargs["vocab_size"],
                                 kwargs["embedding_dim"],
                                 kwargs.get("vectors"), dtype)
        return p, vocab_embedding_fwd
    if emb_type == "preextracted":
        mod = PreExtractedEmbedding(kwargs["out_dim"],
                                    kwargs["base_path"])
        return {}, lambda p, qids: mod(qids)
    if emb_type == "bilstm":
        p = init_bilstm_text_embedding(
            key, kwargs["hidden_dim"], kwargs["embedding_dim"],
            kwargs.get("bidirectional", False),
            kwargs.get("rnn_type", "GRU"), dtype)
        rnn_type = kwargs.get("rnn_type", "GRU")
        bidir = kwargs.get("bidirectional", False)
        return p, (lambda p, x: bilstm_text_embedding_fwd(
            p, x, rnn_type, bidir))
    if emb_type == "attention":
        p = init_attention_text_embedding(
            key, kwargs["hidden_dim"], kwargs["embedding_dim"],
            kwargs["conv1_out"], kwargs["conv2_out"],
            kwargs.get("bidirectional", False), dtype)
        return p, attention_text_embedding_fwd
    if emb_type == "mcan":
        from transformer_mm_explainability_tpu.models import movie_mcan
        cfg = movie_mcan.MovieMcanConfig(**kwargs)
        ks = jax.random.split(key, 3)
        p = {"lstm": init_lstm(ks[0], cfg.embedding_dim, cfg.hidden_dim,
                               dtype),
             "blocks": [movie_mcan.init_self_attention(
                 jax.random.fold_in(ks[1], i), cfg.hidden_dim, dtype)
                 for i in range(cfg.num_layers)],
             "attn_pool": movie_mcan.init_attn_pool_1d(
                 ks[2], cfg.hidden_dim, cfg.num_feat, dtype)}
        return p, (lambda p, x, mask=None:
                   movie_mcan.sa_embedding_fwd(p, x, mask, cfg))
    if emb_type == "projection":
        p = init_linear(key, kwargs["in_dim"], kwargs["out_dim"], dtype)
        return p, linear_fwd
    raise NotImplementedError(
        "Unknown question embedding '%s'" % emb_type)
