"""TPU-native MMF model zoo: Pythia, LoRRA, BAN, BUTD, CNNLSTM,
TopDownBottomUp (SURVEY §2 C34).

Functional re-designs of ``VisualBERT/mmf/models/{pythia,lorra,ban,
butd,cnn_lstm,top_down_bottom_up}.py``.  Each model is an
``init_<name>(key, cfg)`` params builder plus a pure ``<name>_forward``
— `sample_list` attribute-plumbing is replaced with explicit arrays,
and MMF's registry/config indirection with one frozen dataclass per
model.

TPU-first notes:

* BUTD's per-timestep Python loop with registry-carried LSTM state
  (butd.py:118-163, decoders.py:70-86) becomes one ``lax.scan`` whose
  carry is (token, h1, c1, h2, c2) — greedy decoding stays entirely
  on-device with static shapes (no ``batch_size_t`` shrinking: TPU
  prefers a fixed batch with masking over dynamic re-slicing);
* Pythia's "iterate over feature streams, then over embedding models"
  nest (pythia.py:214-281) is unrolled at trace time: every stream is
  a fused (combine → transform → masked softmax → weighted sum) chain
  of batched matmuls;
* all recurrent text encoders hoist their input projections out of the
  scan (see mmf_layers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import mmf_layers as L

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Pythia (pythia.py:19-310)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PythiaConfig:
    vocab_size: int = 100
    num_answers: int = 10
    embedding_dim: int = 300
    # text attention embedding (configs/models/pythia/defaults.yaml)
    text_hidden_dim: int = 1024
    conv1_out: int = 512
    conv2_out: int = 2
    # image streams: "finetune" = fc7 Linear+ReLU, "default" = identity
    image_feature_dim: int = 2048
    image_encoders: Sequence[str] = ("finetune", "default")
    combine_hidden_dim: int = 5000
    classifier_text_hidden: int = 300
    classifier_img_hidden: int = 5000

    @property
    def text_out_dim(self) -> int:
        return self.text_hidden_dim * self.conv2_out

    @property
    def image_out_dim(self) -> int:
        return len(self.image_encoders) * self.image_feature_dim


def _init_image_encoder(key: jax.Array, kind: str, feat_dim: int,
                        dtype) -> Params:
    """The encoder *kind* is static config (it lives in the model cfg,
    never in the params pytree, so params jit as plain arguments)."""
    if kind == "finetune":
        # FinetuneFasterRcnnFpnFc7 → ImageFinetune (embeddings.py:285-302)
        return {"lc": L.init_linear(key, feat_dim, feat_dim, dtype)}
    if kind == "default":
        return {}
    raise ValueError(f"unknown image encoder {kind!r}")


def _image_encoder_fwd(p: Params, feat: jnp.ndarray,
                       kind: str) -> jnp.ndarray:
    if kind == "finetune":
        return jax.nn.relu(L.linear_fwd(p["lc"], feat))
    return feat


def _init_feature_stream(key: jax.Array, feat_dim: int, text_dim: int,
                         hidden_dim: int, dtype) -> Params:
    """One ImageFeatureEmbedding: NonLinearElementMultiply combine +
    linear transform (out_dim 1) + softmax normalization."""
    k1, k2 = jax.random.split(key)
    return {
        "combine": L.init_non_linear_element_multiply(
            k1, feat_dim, text_dim, hidden_dim, dtype=dtype),
        "transform": L.init_weight_norm_fc(k2, hidden_dim, 1, dtype),
    }


def _feature_stream_fwd(p: Params, feat: jnp.ndarray, text: jnp.ndarray,
                        locs: Optional[jnp.ndarray],
                        normalization: str = "softmax",
                        order_vectors: Optional[jnp.ndarray] = None
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    combined = L.non_linear_element_multiply_fwd(p["combine"], feat, text)
    att = L.top_down_attention_fwd(combined, p["transform"], normalization,
                                   locs)
    return L.image_feature_embedding_fwd(att, feat,
                                         order_vectors=order_vectors)


def init_pythia(key: jax.Array, cfg: PythiaConfig,
                dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5 + 2 * len(cfg.image_encoders))
    word = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.embedding_dim))
            .astype(dtype))
    encs = [_init_image_encoder(ks[2 + i], kind, cfg.image_feature_dim,
                                dtype)
            for i, kind in enumerate(cfg.image_encoders)]
    n = len(cfg.image_encoders)
    streams = [_init_feature_stream(ks[2 + n + i], cfg.image_feature_dim,
                                    cfg.text_out_dim,
                                    cfg.combine_hidden_dim, dtype)
               for i in range(n)]
    return {
        "word_embedding": word,
        "text_embedding": L.init_attention_text_embedding(
            ks[1], cfg.text_hidden_dim, cfg.embedding_dim, cfg.conv1_out,
            cfg.conv2_out, dtype=dtype),
        "image_encoders": encs,
        "image_streams": streams,
        "combine": L.init_non_linear_element_multiply(
            ks[2 + 2 * n], cfg.image_out_dim, cfg.text_out_dim,
            cfg.combine_hidden_dim, dtype=dtype),
        "classifier": L.init_logit_classifier(
            ks[3 + 2 * n], cfg.combine_hidden_dim, cfg.num_answers,
            cfg.classifier_text_hidden, cfg.classifier_img_hidden, dtype),
    }


def pythia_process_text(params: Params, text_tokens: jnp.ndarray
                        ) -> jnp.ndarray:
    vecs = params["word_embedding"][text_tokens]
    return L.attention_text_embedding_fwd(params["text_embedding"], vecs)


def pythia_process_image(params: Params, cfg: PythiaConfig,
                         image_features: Sequence[jnp.ndarray],
                         text_embedding: jnp.ndarray,
                         image_locs: Optional[Sequence[Optional[jnp.ndarray]]]
                         = None) -> Tuple[jnp.ndarray, list]:
    """process_feature_embedding (pythia.py:214-281) for the image
    modality: encode each stream, attend, concat."""
    if image_locs is None:
        image_locs = [None] * len(image_features)
    embs, atts = [], []
    for enc_p, stream_p, feat, locs, kind in zip(
            params["image_encoders"], params["image_streams"],
            image_features, image_locs, cfg.image_encoders):
        encoded = _image_encoder_fwd(enc_p, feat, kind)
        emb, att = _feature_stream_fwd(stream_p, encoded, text_embedding,
                                       locs)
        embs.append(emb)
        atts.append(att[..., 0])
    return jnp.concatenate(embs, axis=1), atts


def pythia_forward(params: Params, cfg: PythiaConfig,
                   text_tokens: jnp.ndarray,
                   image_features: Sequence[jnp.ndarray],
                   image_locs: Optional[Sequence[Optional[jnp.ndarray]]]
                   = None) -> jnp.ndarray:
    """Pythia.forward (pythia.py:293-310) → answer scores [B, A]."""
    text_total = pythia_process_text(params, text_tokens)
    image_total, _ = pythia_process_image(params, cfg, image_features,
                                          text_total, image_locs)
    joint = L.non_linear_element_multiply_fwd(params["combine"],
                                              image_total, text_total)
    return L.logit_classifier_fwd(params["classifier"], joint)


def pythia_question_only_forward(params: Params, cfg: PythiaConfig,
                                 text_tokens: jnp.ndarray) -> jnp.ndarray:
    """PythiaQuestionOnly.forward (pythia.py:314-336): zeroed text
    embedding through the text branch only."""
    text_total = pythia_process_text(params, text_tokens)
    zeros = jnp.zeros_like(text_total)
    joint = jax.nn.relu(
        L.weight_norm_fc_fwd(params["combine"]["fa_txt"], zeros))
    cls = params["classifier"]
    return L.linear_fwd(cls["linear_text"],
                        L.relu_weight_norm_fc_fwd(cls["f_o_text"], joint))


def pythia_image_only_forward(params: Params, cfg: PythiaConfig,
                              text_tokens: jnp.ndarray,
                              image_features: Sequence[jnp.ndarray],
                              image_locs=None) -> jnp.ndarray:
    """PythiaImageOnly.forward (pythia.py:340-365)."""
    text_total = pythia_process_text(params, text_tokens)
    zeros = jnp.zeros_like(text_total)
    image_total, _ = pythia_process_image(params, cfg, image_features,
                                          zeros, image_locs)
    joint = jax.nn.relu(
        L.weight_norm_fc_fwd(params["combine"]["fa_image"], image_total))
    return L.logit_classifier_fwd(params["classifier"], joint)


# ---------------------------------------------------------------------------
# PythiaMultiHead — registry name "multihead" (pythia.py:368-505)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class PythiaMultiHeadConfig(PythiaConfig):
    """Pythia with per-stream feature *projectors* and multi-head
    attention feature embeddings (MultiHeadImageFeatureEmbedding,
    embeddings.py:264-282) instead of the top-down attention streams."""
    projection_dim: int = 1024
    num_attention_heads: int = 4
    embeddings_per_stream: int = 1

    @property
    def image_out_dim(self) -> int:  # out_dim == question_dim per embedding
        return (len(self.image_encoders) * self.embeddings_per_stream
                * self.text_out_dim)


def init_pythia_multihead(key: jax.Array, cfg: PythiaMultiHeadConfig,
                          dtype=jnp.float32) -> Params:
    """PythiaMultiHead.build (pythia.py:375-385): word embedding, text
    attention embedding, per-stream encoder → projector → N multi-head
    attention embeddings, combine layer, logit classifier."""
    n = len(cfg.image_encoders)
    ks = jax.random.split(key, 4 + n * (2 + cfg.embeddings_per_stream))
    word = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.embedding_dim))
            .astype(dtype))
    encs, projs, embs = [], [], []
    ki = 4
    for kind in cfg.image_encoders:
        encs.append(_init_image_encoder(ks[ki], kind, cfg.image_feature_dim,
                                        dtype))
        # _init_feature_projectors (pythia.py:386-399): a linear image
        # encoder projecting feat_dim → projection_dim
        projs.append({"lc": L.init_linear(ks[ki + 1], cfg.image_feature_dim,
                                          cfg.projection_dim, dtype)})
        stream_embs = [
            L.init_multi_head_image_feature_embedding(
                ks[ki + 2 + j], cfg.projection_dim, cfg.text_out_dim,
                cfg.num_attention_heads, dtype)
            for j in range(cfg.embeddings_per_stream)]
        embs.append(stream_embs)
        ki += 2 + cfg.embeddings_per_stream
    return {
        "word_embedding": word,
        "text_embedding": L.init_attention_text_embedding(
            ks[1], cfg.text_hidden_dim, cfg.embedding_dim, cfg.conv1_out,
            cfg.conv2_out, dtype=dtype),
        "image_encoders": encs,
        "image_projectors": projs,
        "image_embeddings": embs,
        "combine": L.init_non_linear_element_multiply(
            ks[2], cfg.image_out_dim, cfg.text_out_dim,
            cfg.combine_hidden_dim, dtype=dtype),
        "classifier": L.init_logit_classifier(
            ks[3], cfg.combine_hidden_dim, cfg.num_answers,
            cfg.classifier_text_hidden, cfg.classifier_img_hidden, dtype),
    }


def pythia_multihead_forward(params: Params, cfg: PythiaMultiHeadConfig,
                             text_tokens: jnp.ndarray,
                             image_features: Sequence[jnp.ndarray]
                             ) -> jnp.ndarray:
    """PythiaMultiHead.process_feature_embedding (pythia.py:435-505):
    encode → project → multi-head attend (question as query) → concat,
    then the inherited Pythia combine + classifier."""
    text_total = pythia_process_text(params, text_tokens)
    embs, atts = [], []
    for enc_p, proj_p, emb_ps, feat, kind in zip(
            params["image_encoders"], params["image_projectors"],
            params["image_embeddings"], image_features, cfg.image_encoders):
        encoded = _image_encoder_fwd(enc_p, feat, kind)
        projected = L.linear_fwd(proj_p["lc"], encoded)
        for emb_p in emb_ps:
            emb, att = L.multi_head_image_feature_embedding_fwd(
                emb_p, projected, text_total, cfg.num_attention_heads)
            embs.append(emb)
            atts.append(att)
    image_total = jnp.concatenate(embs, axis=1)
    joint = L.non_linear_element_multiply_fwd(params["combine"],
                                              image_total, text_total)
    return L.logit_classifier_fwd(params["classifier"], joint)


# ---------------------------------------------------------------------------
# LoRRA (lorra.py:8-64) — Pythia + OCR context stream
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LorraConfig(PythiaConfig):
    context_feature_dim: int = 300
    context_max_len: int = 50
    order_vector_dim: int = 50   # context_dim 350 = 300 fasttext + 50 order

    @property
    def context_out_dim(self) -> int:
        return self.context_feature_dim + self.order_vector_dim


def init_lorra(key: jax.Array, cfg: LorraConfig,
               dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = init_pythia(k1, cfg, dtype)
    # context stream: default encoder (identity) + sigmoid attention
    params["context_stream"] = _init_feature_stream(
        k2, cfg.context_feature_dim, cfg.text_out_dim,
        cfg.combine_hidden_dim, dtype)
    # combine layer gains the fa_context branch (context_dim=350)
    params["combine"]["fa_context"] = L.init_weight_norm_fc(
        k3, cfg.context_out_dim, cfg.combine_hidden_dim, dtype)
    # the context branch doubles the joint embedding
    # ([image*txt ‖ context*txt], layers.py NonLinearElementMultiply),
    # so LoRRA's classifier takes 2×combine_hidden_dim
    params["classifier"] = L.init_logit_classifier(
        k4, 2 * cfg.combine_hidden_dim, cfg.num_answers,
        cfg.classifier_text_hidden, cfg.classifier_img_hidden, dtype)
    return params


def lorra_forward(params: Params, cfg: LorraConfig,
                  text_tokens: jnp.ndarray,
                  image_features: Sequence[jnp.ndarray],
                  context_features: jnp.ndarray,
                  order_vectors: jnp.ndarray,
                  image_locs=None,
                  context_locs: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """LoRRA.forward (lorra.py:42-64): image + OCR-context streams into
    the context-augmented combine, classifier over [B, 2*hidden]."""
    text_total = pythia_process_text(params, text_tokens)
    image_total, _ = pythia_process_image(params, cfg, image_features,
                                          text_total, image_locs)
    context_total, _ = _feature_stream_fwd(
        params["context_stream"], context_features, text_total,
        context_locs, normalization="sigmoid", order_vectors=order_vectors)
    joint = L.non_linear_element_multiply_fwd(
        params["combine"], image_total, text_total,
        context_embedding=context_total)
    return L.logit_classifier_fwd(params["classifier"], joint)


# ---------------------------------------------------------------------------
# BAN (ban.py:10-97)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BanConfig:
    vocab_size: int = 100
    num_answers: int = 10
    embedding_dim: int = 300
    num_hidden: int = 1280
    rnn_type: str = "GRU"
    bidirectional: bool = False
    visual_feat_dim: int = 2048
    gamma: int = 4
    bc_k: int = 1


def init_ban(key: jax.Array, cfg: BanConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 4 + 2 * cfg.gamma)
    word = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.embedding_dim))
            .astype(dtype))
    return {
        "word_embedding": word,
        "q_emb": L.init_bilstm_text_embedding(
            ks[1], cfg.num_hidden, cfg.embedding_dim, cfg.bidirectional,
            cfg.rnn_type, dtype),
        "v_att": L.init_bi_attention(ks[2], cfg.visual_feat_dim,
                                     cfg.num_hidden, cfg.num_hidden,
                                     cfg.gamma, k=3, dtype=dtype),
        "b_net": [L.init_bc_net(ks[3 + g], cfg.visual_feat_dim,
                                cfg.num_hidden, cfg.num_hidden, None,
                                k=cfg.bc_k, dtype=dtype)
                  for g in range(cfg.gamma)],
        "q_prj": [L.init_fc_net(ks[3 + cfg.gamma + g],
                                [cfg.num_hidden, cfg.num_hidden], None,
                                dtype)
                  for g in range(cfg.gamma)],
        "classifier": L.init_weight_norm_classifier(
            ks[3 + 2 * cfg.gamma], cfg.num_hidden, cfg.num_answers,
            cfg.num_hidden * 2, dtype),
    }


def ban_forward(params: Params, cfg: BanConfig, text_tokens: jnp.ndarray,
                image_features: jnp.ndarray) -> jnp.ndarray:
    """BAN.forward (ban.py:81-97): glimpse-chained bilinear attention."""
    q = params["word_embedding"][text_tokens]
    q_emb = L.bilstm_text_embedding_forward_all(params["q_emb"], q,
                                                cfg.rnn_type)
    att, _ = L.bi_attention_forward_all(params["v_att"], image_features,
                                        q_emb)
    for g in range(cfg.gamma):
        b_emb = L.bc_net_forward_with_weights(
            params["b_net"][g], image_features, q_emb, att[:, g, :, :],
            k=cfg.bc_k)
        q_emb = L.fc_net_fwd(params["q_prj"][g],
                             b_emb[:, None, :], act=None) + q_emb
    return L.weight_norm_classifier_fwd(params["classifier"],
                                        q_emb.sum(axis=1))


# ---------------------------------------------------------------------------
# BUTD (butd.py:9-179) — captioning with dual-LSTM top-down attention
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ButdConfig:
    vocab_size: int = 100
    embedding_dim: int = 300
    image_feature_dim: int = 2048
    hidden_dim: int = 1024
    attention_dim: int = 1024
    max_length: int = 20
    sos_index: int = 1


def init_butd(key: jax.Array, cfg: ButdConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 5)
    word = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.embedding_dim))
            .astype(dtype))
    return {
        "word_embedding": word,
        "encoder": _init_image_encoder(ks[1], "finetune",
                                       cfg.image_feature_dim, dtype),
        "td_attn": L.init_top_down_attention_lstm(
            ks[2], cfg.image_feature_dim, cfg.embedding_dim,
            cfg.hidden_dim, cfg.attention_dim, dtype),
        "transform": L.init_weight_norm_fc(ks[3], cfg.attention_dim, 1,
                                           dtype),
        "decoder": L.init_language_decoder(
            ks[4], cfg.image_feature_dim, cfg.vocab_size, cfg.hidden_dim,
            dtype=dtype),
    }


def _butd_step(params: Params, feat: jnp.ndarray, token: jnp.ndarray,
               h1, c1, h2, c2):
    """One decode timestep == reference butd.py:146-155 with the
    registry-carried LSTM state made explicit."""
    emb = params["word_embedding"][token]             # [B, E]
    joint, h1, c1 = L.top_down_attention_lstm_fwd(
        params["td_attn"], feat, emb, h1, c1, h2)
    att = L.top_down_attention_fwd(joint, params["transform"], "softmax")
    attended, _ = L.image_feature_embedding_fwd(att, feat)
    logits, h2, c2 = L.language_decoder_fwd(params["decoder"], attended,
                                            h1, h2, c2)
    return logits, h1, c1, h2, c2


def butd_forward(params: Params, cfg: ButdConfig,
                 image_feature_0: jnp.ndarray,
                 teacher_tokens: Optional[jnp.ndarray] = None,
                 timesteps: Optional[int] = None) -> jnp.ndarray:
    """BUTD.forward (butd.py:118-163) as one ``lax.scan``.

    teacher_tokens [B, T] drives teacher forcing; otherwise greedy
    decoding from SOS (inference.type == "greedy").  Returns scores
    [B, T, vocab].
    """
    feat = _image_encoder_fwd(params["encoder"], image_feature_0,
                              "finetune")
    B = feat.shape[0]
    H = cfg.hidden_dim
    zeros = jnp.zeros((B, H), feat.dtype)
    if timesteps is None:
        timesteps = (teacher_tokens.shape[1] if teacher_tokens is not None
                     else cfg.max_length)

    if teacher_tokens is not None:
        def step(carry, token):
            h1, c1, h2, c2 = carry
            logits, h1, c1, h2, c2 = _butd_step(params, feat, token,
                                                h1, c1, h2, c2)
            return (h1, c1, h2, c2), logits

        _, scores = jax.lax.scan(step, (zeros, zeros, zeros, zeros),
                                 jnp.swapaxes(teacher_tokens, 0, 1))
    else:
        sos = jnp.full((B,), cfg.sos_index, jnp.int32)

        def step(carry, _):
            token, h1, c1, h2, c2 = carry
            logits, h1, c1, h2, c2 = _butd_step(params, feat, token,
                                                h1, c1, h2, c2)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, h1, c1, h2, c2), logits

        _, scores = jax.lax.scan(step, (sos, zeros, zeros, zeros, zeros),
                                 None, length=timesteps)
    return jnp.swapaxes(scores, 0, 1)


# ---------------------------------------------------------------------------
# CNNLSTM baseline (cnn_lstm.py:20-102)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CnnLstmConfig:
    vocab_size: int = 100
    num_answers: int = 2
    embedding_dim: int = 20
    lstm_hidden: int = 50
    cnn_input_dims: Sequence[int] = (3, 64, 128, 128, 64, 64)
    cnn_output_dims: Sequence[int] = (64, 128, 128, 64, 64, 10)
    cnn_kernel_sizes: Sequence[int] = (7, 5, 5, 5, 5, 1)
    classifier_in_dim: int = 450


def init_cnn_lstm(key: jax.Array, cfg: CnnLstmConfig,
                  dtype=jnp.float32) -> Params:
    n = len(cfg.cnn_input_dims)
    ks = jax.random.split(key, 3 + n)
    word = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.embedding_dim))
            .astype(dtype))
    return {
        "word_embedding": word,
        "lstm": L.init_birnn(ks[1], L.init_lstm, cfg.embedding_dim,
                             cfg.lstm_hidden, bidirectional=True,
                             dtype=dtype),
        "cnn": [L.init_conv_net(ks[2 + i], cfg.cnn_input_dims[i],
                                cfg.cnn_output_dims[i],
                                cfg.cnn_kernel_sizes[i], dtype)
                for i in range(n)],
        "classifier": L.init_mlp_classifier(ks[2 + n],
                                            cfg.classifier_in_dim,
                                            cfg.num_answers, dtype=dtype),
    }


def cnn_lstm_forward(params: Params, cfg: CnnLstmConfig,
                     text_tokens: jnp.ndarray,
                     image: jnp.ndarray) -> jnp.ndarray:
    """CNNLSTM.forward (cnn_lstm.py:82-102).  image is NCHW."""
    emb = params["word_embedding"][text_tokens]
    out_f = L.lstm_fwd(params["lstm"]["fwd"], emb)
    out_b = L.lstm_fwd(params["lstm"]["bwd"], emb, reverse=True)
    # torch h_n: final hidden per direction = fwd at t=-1, bwd at t=0
    hidden = jnp.concatenate([out_f[:, -1], out_b[:, 0]], axis=-1)
    x = image
    for conv_p in params["cnn"]:
        x = L.conv_net_fwd(conv_p, x)
    x = x.reshape(x.shape[0], -1)
    fused = jnp.concatenate([hidden, x], axis=-1)
    return L.mlp_classifier_fwd(params["classifier"], fused)


# ---------------------------------------------------------------------------
# TopDownBottomUp (top_down_bottom_up.py:9-61)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TdbuConfig:
    vocab_size: int = 100
    num_answers: int = 10
    embedding_dim: int = 300
    text_hidden_dim: int = 1024
    conv1_out: int = 512
    conv2_out: int = 2
    image_feature_dim: int = 2048
    attention_hidden: int = 512
    joint_dim: int = 1024
    classifier_hidden: int = 2048

    @property
    def text_out_dim(self) -> int:
        return self.text_hidden_dim * self.conv2_out


def init_tdbu(key: jax.Array, cfg: TdbuConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 6)
    word = (jax.random.normal(ks[0], (cfg.vocab_size, cfg.embedding_dim))
            .astype(dtype))
    return {
        "word_embedding": word,
        "text_embedding": L.init_attention_text_embedding(
            ks[1], cfg.text_hidden_dim, cfg.embedding_dim, cfg.conv1_out,
            cfg.conv2_out, dtype=dtype),
        "image_attention": L.init_project_attention(
            ks[2], cfg.image_feature_dim, cfg.text_out_dim,
            cfg.attention_hidden, dtype),
        "non_linear_text": L.init_relu_weight_norm_fc(
            ks[3], cfg.text_out_dim, cfg.joint_dim, dtype),
        "non_linear_image": L.init_relu_weight_norm_fc(
            ks[4], cfg.image_feature_dim, cfg.joint_dim, dtype),
        "classifier": L.init_weight_norm_classifier(
            ks[5], cfg.joint_dim, cfg.num_answers, cfg.classifier_hidden,
            dtype),
    }


def tdbu_forward(params: Params, cfg: TdbuConfig, text_tokens: jnp.ndarray,
                 image_features: jnp.ndarray) -> jnp.ndarray:
    """TopDownBottomUp.forward (top_down_bottom_up.py:32-61)."""
    vecs = params["word_embedding"][text_tokens]
    text = L.attention_text_embedding_fwd(params["text_embedding"], vecs)
    att = L.project_attention_fwd(params["image_attention"],
                                  image_features, text)
    image = (att * image_features).sum(axis=1)
    joint = (L.relu_weight_norm_fc_fwd(params["non_linear_text"], text)
             * L.relu_weight_norm_fc_fwd(params["non_linear_image"], image))
    return L.weight_norm_classifier_fwd(params["classifier"], joint)
