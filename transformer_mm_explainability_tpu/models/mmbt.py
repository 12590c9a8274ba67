"""TPU-native MMBT (supervised Multimodal Bitransformer).

Re-design of ``VisualBERT/mmf/models/mmbt.py`` (MMBTConfig:37-53,
ModalEmbeddings:57-118, MMBTModel:121-313, MMBTBase:316-434,
MMBTForPreTraining:437-511, MMBTForClassification:513-553, MMBT:556-628)
on the repo's functional BERT encoder.

The modal stream is [start?] + projected modal tokens + [end?] with its
own position/token-type embeddings, concatenated IN FRONT of the text
embeddings; one BERT encoder + pooler runs over the joint sequence.
The modal encoder itself is pluggable: "direct" passes pre-extracted
features ([B, N, modal_hidden]) straight through (MMBT's
direct_features_input path), matching how this repo treats all
detector-feature frontends (FRCNN runs separately).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import mmf_layers as L
from transformer_mm_explainability_tpu.ops.attention import gelu, layer_norm

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MMBTConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    modal_hidden_size: int = 2048
    num_labels: int = 2
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    use_modal_start_token: bool = True
    use_modal_end_token: bool = True

    def bert_cfg(self) -> jbert.BertConfig:
        return jbert.BertConfig(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            intermediate_size=4 * self.hidden_size,
            max_position_embeddings=self.max_position_embeddings,
            type_vocab_size=self.type_vocab_size,
            layer_norm_eps=self.layer_norm_eps)


def init_mmbt(key: jax.Array, cfg: MMBTConfig,
              dtype=jnp.float32) -> Params:
    D = cfg.hidden_size
    ks = jax.random.split(key, 8)
    nrm = lambda k, s: (jax.random.normal(k, s) * 0.02).astype(dtype)
    return {
        "embeddings": jbert.init_embedding_params(ks[0], cfg.bert_cfg(),
                                                  dtype),
        "encoder": jbert.init_encoder_params(ks[1], cfg.bert_cfg(), dtype),
        "pooler": {"w": nrm(ks[2], (D, D)),
                   "b": jnp.zeros((D,), dtype)},
        "modal_proj": L.init_linear(ks[3], cfg.modal_hidden_size, D, dtype),
        "classifier": {
            "transform": {"w": nrm(ks[4], (D, D)),
                          "b": jnp.zeros((D,), dtype),
                          "ln": {"scale": jnp.ones((D,), dtype),
                                 "bias": jnp.zeros((D,), dtype)}},
            "out": L.init_linear(ks[5], D, cfg.num_labels, dtype),
        },
        # pretraining heads (BertForPreTraining.cls): masked-LM decoder
        # tied to the word embedding + seq-relationship binary head
        "cls": {
            "transform": {"w": nrm(ks[6], (D, D)),
                          "b": jnp.zeros((D,), dtype),
                          "ln": {"scale": jnp.ones((D,), dtype),
                                 "bias": jnp.zeros((D,), dtype)}},
            "decoder_bias": jnp.zeros((cfg.vocab_size,), dtype),
            "seq_relationship": {"w": nrm(ks[7], (2, D)),
                                 "b": jnp.zeros((2,), dtype)},
        },
    }


def _bert_transform(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """BertPredictionHeadTransform: dense → gelu → LN."""
    h = gelu(x @ p["w"].T + p["b"])
    return layer_norm(h, p["ln"]["scale"], p["ln"]["bias"], eps)


def modal_embeddings(params: Params, cfg: MMBTConfig,
                     input_modal: jnp.ndarray,
                     start_token: Optional[jnp.ndarray],
                     end_token: Optional[jnp.ndarray],
                     modal_token_type_ids: jnp.ndarray) -> jnp.ndarray:
    """ModalEmbeddings.forward (mmbt.py:73-118): project modal features,
    wrap with word-embedded start/end tokens, add position + token-type
    embeddings (shared tables with the text stream), LN."""
    emb = params["embeddings"]
    tok = L.linear_fwd(params["modal_proj"], input_modal)
    parts = []
    if start_token is not None:
        parts.append(emb["word"][start_token][:, None, :])
    parts.append(tok)
    if end_token is not None:
        parts.append(emb["word"][end_token][:, None, :])
    tok = jnp.concatenate(parts, axis=1)
    B, S, _ = tok.shape
    pos = emb["position"][jnp.arange(S)][None]
    tt = emb["token_type"][jnp.broadcast_to(modal_token_type_ids, (B, S))]
    return layer_norm(tok + pos + tt, emb["ln"]["scale"], emb["ln"]["bias"],
                      cfg.layer_norm_eps)


def mmbt_encode(params: Params, cfg: MMBTConfig,
                input_modal: jnp.ndarray, input_ids: jnp.ndarray,
                attention_mask: jnp.ndarray,
                token_type_ids: jnp.ndarray,
                modal_start_token: Optional[jnp.ndarray] = None,
                modal_end_token: Optional[jnp.ndarray] = None,
                modal_token_type_ids: Optional[jnp.ndarray] = None):
    """MMBTModel.forward (mmbt.py:164-306) → (sequence, pooled)."""
    emb = params["embeddings"]
    if modal_token_type_ids is None:
        modal_token_type_ids = jnp.zeros((input_modal.shape[0], 1),
                                         jnp.int32)
    modal = modal_embeddings(params, cfg, input_modal, modal_start_token,
                             modal_end_token, modal_token_type_ids)
    T = input_ids.shape[1]
    txt = (emb["word"][input_ids] + emb["position"][jnp.arange(T)][None]
           + emb["token_type"][token_type_ids])
    txt = layer_norm(txt, emb["ln"]["scale"], emb["ln"]["bias"],
                     cfg.layer_norm_eps)
    x = jnp.concatenate([modal, txt], axis=1)
    full_mask = jnp.concatenate(
        [jnp.ones((x.shape[0], modal.shape[1]), attention_mask.dtype),
         attention_mask], axis=1)
    bias = jbert.extended_attention_mask(full_mask)
    seq, _ = jbert.encoder(params["encoder"], x, cfg.bert_cfg(), mask=bias)
    pooled = jnp.tanh(seq[:, 0] @ params["pooler"]["w"].T
                      + params["pooler"]["b"])
    return seq, pooled


def mmbt_for_classification(params: Params, cfg: MMBTConfig,
                            **inputs) -> jnp.ndarray:
    """MMBTForClassification.forward (mmbt.py:531-553): pooled →
    BertPredictionHeadTransform → linear scores."""
    _, pooled = mmbt_encode(params, cfg, **inputs)
    h = _bert_transform(params["classifier"]["transform"], pooled,
                        cfg.layer_norm_eps)
    return L.linear_fwd(params["classifier"]["out"], h)


def mmbt_for_pretraining(params: Params, cfg: MMBTConfig, **inputs):
    """MMBTForPreTraining.forward (mmbt.py:467-511): masked-LM logits
    (decoder weights tied to the word embedding, mmbt.py:455-461) and
    the seq-relationship score."""
    seq, pooled = mmbt_encode(params, cfg, **inputs)
    h = _bert_transform(params["cls"]["transform"], seq,
                        cfg.layer_norm_eps)
    lm_logits = h @ params["embeddings"]["word"].T \
        + params["cls"]["decoder_bias"]
    seq_rel = L.linear_fwd(params["cls"]["seq_relationship"], pooled)
    return lm_logits, seq_rel


def mmbt_pretrain_losses(params: Params, cfg: MMBTConfig,
                         lm_label_ids: jnp.ndarray,
                         image_text_alignment: Optional[jnp.ndarray] = None,
                         **inputs) -> Dict[str, jnp.ndarray]:
    """masked_lm_loss (CE over the LAST len(lm_label_ids) positions —
    the text positions, mmbt.py:484-495) + alignment loss."""
    lm_logits, seq_rel = mmbt_for_pretraining(params, cfg, **inputs)
    T = lm_label_ids.shape[1]
    text_scores = lm_logits[:, -T:].reshape(-1, cfg.vocab_size)
    labels = lm_label_ids.reshape(-1)
    valid = labels != -1
    logp = jax.nn.log_softmax(text_scores, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.maximum(labels, 0)[:, None],
                               axis=1)[:, 0]
    losses = {"masked_lm_loss": jnp.where(valid, nll, 0.0).sum()
              / jnp.maximum(valid.sum(), 1)}
    if image_text_alignment is not None:
        logp2 = jax.nn.log_softmax(seq_rel, axis=-1)
        losses["alignment_loss"] = -jnp.take_along_axis(
            logp2, image_text_alignment[:, None], axis=1).mean()
    return losses
