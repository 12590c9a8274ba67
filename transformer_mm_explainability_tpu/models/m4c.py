"""TPU-native M4C (Multimodal Multi-Copy Mesh) for TextVQA.

Re-design of ``VisualBERT/mmf/models/m4c.py`` (M4C:25-341, TextBert:
344-366, MMT:369-459, OcrPtrNet:462-494, PrevPredEmbeddings:497-544,
_get_mask/_get_causal_mask/_batch_gather:547-575):

* TextBert / MMT reuse this repo's functional BERT encoder
  (``models/bert.py``) — same post-LN layer math the reference gets
  from ``transformers.modeling_bert.BertEncoder``;
* the prefix-LM + causal decode mask (m4c.py:400-440) is built once as
  an additive [B, 1, S, S] bias;
* greedy decoding (m4c.py:290-302: re-run the FULL mmt once per decode
  step, feeding back argmaxes) is one ``lax.scan`` over decode steps —
  static shapes, no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert as jbert
from transformer_mm_explainability_tpu.models import mmf_layers as L

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class M4CConfig:
    vocab_size: int = 100            # question wordpiece vocab
    num_fixed_answers: int = 20      # classifier out (already minus ocr)
    hidden_size: int = 768
    num_heads: int = 12
    text_bert_layers: int = 3
    mmt_layers: int = 4
    obj_in_dim: int = 2048           # obj.mmt_in_dim
    ocr_in_dim: int = 3002           # ocr.mmt_in_dim (300+604+2048+50)
    ocr_fc7_dim: int = 2048
    max_dec_length: int = 100
    max_type_num: int = 5
    layer_norm_eps: float = 1e-12
    bos_idx: int = 1

    def bert_cfg(self, layers: int) -> jbert.BertConfig:
        return jbert.BertConfig(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            num_hidden_layers=layers, num_attention_heads=self.num_heads,
            intermediate_size=4 * self.hidden_size,
            layer_norm_eps=self.layer_norm_eps)


def _ln_init(d: int, dtype) -> Params:
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_m4c(key: jax.Array, cfg: M4CConfig, dtype=jnp.float32) -> Params:
    D = cfg.hidden_size
    ks = jax.random.split(key, 14)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    return {
        "text_bert": {
            "embeddings": jbert.init_embedding_params(
                ks[0], cfg.bert_cfg(cfg.text_bert_layers), dtype),
            "encoder": jbert.init_encoder_params(
                ks[1], cfg.bert_cfg(cfg.text_bert_layers), dtype),
        },
        "obj": {
            "fc7": L.init_linear(ks[2], cfg.ocr_fc7_dim, cfg.ocr_fc7_dim,
                                 dtype),
            "feat": L.init_linear(ks[3], cfg.obj_in_dim, D, dtype),
            "bbox": L.init_linear(ks[4], 4, D, dtype),
            "feat_ln": _ln_init(D, dtype), "bbox_ln": _ln_init(D, dtype),
        },
        "ocr": {
            "fc7": L.init_linear(ks[5], cfg.ocr_fc7_dim, cfg.ocr_fc7_dim,
                                 dtype),
            "feat": L.init_linear(ks[6], cfg.ocr_in_dim, D, dtype),
            "bbox": L.init_linear(ks[7], 4, D, dtype),
            "feat_ln": _ln_init(D, dtype), "bbox_ln": _ln_init(D, dtype),
        },
        "mmt": {
            "encoder": jbert.init_encoder_params(
                ks[8], cfg.bert_cfg(cfg.mmt_layers), dtype),
            "prev_pred": {
                "position": nrm(ks[9], (cfg.max_dec_length, D)),
                "token_type": nrm(ks[10], (cfg.max_type_num, D)),
                "ans_ln": _ln_init(D, dtype), "ocr_ln": _ln_init(D, dtype),
                "emb_ln": _ln_init(D, dtype),
            },
        },
        "classifier": L.init_linear(ks[11], D, cfg.num_fixed_answers,
                                    dtype),
        "ocr_ptr_net": {"query": L.init_linear(ks[12], D, D, dtype),
                        "key": L.init_linear(ks[13], D, D, dtype)},
    }


def get_mask(nums: jnp.ndarray, max_num: int) -> jnp.ndarray:
    """_get_mask (m4c.py:547-553): [B] counts → [B, max_num] {0,1}."""
    ar = jnp.arange(max_num)[None, :]
    return (ar < nums[:, None]).astype(jnp.float32)


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(dim=-1): x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


def _layer_norm(x, p, eps):
    return jbert.layer_norm(x, p["scale"], p["bias"], eps)


def text_bert_fwd(params: Params, cfg: M4CConfig, txt_inds: jnp.ndarray,
                  txt_mask: jnp.ndarray) -> jnp.ndarray:
    """TextBert.forward (m4c.py:344-366): BertEmbeddings + encoder with
    the standard -10000 padding bias."""
    bcfg = cfg.bert_cfg(cfg.text_bert_layers)
    emb = params["text_bert"]["embeddings"]
    S = txt_inds.shape[1]
    x = (emb["word"][txt_inds] + emb["position"][jnp.arange(S)][None]
         + emb["token_type"][jnp.zeros_like(txt_inds)])
    x = _layer_norm(x, emb["ln"], cfg.layer_norm_eps)
    bias = jbert.extended_attention_mask(txt_mask)
    out, _ = jbert.encoder(params["text_bert"]["encoder"], x, bcfg,
                           mask=bias)
    return out


def obj_encoding_fwd(params: Params, cfg: M4CConfig, obj_fc6: jnp.ndarray,
                     obj_bbox: jnp.ndarray) -> jnp.ndarray:
    """_forward_obj_encoding (m4c.py:196-214)."""
    p = params["obj"]
    fc7 = _l2_normalize(jax.nn.relu(L.linear_fwd(p["fc7"], obj_fc6)))
    return (_layer_norm(L.linear_fwd(p["feat"], fc7), p["feat_ln"],
                        cfg.layer_norm_eps)
            + _layer_norm(L.linear_fwd(p["bbox"], obj_bbox), p["bbox_ln"],
                          cfg.layer_norm_eps))


def ocr_encoding_fwd(params: Params, cfg: M4CConfig,
                     ocr_fasttext: jnp.ndarray, ocr_phoc: jnp.ndarray,
                     ocr_fc6: jnp.ndarray, ocr_order: jnp.ndarray,
                     ocr_bbox: jnp.ndarray) -> jnp.ndarray:
    """_forward_ocr_encoding (m4c.py:216-255).  ocr_order is zeroed by
    the reference (legacy LoRRA order vectors) — kept for layout."""
    p = params["ocr"]
    ft = _l2_normalize(ocr_fasttext)
    ph = _l2_normalize(ocr_phoc)
    fc7 = _l2_normalize(jax.nn.relu(L.linear_fwd(p["fc7"], ocr_fc6)))
    feat = jnp.concatenate([ft, ph, fc7, jnp.zeros_like(ocr_order)],
                           axis=-1)
    return (_layer_norm(L.linear_fwd(p["feat"], feat), p["feat_ln"],
                        cfg.layer_norm_eps)
            + _layer_norm(L.linear_fwd(p["bbox"], ocr_bbox), p["bbox_ln"],
                          cfg.layer_norm_eps))


def prev_pred_embeddings_fwd(params: Params, cfg: M4CConfig,
                             ans_emb: jnp.ndarray, ocr_emb: jnp.ndarray,
                             prev_inds: jnp.ndarray) -> jnp.ndarray:
    """PrevPredEmbeddings.forward (m4c.py:510-544)."""
    p = params["mmt"]["prev_pred"]
    B, T = prev_inds.shape
    A = ans_emb.shape[0]
    ans = _layer_norm(ans_emb, p["ans_ln"], cfg.layer_norm_eps)
    ocr = _layer_norm(ocr_emb, p["ocr_ln"], cfg.layer_norm_eps)
    cat = jnp.concatenate(
        [jnp.broadcast_to(ans[None], (B,) + ans.shape), ocr], axis=1)
    raw = jnp.take_along_axis(cat, prev_inds[:, :, None], axis=1)
    pos = p["position"][jnp.arange(T)][None]
    tok = p["token_type"][(prev_inds >= A).astype(jnp.int32)]
    emb = _layer_norm(pos + tok, p["emb_ln"], cfg.layer_norm_eps)
    return raw + emb


def _mmt_mask(txt_mask, obj_mask, ocr_mask, dec_len: int) -> jnp.ndarray:
    """The prefix-LM additive bias (m4c.py:400-440): every position can
    attend to valid encoder positions; decode positions are causal."""
    enc = jnp.concatenate(
        [txt_mask, obj_mask, ocr_mask,
         jnp.zeros((txt_mask.shape[0], dec_len), txt_mask.dtype)], axis=1)
    S = enc.shape[1]
    m = jnp.broadcast_to(enc[:, None, None, :],
                         (enc.shape[0], 1, S, S))
    causal = jnp.tril(jnp.ones((dec_len, dec_len), enc.dtype))
    m = m.at[:, :, -dec_len:, -dec_len:].set(causal[None, None])
    return (1.0 - m) * -10000.0


def mmt_fwd(params: Params, cfg: M4CConfig, txt_emb, txt_mask, obj_emb,
            obj_mask, ocr_emb, ocr_mask, fixed_ans_emb, prev_inds
            ) -> Dict[str, jnp.ndarray]:
    """MMT.forward (m4c.py:378-459)."""
    dec_emb = prev_pred_embeddings_fwd(params, cfg, fixed_ans_emb,
                                       ocr_emb, prev_inds)
    x = jnp.concatenate([txt_emb, obj_emb, ocr_emb, dec_emb], axis=1)
    bias = _mmt_mask(txt_mask, obj_mask, ocr_mask, dec_emb.shape[1])
    out, _ = jbert.encoder(params["mmt"]["encoder"], x,
                           cfg.bert_cfg(cfg.mmt_layers), mask=bias)
    t_end = txt_mask.shape[1]
    ocr_begin = t_end + obj_mask.shape[1]
    ocr_end = ocr_begin + ocr_mask.shape[1]
    dec_len = prev_inds.shape[1]
    return {"mmt_seq_output": out,
            "mmt_txt_output": out[:, :t_end],
            "mmt_ocr_output": out[:, ocr_begin:ocr_end],
            "mmt_dec_output": out[:, -dec_len:]}


def ocr_ptr_net_fwd(params: Params, cfg: M4CConfig, query_inputs,
                    key_inputs, attention_mask) -> jnp.ndarray:
    """OcrPtrNet.forward (m4c.py:472-494)."""
    p = params["ocr_ptr_net"]
    q = L.linear_fwd(p["query"], query_inputs)
    k = L.linear_fwd(p["key"], key_inputs)
    scores = jnp.einsum("btd,bkd->btk", q, k) / jnp.sqrt(
        jnp.asarray(cfg.hidden_size, q.dtype))
    return scores + ((1.0 - attention_mask) * -10000.0)[:, None, :]


def _scores(params: Params, cfg: M4CConfig, inputs: Params,
            prev_inds: jnp.ndarray,
            remove_unk_idx: Optional[int] = None) -> jnp.ndarray:
    """One full mmt + output head pass (m4c.py:259-286).

    ``remove_unk_idx``: M4CCaptioner's remove_unk_in_pred
    (m4c_captioner.py:16-23) — forces the <unk> score to -1e10 so
    greedy decoding never emits it."""
    res = mmt_fwd(params, cfg, inputs["txt_emb"], inputs["txt_mask"],
                  inputs["obj_emb"], inputs["obj_mask"],
                  inputs["ocr_emb"], inputs["ocr_mask"],
                  params["classifier"]["w"], prev_inds)
    fixed = L.linear_fwd(params["classifier"], res["mmt_dec_output"])
    dyn = ocr_ptr_net_fwd(params, cfg, res["mmt_dec_output"],
                          res["mmt_ocr_output"], inputs["ocr_mask"])
    scores = jnp.concatenate([fixed, dyn], axis=-1)
    if remove_unk_idx is not None:
        scores = scores.at[..., remove_unk_idx].set(-1e10)
    return scores


def m4c_forward(params: Params, cfg: M4CConfig,
                txt_inds: jnp.ndarray, txt_len: jnp.ndarray,
                obj_fc6: jnp.ndarray, obj_bbox: jnp.ndarray,
                obj_nums: jnp.ndarray,
                ocr_fasttext: jnp.ndarray, ocr_phoc: jnp.ndarray,
                ocr_fc6: jnp.ndarray, ocr_order: jnp.ndarray,
                ocr_bbox: jnp.ndarray, ocr_nums: jnp.ndarray,
                prev_inds: Optional[jnp.ndarray] = None,
                dec_steps: Optional[int] = None,
                remove_unk_idx: Optional[int] = None) -> jnp.ndarray:
    """M4C.forward (m4c.py:173-302).

    With ``prev_inds`` (training): one teacher-forced pass.  Without
    (eval): greedy decoding — ``dec_steps`` full-mmt passes inside a
    ``lax.scan``, feeding back argmax indices exactly like the
    reference's Python loop.  ``remove_unk_idx`` selects the
    M4CCaptioner variant (m4c_captioner.py:6-23).
    """
    txt_mask = get_mask(txt_len, txt_inds.shape[1])
    txt_emb = text_bert_fwd(params, cfg, txt_inds, txt_mask)
    obj_emb = obj_encoding_fwd(params, cfg, obj_fc6, obj_bbox)
    obj_mask = get_mask(obj_nums, obj_emb.shape[1])
    ocr_emb = ocr_encoding_fwd(params, cfg, ocr_fasttext, ocr_phoc,
                               ocr_fc6, ocr_order, ocr_bbox)
    ocr_mask = get_mask(ocr_nums, ocr_emb.shape[1])
    inputs = {"txt_emb": txt_emb, "txt_mask": txt_mask,
              "obj_emb": obj_emb, "obj_mask": obj_mask,
              "ocr_emb": ocr_emb, "ocr_mask": ocr_mask}

    if prev_inds is not None:
        return _scores(params, cfg, inputs, prev_inds, remove_unk_idx)

    assert dec_steps is not None
    B = txt_inds.shape[0]
    inds0 = jnp.zeros((B, dec_steps), jnp.int32).at[:, 0].set(cfg.bos_idx)

    def step(inds, _):
        scores = _scores(params, cfg, inputs, inds, remove_unk_idx)
        nxt = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        inds = inds.at[:, 1:].set(nxt[:, :-1])
        return inds, scores

    _, all_scores = jax.lax.scan(step, inds0, None, length=dec_steps)
    return all_scores[-1]
