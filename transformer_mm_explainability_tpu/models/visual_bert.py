"""VisualBERT (single-stream vision-language BERT) with attention capture.

Re-implements the behaviour of MMF's ``visual_bert`` model
(VisualBERT/mmf/models/visual_bert.py:34-403):

  * visio-linguistic embeddings: text (word+pos+type) concatenated with
    projected visual features (+ visual type/pos embeddings), shared
    LayerNorm (mmf/modules/embeddings.py:305-458);
  * 12-layer BERT encoder with -10000 additive padding mask;
  * VQA classification head: pool at token ``input_mask.sum(1) - 2``
    (the ``?`` token acts as CLS, visual_bert.py:383-393), then
    BertPredictionHeadTransform (dense+gelu+LN) + classifier Linear.

Static-shape design: text length and number of visual features are
padded to fixed sizes; ``input_mask`` carries validity (the reference
already runs fixed 128-token text + 100-box features from LMDB).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import bert
from transformer_mm_explainability_tpu.ops.attention import gelu, layer_norm


@dataclasses.dataclass(frozen=True)
class VisualBERTConfig:
    bert: bert.BertConfig = bert.BERT_BASE
    visual_embedding_dim: int = 2048
    num_labels: int = 3129  # VQA2 answer vocabulary
    pooler_strategy: str = "vqa"  # "vqa" | "default"


VISUAL_BERT_VQA2 = VisualBERTConfig()


def init_params(key: jax.Array, cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
                dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    D = cfg.bert.hidden_size
    ks = jax.random.split(key, 8)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    return {
        "embeddings": bert.init_embedding_params(ks[0], cfg.bert, dtype),
        "visual": {
            "projection": {
                "w": nrm(ks[1], (cfg.visual_embedding_dim, D)),
                "b": zeros((D,)),
            },
            "token_type": nrm(ks[2], (cfg.bert.type_vocab_size, D)),
            "position": nrm(ks[3], (cfg.bert.max_position_embeddings, D)),
        },
        "encoder": bert.init_encoder_params(ks[4], cfg.bert, dtype),
        "pooler": {"w": nrm(ks[5], (D, D)), "b": zeros((D,))},
        "head": {
            "transform": {
                "w": nrm(ks[6], (D, D)), "b": zeros((D,)),
                "ln": {"scale": ones((D,)), "bias": zeros((D,))},
            },
            "classifier": {"w": nrm(ks[7], (D, cfg.num_labels)),
                           "b": zeros((cfg.num_labels,))},
        },
    }


def embed(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray],
    visual_embeddings: Optional[jnp.ndarray],
    visual_embeddings_type: Optional[jnp.ndarray],
    cfg: VisualBERTConfig,
    image_text_alignment: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Concatenated text+visual embeddings with shared LayerNorm.

    ``image_text_alignment`` [B, N_v, A] (−1 = pad): per-box word
    positions; each box's visual position embedding becomes the MEAN
    of the TEXT position embeddings at its aligned positions plus the
    row-0 visual position embedding (embeddings.py:369-407).
    """
    text = bert.text_embeddings(params["embeddings"], input_ids, token_type_ids)
    if visual_embeddings is not None:
        v = params["visual"]
        ve = visual_embeddings @ v["projection"]["w"] + v["projection"]["b"]
        if visual_embeddings_type is None:
            visual_embeddings_type = jnp.zeros(
                visual_embeddings.shape[:2], jnp.int32
            )
        ve = ve + v["token_type"][visual_embeddings_type]
        if image_text_alignment is not None:
            m = (image_text_alignment != -1).astype(jnp.int32)
            ita = m * image_text_alignment           # -1 → position 0
            pe = (params["embeddings"]["position"][ita]
                  * m[..., None])                    # [B, N, A, D]
            denom = jnp.maximum(m.sum(axis=2), 1)    # avoid /0 (:392-395)
            pos_vis = pe.sum(axis=2) / denom[..., None]
            ve = ve + pos_vis + v["position"][0]
        else:
            # image_text_alignment=None path: visual position embedding
            # is the row-0 embedding for every box (embeddings.py:410-417)
            ve = ve + v["position"][0]
        x = jnp.concatenate([text, ve], axis=1)
    else:
        x = text
    ln = params["embeddings"]["ln"]
    return layer_norm(x, ln["scale"], ln["bias"], cfg.bert.layer_norm_eps)


def forward(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    input_mask: jnp.ndarray,
    visual_embeddings: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    visual_embeddings_type: Optional[jnp.ndarray] = None,
    visual_mask: Optional[jnp.ndarray] = None,
    image_text_alignment: Optional[jnp.ndarray] = None,
    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
    taps: Optional[jnp.ndarray] = None,
    return_tape: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Returns {"scores": [B, num_labels], "attn": [L, B, H, S, S],
    "sequence_output": [B, S, D]}.

    ``input_mask``: [B, S_text] text validity; ``visual_mask``: [B, N_v]
    box validity (defaults to all-ones, matching the reference which
    attends to all 100 padded feature rows unless masked).
    """
    x = embed(params, input_ids, token_type_ids, visual_embeddings,
              visual_embeddings_type, cfg,
              image_text_alignment=image_text_alignment)
    if visual_embeddings is not None:
        if visual_mask is None:
            visual_mask = jnp.ones(visual_embeddings.shape[:2], input_mask.dtype)
        full_mask = jnp.concatenate([input_mask, visual_mask], axis=1)
    else:
        full_mask = input_mask
    mask = bert.extended_attention_mask(full_mask, x.dtype)
    hidden, attn, tape = bert.encoder(params["encoder"], x, cfg.bert, mask,
                                      taps, return_tape=True)

    if cfg.pooler_strategy == "vqa":
        idx = input_mask.sum(axis=1) - 2  # the '?' token (visual_bert.py:383)
        pooled = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    else:
        pooled = jnp.tanh(
            hidden[:, 0] @ params["pooler"]["w"] + params["pooler"]["b"]
        )
    t = params["head"]["transform"]
    h = gelu(pooled @ t["w"] + t["b"])
    h = layer_norm(h, t["ln"]["scale"], t["ln"]["bias"], cfg.bert.layer_norm_eps)
    c = params["head"]["classifier"]
    scores = h @ c["w"] + c["b"]
    out = {"scores": scores, "attn": attn, "sequence_output": hidden}
    if return_tape:
        out["tape"] = {"encoder": tape, "mask": mask, "pooled": pooled,
                       "cls_index": (input_mask.sum(axis=1) - 2
                                     if cfg.pooler_strategy == "vqa" else None)}
    return out


def relprop(
    params: Dict[str, Any],
    tape: Dict[str, Any],
    one_hot: jnp.ndarray,          # [B, num_labels]
    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
    alpha: float = 1.0,
    uniform: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LRP from the answer one-hot back through classifier → vqa pooler
    → encoder (VisualBERTForClassification.relprop, visual_bert.py:
    398-403). Returns (R at embeddings, attn cams [L, B, H, S, S]).
    ``uniform=False`` gives the BERT_orig_lrp (layers_lrp) variant.
    """
    from transformer_mm_explainability_tpu.models import bert_lrp
    from transformer_mm_explainability_tpu.ops import lrp

    t = params["head"]["transform"]
    c = params["head"]["classifier"]
    pooled = tape["pooled"]
    h1 = pooled @ t["w"] + t["b"]
    g1 = layer_norm(gelu(h1), t["ln"]["scale"], t["ln"]["bias"],
                    cfg.bert.layer_norm_eps)
    cam = lrp.linear_alpha_beta(one_hot, g1, c["w"], alpha, uniform)
    cam = lrp.linear_alpha_beta(cam, pooled, t["w"], alpha, uniform)

    # vqa pooler: scatter back to the '?' token position
    hidden_shape = tape["encoder"].shape[1:]  # [B, S, D]
    R = jnp.zeros(hidden_shape, cam.dtype)
    idx = tape["cls_index"]
    R = jax.vmap(lambda r, i, v: r.at[i].set(v))(R, idx, cam)
    return bert_lrp.bert_encoder_relprop(
        params["encoder"], tape["encoder"], tape["mask"], R, cfg.bert,
        alpha, uniform)


def capture(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    targets: jnp.ndarray,
    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fwd+bwd: (scores, A, ∇A). ``targets``: [B] answer indices,
    or ``None`` to explain the model's PREDICTED answer (the reference
    default: ExplanationGenerator.py ``index=None → np.argmax(output)``),
    resolved inside the same fwd+bwd via a stop-gradient argmax."""
    B, S_t = batch["input_ids"].shape
    N_v = batch["visual_embeddings"].shape[1] if batch.get(
        "visual_embeddings") is not None else 0
    S = S_t + N_v
    shape = (cfg.bert.num_hidden_layers, B, cfg.bert.num_attention_heads, S, S)

    def score_fn(taps):
        out = forward(
            params,
            batch["input_ids"], batch["input_mask"],
            batch.get("visual_embeddings"),
            batch.get("token_type_ids"),
            batch.get("visual_embeddings_type"),
            batch.get("visual_mask"),
            image_text_alignment=batch.get("image_text_alignment"),
            cfg=cfg, taps=taps,
        )
        t = (jnp.argmax(jax.lax.stop_gradient(out["scores"]), axis=-1)
             if targets is None else targets)
        s = jnp.take_along_axis(out["scores"], t[:, None], axis=1).sum()
        return s, out

    grads, out = jax.grad(score_fn, has_aux=True)(
        jnp.zeros(shape, jnp.float32)
    )
    return out["scores"], out["attn"], grads


def relevancy_row(
    params: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    targets: Optional[jnp.ndarray],
    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``capture`` + ``explain.visual_bert.generate_ours`` streamed:
    returns ``(scores, cam [B, S])`` — the CLS row of the rule-6 chain
    — WITHOUT materialising the ``[L, B, H, S, S]`` A/∇A stacks.

    Same trick as ``vit.relevancy_streamed_row``: the forward tapes
    only per-layer block inputs; the reverse pass runs per-layer VJPs,
    extracts that layer's (A, ∇A), and folds the row
    ``r ← r + r·Ê_l`` in descending layer order — exactly the CLS row
    of ``R = (I+Ê_L)···(I+Ê_1)`` that generate_ours extracts
    (ExplanationGenerator.py:83-93 + the CLS-row read). The [S, S]
    fold state replaces O(L·B·H·S²) of HBM, which is what makes the
    perturbation protocol's explain step scale.
    """
    bcfg = cfg.bert
    input_ids, input_mask = batch["input_ids"], batch["input_mask"]
    x = embed(params, input_ids, batch.get("token_type_ids"),
              batch.get("visual_embeddings"),
              batch.get("visual_embeddings_type"), cfg,
              image_text_alignment=batch.get("image_text_alignment"))
    if batch.get("visual_embeddings") is not None:
        visual_mask = batch.get("visual_mask")
        if visual_mask is None:
            visual_mask = jnp.ones(batch["visual_embeddings"].shape[:2],
                                   input_mask.dtype)
        full_mask = jnp.concatenate([input_mask, visual_mask], axis=1)
    else:
        full_mask = input_mask
    mask = bert.extended_attention_mask(full_mask, x.dtype)
    B, S, _ = x.shape
    H, eps = bcfg.num_attention_heads, bcfg.layer_norm_eps
    enc = params["encoder"]
    stacked = {k: enc[k] for k in ("attn", "attn_ln", "mlp", "mlp_ln")}
    zero_tap = jnp.zeros((B, H, S, S), x.dtype)

    from transformer_mm_explainability_tpu.ops.attention import (
        multi_head_self_attention,
    )

    def layer_fn(x, p, tap):
        attn_out, probs = multi_head_self_attention(
            p["attn"], x, H, mask=mask, tap=tap)
        x1 = layer_norm(x + attn_out, p["attn_ln"]["scale"],
                        p["attn_ln"]["bias"], eps)
        h = gelu(x1 @ p["mlp"]["w1"] + p["mlp"]["b1"])
        x2 = layer_norm(x1 + h @ p["mlp"]["w2"] + p["mlp"]["b2"],
                        p["mlp_ln"]["scale"], p["mlp_ln"]["bias"], eps)
        return x2, probs

    def fwd_step(x, p):
        x_out, _ = layer_fn(x, p, zero_tap)
        return x_out, x

    x_final, tape = jax.lax.scan(fwd_step, x, stacked)

    def head_fn(hidden):
        if cfg.pooler_strategy == "vqa":
            idx = input_mask.sum(axis=1) - 2
            pooled = jnp.take_along_axis(
                hidden, idx[:, None, None], axis=1)[:, 0]
        else:
            pooled = jnp.tanh(hidden[:, 0] @ params["pooler"]["w"]
                              + params["pooler"]["b"])
        t = params["head"]["transform"]
        hh = gelu(pooled @ t["w"] + t["b"])
        hh = layer_norm(hh, t["ln"]["scale"], t["ln"]["bias"], eps)
        c = params["head"]["classifier"]
        scores = hh @ c["w"] + c["b"]
        tt = (jnp.argmax(jax.lax.stop_gradient(scores), axis=-1)
              if targets is None else targets)
        s = jnp.take_along_axis(scores, tt[:, None], axis=1).sum()
        return s, scores

    cot_x, scores = jax.grad(head_fn, has_aux=True)(x_final)

    def bwd_step(carry, inputs):
        cot_x, r = carry
        p, x_in = inputs
        (x_out, probs), vjp = jax.vjp(
            lambda xi, tap: layer_fn(xi, p, tap), x_in, zero_tap)
        cot_x_in, grad_A = vjp((cot_x, jnp.zeros_like(probs)))
        prod = grad_A.astype(jnp.float32) * probs.astype(jnp.float32)
        e_hat = jnp.maximum(prod, 0.0).mean(axis=1)          # [B, S, S]
        r = r + jnp.einsum("bj,bjk->bk", r, e_hat,
                           preferred_element_type=jnp.float32)
        return (cot_x_in, r), None

    cls_index = input_mask.sum(axis=1) - 2
    r0 = jax.nn.one_hot(cls_index, S, dtype=jnp.float32)
    (_, r), _ = jax.lax.scan(bwd_step, (cot_x, r0), (stacked, tape),
                             reverse=True)
    # generate_ours' CLS-row read zeroes the CLS position itself
    r = r * (jnp.arange(S)[None, :] != cls_index[:, None])
    return scores, r


# ---------------------------------------------------------------------------
# pretraining head (VisualBERTForPretraining, visual_bert.py:156-280)
# ---------------------------------------------------------------------------

def init_pretrain_params(key: jax.Array,
                         cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
                         dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    """BertPreTrainingHeads: masked-LM predictions (transform
    dense+gelu+LN, decoder TIED to the word embeddings + free bias)
    and the 2-way seq_relationship head (tie_weights, :223-230)."""
    D = cfg.bert.hidden_size
    ks = jax.random.split(key, 2)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    return {
        "transform": {
            "w": nrm(ks[0], (D, D)), "b": jnp.zeros((D,), dtype),
            "ln": {"scale": jnp.ones((D,), dtype),
                   "bias": jnp.zeros((D,), dtype)},
        },
        "decoder_bias": jnp.zeros((cfg.bert.vocab_size,), dtype),
        "seq_relationship": {"w": nrm(ks[1], (D, 2)),
                             "b": jnp.zeros((2,), dtype)},
    }


def pretrain_forward(
    params: Dict[str, Any],
    head: Dict[str, Any],
    input_ids: jnp.ndarray,
    input_mask: jnp.ndarray,
    visual_embeddings: Optional[jnp.ndarray] = None,
    token_type_ids: Optional[jnp.ndarray] = None,
    visual_embeddings_type: Optional[jnp.ndarray] = None,
    visual_mask: Optional[jnp.ndarray] = None,
    masked_lm_labels: Optional[jnp.ndarray] = None,
    image_text_alignment: Optional[jnp.ndarray] = None,
    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
) -> Dict[str, jnp.ndarray]:
    """VisualBERTForPretraining.forward (visual_bert.py:233-280).

    ``masked_lm_labels``: [B, S_text] text-side LM labels
    (-1 = ignore); they are extended with -1 over the visual span
    exactly like ``add_post_flatten_params`` (:455-465).  Returns
    {"logits" [B, S, vocab], "seq_relationship" [B, 2],
    "masked_lm_loss", "loss"} — loss is the mean CE over non-ignored
    positions (torch ``CrossEntropyLoss(ignore_index=-1)``, :211).
    """
    x = embed(params, input_ids, token_type_ids, visual_embeddings,
              visual_embeddings_type, cfg,
              image_text_alignment=image_text_alignment)
    if visual_embeddings is not None:
        if visual_mask is None:
            visual_mask = jnp.ones(visual_embeddings.shape[:2],
                                   input_mask.dtype)
        full_mask = jnp.concatenate([input_mask, visual_mask], axis=1)
    else:
        full_mask = input_mask
    mask = bert.extended_attention_mask(full_mask, x.dtype)
    hidden, attn = bert.encoder(params["encoder"], x, cfg.bert, mask)

    # BertPooler (tanh of first token) — pretraining uses the default
    # pooler, not the VQA '?'-token one
    pooled = jnp.tanh(hidden[:, 0] @ params["pooler"]["w"]
                      + params["pooler"]["b"])

    t = head["transform"]
    h = gelu(hidden @ t["w"] + t["b"])
    h = layer_norm(h, t["ln"]["scale"], t["ln"]["bias"],
                   cfg.bert.layer_norm_eps)
    logits = h @ params["embeddings"]["word"].T + head["decoder_bias"]
    sr = head["seq_relationship"]
    seq_relationship = pooled @ sr["w"] + sr["b"]

    out = {"logits": logits, "seq_relationship": seq_relationship,
           "attn": attn}
    if masked_lm_labels is not None:
        B, S = hidden.shape[:2]
        labels = jnp.full((B, S), -1, jnp.int32)
        labels = labels.at[:, :masked_lm_labels.shape[1]].set(
            masked_lm_labels.astype(jnp.int32))
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        valid = labels >= 0
        picked = jnp.take_along_axis(
            logp, jnp.clip(labels, 0)[..., None], axis=-1)[..., 0]
        loss = -(picked * valid).sum() / jnp.maximum(valid.sum(), 1)
        out["masked_lm_loss"] = out["loss"] = loss
    return out


# ---------------------------------------------------------------------------
# NLVR2 paired-image classification (visual_bert.py:321-365)
# ---------------------------------------------------------------------------

def init_nlvr2_head(key: jax.Array,
                    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
                    num_labels: int = 2,
                    dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    """training_head_type == "nlvr2": the classifier operates on the
    CONCATENATED pooled pair, so its transform/classifier are sized
    2·hidden (``self.bert.config.hidden_size *= 2``, :321-326)."""
    D2 = 2 * cfg.bert.hidden_size
    ks = jax.random.split(key, 2)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    return {
        "transform": {
            "w": nrm(ks[0], (D2, D2)), "b": jnp.zeros((D2,), dtype),
            "ln": {"scale": jnp.ones((D2,), dtype),
                   "bias": jnp.zeros((D2,), dtype)},
        },
        "classifier": {"w": nrm(ks[1], (D2, num_labels)),
                       "b": jnp.zeros((num_labels,), dtype)},
    }


def forward_nlvr2(
    params: Dict[str, Any],
    head: Dict[str, Any],
    input_ids: jnp.ndarray,        # [2B, S] — img0 rows then img1 rows
    input_mask: jnp.ndarray,
    visual_embeddings: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    visual_embeddings_type: Optional[jnp.ndarray] = None,
    visual_mask: Optional[jnp.ndarray] = None,
    image_text_alignment: Optional[jnp.ndarray] = None,
    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
) -> Dict[str, jnp.ndarray]:
    """VisualBERTForClassification.forward, nlvr2 path (:360-365):
    the two images of a pair ride the batch axis (rows [:B] = img0,
    [B:] = img1 — the reference's ``2B·H → B·2H`` concat), pooled with
    the default BertPooler, concatenated, then transform+classifier.
    Returns {"scores": [B, num_labels], "attn"}."""
    x = embed(params, input_ids, token_type_ids, visual_embeddings,
              visual_embeddings_type, cfg,
              image_text_alignment=image_text_alignment)
    if visual_mask is None:
        visual_mask = jnp.ones(visual_embeddings.shape[:2],
                               input_mask.dtype)
    full_mask = jnp.concatenate([input_mask, visual_mask], axis=1)
    mask = bert.extended_attention_mask(full_mask, x.dtype)
    hidden, attn = bert.encoder(params["encoder"], x, cfg.bert, mask)
    pooled = jnp.tanh(hidden[:, 0] @ params["pooler"]["w"]
                      + params["pooler"]["b"])
    b = pooled.shape[0]
    pooled = jnp.concatenate([pooled[: b // 2], pooled[b // 2:]], axis=1)
    t = head["transform"]
    h = gelu(pooled @ t["w"] + t["b"])
    h = layer_norm(h, t["ln"]["scale"], t["ln"]["bias"],
                   cfg.bert.layer_norm_eps)
    c = head["classifier"]
    return {"scores": h @ c["w"] + c["b"], "attn": attn}


# ---------------------------------------------------------------------------
# bypass_transformer mode (VisualBERTBase.forward, visual_bert.py:107-131)
# ---------------------------------------------------------------------------

def init_bypass_layer(key: jax.Array,
                      cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
                      dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    """The ``additional_layer`` (one BertLayer) the bypass mode appends
    (:58-60)."""
    one = dataclasses.replace(cfg.bert, num_hidden_layers=1)
    return bert.init_encoder_params(key, one, dtype)


def forward_bypass(
    params: Dict[str, Any],
    additional_layer: Dict[str, Any],
    input_ids: jnp.ndarray,
    input_mask: jnp.ndarray,
    visual_embeddings: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
    visual_embeddings_type: Optional[jnp.ndarray] = None,
    visual_mask: Optional[jnp.ndarray] = None,
    image_text_alignment: Optional[jnp.ndarray] = None,
    cfg: VisualBERTConfig = VISUAL_BERT_VQA2,
) -> Dict[str, jnp.ndarray]:
    """``bypass_transformer=True`` (dormant in every shipped config,
    but part of the model surface): the 12-layer encoder sees ONLY the
    text span under a text-only mask (:114-124), then one additional
    BertLayer runs over [encoded_text ; visual_embedding_part] with
    the full mask (:125-130); pooled = BertPooler on token 0.

    Returns {"sequence_output", "pooled_output", "text_attn",
    "joint_attn"}.
    """
    x = embed(params, input_ids, token_type_ids, visual_embeddings,
              visual_embeddings_type, cfg,
              image_text_alignment=image_text_alignment)
    text_length = input_ids.shape[1]
    text_x = x[:, :text_length]
    visual_part = x[:, text_length:]

    text_mask = bert.extended_attention_mask(input_mask, x.dtype)
    hidden_t, text_attn = bert.encoder(params["encoder"], text_x,
                                       cfg.bert, text_mask)

    if visual_mask is None:
        visual_mask = jnp.ones(visual_embeddings.shape[:2],
                               input_mask.dtype)
    full_mask = bert.extended_attention_mask(
        jnp.concatenate([input_mask, visual_mask], axis=1), x.dtype)
    new_input = jnp.concatenate([hidden_t, visual_part], axis=1)
    one = dataclasses.replace(cfg.bert, num_hidden_layers=1)
    final, joint_attn = bert.encoder(additional_layer, new_input, one,
                                     full_mask)
    pooled = jnp.tanh(final[:, 0] @ params["pooler"]["w"]
                      + params["pooler"]["b"])
    return {"sequence_output": final, "pooled_output": pooled,
            "text_attn": text_attn, "joint_attn": joint_attn}
