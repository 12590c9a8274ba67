"""BERT encoder (post-LN, HF layout) with functional attention capture.

The shared backbone for VisualBERT (and the text/vision streams of
LXMERT reuse the same layer shape). Mirrors the behaviour of the
reference's instrumented ``BertEncoder``/``BertLayer``/
``BertSelfAttention`` (VisualBERT/mmf/models/transformers/backends/
BERT_ours.py:97-233, 234-394) with taps instead of hooks.

TPU design: separate q/k/v projections are kept (HF checkpoint layout)
but fused into one ``[D, 3D]`` matmul at conversion time; layers are
stacked and scanned.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.ops.attention import (
    AttentionParams,
    gelu,
    layer_norm,
    multi_head_self_attention,
)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


BERT_BASE = BertConfig()


def init_encoder_params(key: jax.Array, cfg: BertConfig,
                        dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    D, L, Dm = cfg.hidden_size, cfg.num_hidden_layers, cfg.intermediate_size
    ks = jax.random.split(key, 6)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    return {
        "attn": AttentionParams(
            w_qkv=nrm(ks[0], (L, D, 3 * D)), b_qkv=zeros((L, 3 * D)),
            w_out=nrm(ks[1], (L, D, D)), b_out=zeros((L, D)),
        ),
        "attn_ln": {"scale": ones((L, D)), "bias": zeros((L, D))},
        "mlp": {
            "w1": nrm(ks[2], (L, D, Dm)), "b1": zeros((L, Dm)),
            "w2": nrm(ks[3], (L, Dm, D)), "b2": zeros((L, D)),
        },
        "mlp_ln": {"scale": ones((L, D)), "bias": zeros((L, D))},
    }


def init_embedding_params(key: jax.Array, cfg: BertConfig,
                          dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    D = cfg.hidden_size
    ks = jax.random.split(key, 3)
    nrm = lambda k, shape: (jax.random.normal(k, shape) * 0.02).astype(dtype)
    return {
        "word": nrm(ks[0], (cfg.vocab_size, D)),
        "position": nrm(ks[1], (cfg.max_position_embeddings, D)),
        "token_type": nrm(ks[2], (cfg.type_vocab_size, D)),
        "ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def extended_attention_mask(input_mask: jnp.ndarray,
                            dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """[B, S] {0,1} mask → additive [B, 1, 1, S] bias with -10000 at pads
    (visual_bert.py:84-96 semantics — matches HF/MMF exactly, including
    the -10000 rather than -inf)."""
    m = input_mask.astype(dtype)
    return ((1.0 - m) * -10000.0)[:, None, None, :]


def encoder(
    params: Dict[str, Any],
    hidden: jnp.ndarray,
    cfg: BertConfig,
    mask: Optional[jnp.ndarray] = None,
    taps: Optional[jnp.ndarray] = None,
    return_tape: bool = False,
):
    """Post-LN BERT encoder over stacked layers.

    hidden: [B, S, D]; mask: additive [B, 1, 1, S]; taps [L, B, H, S, S].
    Returns (hidden, attn_probs [L, B, H, S, S]) — plus the per-layer
    input tape [L, B, S, D] when ``return_tape`` (used by the LRP
    reverse pass, which rematerialises layer internals from it).
    """
    B, S, D = hidden.shape
    if taps is None:
        taps = jnp.zeros(
            (cfg.num_hidden_layers, B, cfg.num_attention_heads, S, S),
            hidden.dtype,
        )

    def layer(x, inputs):
        p, tap = inputs
        attn_out, probs = multi_head_self_attention(
            p["attn"], x, cfg.num_attention_heads, mask=mask, tap=tap
        )
        x_in = x
        x = layer_norm(x + attn_out, p["attn_ln"]["scale"],
                       p["attn_ln"]["bias"], cfg.layer_norm_eps)
        h = gelu(x @ p["mlp"]["w1"] + p["mlp"]["b1"])
        h = h @ p["mlp"]["w2"] + p["mlp"]["b2"]
        x = layer_norm(x + h, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"],
                       cfg.layer_norm_eps)
        return x, (probs, x_in)

    # split stacked layer params from (possibly shared) taps
    stacked = {k: params[k] for k in ("attn", "attn_ln", "mlp", "mlp_ln")}
    hidden, (probs, tape) = jax.lax.scan(layer, hidden, (stacked, taps))
    if return_tape:
        return hidden, probs, tape
    return hidden, probs


def text_embeddings(
    params: Dict[str, Any],
    input_ids: jnp.ndarray,
    token_type_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """word + position + token-type embeddings (no LN — callers LN after
    optional visual concat, mmf/modules/embeddings.py:325-341)."""
    B, S = input_ids.shape
    if token_type_ids is None:
        token_type_ids = jnp.zeros_like(input_ids)
    pos_ids = jnp.arange(S)[None, :]
    return (
        params["word"][input_ids]
        + params["position"][pos_ids]
        + params["token_type"][token_type_ids]
    )
