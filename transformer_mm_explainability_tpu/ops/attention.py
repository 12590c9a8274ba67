"""Functional multi-head attention with probability capture taps.

The PyTorch reference captures attention probabilities and their
gradients by mutating module state from forward/backward hooks
(e.g. lxmert_lrp.py:407-408, CLIP/clip/auxilary.py:247-250,
DETR/modules/layers.py:758-759). On TPU the idiomatic equivalent is
functional:

  * every attention computes ``A = softmax(qkᵀ/√d) + tap`` where ``tap``
    is a caller-supplied zeros array, and returns ``A`` as an auxiliary
    output;
  * ``jax.grad`` of the target logit w.r.t. the stacked taps yields, in
    ONE fused fwd+bwd XLA program, exactly the per-layer ∂logit/∂A that
    ``attention_probs.register_hook`` collects layer-by-layer in torch.

This module provides the shared attention primitive used by every model
family (ViT/CLIP/BERT/LXMERT/DETR).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class AttentionParams(NamedTuple):
    """Fused-QKV attention parameters for self-attention.

    ``w_qkv``: [D_in, 3*D]; ``b_qkv``: [3*D]; ``w_out``: [D, D_out];
    ``b_out``: [D_out].
    """

    w_qkv: jnp.ndarray
    b_qkv: jnp.ndarray
    w_out: jnp.ndarray
    b_out: jnp.ndarray


class CrossAttentionParams(NamedTuple):
    """Separate-projection attention parameters (self or cross)."""

    w_q: jnp.ndarray
    b_q: jnp.ndarray
    w_k: jnp.ndarray
    b_k: jnp.ndarray
    w_v: jnp.ndarray
    b_v: jnp.ndarray
    w_out: jnp.ndarray
    b_out: jnp.ndarray


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, S, D] -> [B, H, S, D/H]."""
    B, S, D = x.shape
    return x.reshape(B, S, num_heads, D // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, S, Dh] -> [B, S, H*Dh]."""
    B, H, S, Dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)


def attention_core(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    tap: Optional[jnp.ndarray] = None,
    probs_dtype: jnp.dtype = jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scaled dot-product attention on per-head tensors.

    q/k/v: [B, H, S_q|S_k, Dh]. ``mask`` is an additive bias broadcastable
    to [B, H, S_q, S_k] (e.g. -inf padding / causal masks). ``tap`` is an
    additive capture hook on the post-softmax probabilities; pass zeros
    and differentiate w.r.t. it to obtain ∇A. Returns ``(out, probs)``
    with ``probs`` the (un-tapped) softmax attention probabilities.

    Softmax runs in fp32 regardless of input dtype (TPU-friendly: the
    matmuls stay in the input dtype for the MXU; the numerically
    sensitive reduction is fp32).
    """
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], probs_dtype))
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=probs_dtype
    ) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1)
    if tap is None:
        probs_used = probs
    else:
        # capture dtype follows the tap: a bf16 tap stores the captured
        # probabilities/gradients at half the HBM cost (throughput mode)
        probs = probs.astype(tap.dtype)
        probs_used = probs + tap
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs_used.astype(v.dtype),
        v,
        preferred_element_type=probs_dtype,
    ).astype(v.dtype)
    if mask is not None:
        # a fully-masked key set must contribute NOTHING: the reference
        # physically removes entries, and a torch matmul over the
        # resulting empty axis yields zeros (lxmert/lxmert/
        # perturbation.py:112-117 at step=1.0 passes 0 boxes). The
        # additive-bias softmax would instead go uniform and leak an
        # average of the "removed" values — observable as a spurious
        # accuracy jump at the 100%-removal perturbation step on
        # cross-attention (visual-only key sets). Zero those rows.
        any_valid = (mask > -5000.0).any(axis=-1, keepdims=True)
        out = out * any_valid.astype(out.dtype)
    return out, probs


def multi_head_self_attention(
    params: AttentionParams,
    x: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    tap: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-QKV self-attention. x: [B, S, D]. Returns (out, probs)."""
    qkv = x @ params.w_qkv + params.b_qkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(t, num_heads) for t in (q, k, v))
    out, probs = attention_core(q, k, v, mask=mask, tap=tap)
    out = _merge_heads(out) @ params.w_out + params.b_out
    return out, probs


def multi_head_cross_attention(
    params: CrossAttentionParams,
    x_q: jnp.ndarray,
    x_kv: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    tap: Optional[jnp.ndarray] = None,
    x_v: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Separate-projection attention; covers self (x_q is x_kv), cross-
    modal, and DETR's positional-embedding pattern where keys carry the
    pos embed but values do not (``x_v``). Returns (out, probs)."""
    if x_v is None:
        x_v = x_kv
    q = _split_heads(x_q @ params.w_q + params.b_q, num_heads)
    k = _split_heads(x_kv @ params.w_k + params.b_k, num_heads)
    v = _split_heads(x_v @ params.w_v + params.b_v, num_heads)
    out, probs = attention_core(q, k, v, mask=mask, tap=tap)
    out = _merge_heads(out) @ params.w_out + params.b_out
    return out, probs


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics (safe under bf16 activations)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf-based) GELU, matching torch.nn.GELU's default."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's QuickGELU: x * sigmoid(1.702 x) (CLIP/clip/model.py:166-168)."""
    return x * jax.nn.sigmoid(1.702 * x)
