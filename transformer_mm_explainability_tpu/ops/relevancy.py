"""The paper's relevancy-update rule kernels, TPU-native.

Implements the generic attention explainability math of Chefer et al.
(ICCV 2021, "Generic Attention-model Explainability ...") as pure
``jax.numpy`` functions designed for ``jit``/``vmap``/``lax.scan``:

  * rule 5   — ``avg_heads``: head-average of the positive part of
               (gradient ⊙ attention).
  * rules 6+7 — ``apply_self_attention_rules``: self-attention update for
               the (R_ss, R_sq) relevancy pair.
  * eq. 8+9  — ``handle_residual``: re-normalisation of the off-diagonal
               relevancy mass that accounts for residual connections.
  * rules 10+11 — ``apply_mm_attention_rules``: cross-modal update.
  * attention rollout (Abnar & Zuidema) — ``compute_rollout_attention``.
  * the "ours" per-layer aggregation chains as ``lax.scan`` loops over
    stacked ``[L, H, S, S]`` attention/gradient arrays
    (``self_attention_relevancy``), replacing the reference's Python
    per-module hook loops.

Reference behaviour cited from:
  DETR/modules/ExplanationGenerator.py:5-53,
  lxmert/lxmert/src/ExplanationGenerator.py:5-54,
  VisualBERT/mmf/models/transformers/backends/ExplanationGenerator.py:5-17.

All kernels take *unbatched* relevancy matrices (``[S, S]``-shaped) and
stacked per-layer inputs; add batch axes with ``jax.vmap``. Accumulation
is float32 — the parity target vs the fp32 PyTorch reference is
max-abs deviation < 1e-4.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _fold_heads(x: jnp.ndarray) -> jnp.ndarray:
    """Collapse all leading axes of ``[..., S_q, S_k]`` into one."""
    return x.reshape(-1, x.shape[-2], x.shape[-1])


def avg_heads(cam: jnp.ndarray, grad: jnp.ndarray) -> jnp.ndarray:
    """Rule 5: Ê = mean_h (∇A ⊙ A)⁺.

    ``cam``/``grad`` are attention probabilities and their gradients with
    any leading (batch, head) axes; result is ``[S_q, S_k]``.
    Matches reference ``avg_heads`` (lxmert ExplanationGenerator.py:18-23).
    """
    cam = _fold_heads(cam)
    grad = _fold_heads(grad)
    return jnp.maximum(grad * cam, 0.0).mean(axis=0)


def grad_cam(cam: jnp.ndarray, grad: jnp.ndarray) -> jnp.ndarray:
    """GradCAM head aggregation used by the ``attn_gradcam`` baseline.

    Weights each head's attention map by the mean of its gradient, then
    head-averages and clamps (lxmert ExplanationGenerator.py:542-547).
    """
    cam = _fold_heads(cam)
    grad = _fold_heads(grad)
    weights = grad.mean(axis=(-2, -1), keepdims=True)
    return jnp.maximum((cam * weights).mean(axis=0), 0.0)


def apply_self_attention_rules(
    R_ss: jnp.ndarray, R_sq: jnp.ndarray, cam_ss: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rules 6+7: additive updates from a self-attention layer.

    Returns ``(R_ss_addition, R_sq_addition) = (Ê @ R_ss, Ê @ R_sq)``
    (lxmert ExplanationGenerator.py:26-29).
    """
    return cam_ss @ R_ss, cam_ss @ R_sq


def handle_residual(R: jnp.ndarray,
                    valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Eq. 8+9: row-normalise the off-diagonal relevancy mass.

    R̂ = R − I;  R̂ ← R̂ / Σ_k R̂[·,k];  return R̂ + I
    (lxmert ExplanationGenerator.py:45-54). Mirrors the reference's plain
    division: a zero row sum yields NaN, which callers of rule 10 guard
    with a NaN→0 mask exactly where the reference does.

    ``valid`` ([S] 1=real token) exists because this framework keeps
    static shapes: the reference's dynamic shapes never see padding, but
    here padded queries have all-zero Ê rows for every layer, so their
    aggregated R rows stay identity rows whose off-diagonal mass is 0 —
    the plain division would turn them into NaN rows that then poison
    every entry of the rule-10 matmuls (0·NaN = NaN). With ``valid``,
    padded rows are pinned to identity (inert: rule 10's Ê columns for
    padded keys are exact zeros, so identity rows never contribute)
    while VALID rows keep the reference's plain division — including its
    genuine 0/0 NaN on a real token whose Ê rows are all zero.
    """
    eye = jnp.eye(R.shape[-1], dtype=R.dtype)
    R_hat = R - eye
    denom = R_hat.sum(axis=-1, keepdims=True)
    if valid is not None:
        v = valid.astype(R.dtype)[:, None]
        R_hat = R_hat * v
        denom = jnp.where(v > 0, denom, 1.0)
    R_hat = R_hat / denom
    return R_hat + eye


def apply_mm_attention_rules(
    R_ss: jnp.ndarray,
    R_qq: jnp.ndarray,
    cam_sq: jnp.ndarray,
    R_qs: Optional[jnp.ndarray] = None,
    apply_normalization: bool = True,
    apply_self_in_rule_10: bool = True,
    nan_to_zero: bool = False,
    s_valid: Optional[jnp.ndarray] = None,
    q_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Rules 10+11: additive updates from a cross-modal attention layer.

    R_sq_addition = norm(R_ss)ᵀ @ (Ê_sq @ norm(R_qq))      (rule 10)
    R_ss_addition = Ê_sq @ R_qs                             (rule 11)

    ``R_qs`` is the transpose-modality aggregate; if ``None`` (DETR's
    encoder-decoder case, DETR ExplanationGenerator.py:33-43) rule 11 is
    skipped and the second return value is ``None``. ``nan_to_zero``
    replicates DETR's ``R_sq_addition[isnan] = 0`` guard (:42).
    LXMERT's bi-modal variant is lxmert ExplanationGenerator.py:32-42.
    ``s_valid``/``q_valid`` are the static-shape padding masks for the
    two normalisations (see ``handle_residual``).
    """
    R_ss_norm = (handle_residual(R_ss, s_valid)
                 if apply_normalization else R_ss)
    R_qq_norm = (handle_residual(R_qq, q_valid)
                 if apply_normalization else R_qq)
    R_sq_addition = R_ss_norm.T @ (cam_sq @ R_qq_norm)
    if not apply_self_in_rule_10:
        R_sq_addition = cam_sq
    if nan_to_zero:
        R_sq_addition = jnp.nan_to_num(R_sq_addition, nan=0.0)
    R_ss_addition = None if R_qs is None else cam_sq @ R_qs
    return R_sq_addition, R_ss_addition


def compute_rollout_attention(
    layer_matrices: jnp.ndarray,
    start_layer: int = 0,
    normalize: bool = True,
) -> jnp.ndarray:
    """Attention rollout over a stacked ``[L, S, S]`` chain.

    Each layer map gets a residual identity added and (optionally) row
    normalisation, then the chain is multiplied last-to-first:
    ``joint = A_{L-1} @ ... @ A_{start}``. ``normalize=False`` matches the
    VisualBERT copy which skips row-normalisation
    (VisualBERT backends/ExplanationGenerator.py:5-17 vs the
    lxmert/DETR copies :5-16 which normalise).
    """
    L, S, _ = layer_matrices.shape
    eye = jnp.eye(S, dtype=layer_matrices.dtype)
    mats = layer_matrices + eye
    if normalize:
        mats = mats / mats.sum(axis=-1, keepdims=True)
    mats = mats[start_layer:]

    def step(joint, A):
        return A @ joint, None

    joint, _ = jax.lax.scan(step, mats[0], mats[1:])
    return joint


def self_attention_relevancy(
    cams: jnp.ndarray,
    grads: jnp.ndarray,
    start_layer: int = 0,
) -> jnp.ndarray:
    """The "ours" single-stream chain: R = I; per layer R += Ê @ R.

    ``cams``/``grads``: ``[L, H, S, S]`` stacked attention probabilities
    and their target-logit gradients. Replaces the reference's per-block
    Python loop (VisualBERT ExplanationGenerator.py:83-93, ViT notebook
    cell 7, CLIP example.py:20-31) with one ``lax.scan``.
    """
    L, H, S, _ = cams.shape
    # accumulate in fp32 regardless of the capture dtype (bf16 capture
    # is a throughput option; the chain math stays fp32)
    prod = (grads.astype(jnp.float32) * cams.astype(jnp.float32))
    e_hats = jnp.maximum(prod, 0.0).mean(axis=1)  # [L, S, S]
    e_hats = e_hats[start_layer:]

    def step(R, e_hat):
        return R + e_hat @ R, None

    R0 = jnp.eye(S, dtype=jnp.float32)
    R, _ = jax.lax.scan(step, R0, e_hats)
    return R


def self_attention_relevancy_update(
    R_ss: jnp.ndarray,
    R_sq: jnp.ndarray,
    cams: jnp.ndarray,
    grads: jnp.ndarray,
    aggregate: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan rules 6+7 over a stack of self-attention layers ``[L,H,S,S]``.

    With ``aggregate=True`` (default) performs the paper's ``+=`` update;
    ``aggregate=False`` reproduces the no-aggregation ablation which
    overwrites instead (lxmert ExplanationGenerator.py:215-365).

    Like ``self_attention_relevancy``, Ê and both carries accumulate in
    fp32 regardless of the capture dtype, matching the sharded
    counterpart ``parallel.sp.sp_self_attention_update``.
    """
    R_ss = R_ss.astype(jnp.float32)
    R_sq = R_sq.astype(jnp.float32)
    prod = grads.astype(jnp.float32) * cams.astype(jnp.float32)
    e_hats = jnp.maximum(prod, 0.0).mean(axis=1)

    def step(carry, e_hat):
        R_ss, R_sq = carry
        add_ss, add_sq = apply_self_attention_rules(R_ss, R_sq, e_hat)
        if aggregate:
            return (R_ss + add_ss, R_sq + add_sq), None
        return (add_ss, add_sq), None

    (R_ss, R_sq), _ = jax.lax.scan(step, (R_ss, R_sq), e_hats)
    return R_ss, R_sq
