"""VisualBERT explanation generators (single-stream self-attention).

Reproduces the method family of the reference's ``SelfAttentionGenerator``
(VisualBERT/mmf/models/transformers/backends/ExplanationGenerator.py):

  ours            — R = I; per layer R += Ê @ R; CLS row       (:68-107)
  transformer_att — LRP-cam rollout (needs relprop cams)       (:24-66)
  partial_lrp     — head-mean of last-layer LRP cam            (:109-131)
  raw_attn        — head-mean of last-layer attention          (:155-167)
  rollout         — un-normalised rollout of head-means        (:168-185)
  attn_gradcam    — gradient-weighted last-layer head mean     (:187-216)

All methods consume the stacked ``(A, ∇A)`` capture from
``models.visual_bert.capture`` — one jitted fwd+bwd per batch — and the
"CLS" row is the ``?`` token at ``input_mask.sum(1) - 2``
(ExplanationGenerator.py:94-97). Each returns a per-example relevancy
row over all S tokens with the CLS column zeroed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.ops import relevancy as rl


def _cls_row(R: jnp.ndarray, cls_index: jnp.ndarray) -> jnp.ndarray:
    """Row ``cls_index`` of per-example matrices R [B, S, S], with the
    CLS column zeroed (ExplanationGenerator.py:96-97)."""
    row = jnp.take_along_axis(R, cls_index[:, None, None], axis=1)[:, 0]
    B, S = row.shape
    return row * (jnp.arange(S)[None, :] != cls_index[:, None])


def generate_ours(attn: jnp.ndarray, grads: jnp.ndarray,
                  cls_index: jnp.ndarray) -> jnp.ndarray:
    """attn/grads: [L, B, H, S, S]; cls_index: [B]. → [B, S]."""
    R = jax.vmap(rl.self_attention_relevancy)(
        jnp.moveaxis(attn, 1, 0), jnp.moveaxis(grads, 1, 0)
    )
    return _cls_row(R, cls_index)


def generate_transformer_att(cams_lrp: jnp.ndarray, grads: jnp.ndarray,
                             cls_index: jnp.ndarray,
                             start_layer: int = 0) -> jnp.ndarray:
    """Grad-weighted LRP-cam rollout, per example.
    ``cams_lrp``: [L, B, H, S, S] relprop cams.

    The VisualBERT copy of ``compute_rollout_attention`` has the row
    normalisation commented out (ExplanationGenerator.py:11-13), so this
    is the bare ∏(I+Ê) chain — which makes it mathematically identical
    to the "ours" recursion fed the same cams."""
    def per_example(c, g):
        e = jnp.maximum(g * c, 0.0).mean(axis=1)  # [L, S, S]
        return rl.compute_rollout_attention(e, start_layer=start_layer,
                                            normalize=False)

    R = jax.vmap(per_example)(
        jnp.moveaxis(cams_lrp, 1, 0), jnp.moveaxis(grads, 1, 0)
    )
    return _cls_row(R, cls_index)


def generate_partial_lrp(cams_lrp: jnp.ndarray,
                         cls_index: jnp.ndarray) -> jnp.ndarray:
    """Head-mean of the LAST layer's LRP cam, min-max normalised
    (ExplanationGenerator.py:109-131)."""
    cam = cams_lrp[-1].mean(axis=1)  # [B, S, S]
    cam = (cam - cam.min(axis=(1, 2), keepdims=True)) / (
        cam.max(axis=(1, 2), keepdims=True)
        - cam.min(axis=(1, 2), keepdims=True)
    )
    return _cls_row(cam, cls_index)


def generate_raw_attn(attn: jnp.ndarray, cls_index: jnp.ndarray) -> jnp.ndarray:
    """Head-mean of the last layer's attention (:155-167)."""
    return _cls_row(attn[-1].mean(axis=1), cls_index)


def generate_rollout(attn: jnp.ndarray, cls_index: jnp.ndarray,
                     start_layer: int = 0) -> jnp.ndarray:
    """Rollout of per-layer head-means WITHOUT row normalisation — the
    VisualBERT copy skips it (ExplanationGenerator.py:11-13)."""
    means = attn.mean(axis=2)  # [L, B, S, S]
    R = jax.vmap(
        lambda m: rl.compute_rollout_attention(
            m, start_layer=start_layer, normalize=False
        )
    )(jnp.moveaxis(means, 1, 0))
    return _cls_row(R, cls_index)


def generate_attn_gradcam(attn: jnp.ndarray, grads: jnp.ndarray,
                          cls_index: jnp.ndarray) -> jnp.ndarray:
    """GradCAM on the last layer, min-max normalised (:187-216)."""
    cam = jax.vmap(rl.grad_cam)(attn[-1], grads[-1])  # [B, S, S]
    cam = (cam - cam.min(axis=(1, 2), keepdims=True)) / (
        cam.max(axis=(1, 2), keepdims=True)
        - cam.min(axis=(1, 2), keepdims=True)
    )
    return _cls_row(cam, cls_index)


METHODS_FROM_CAPTURE = {
    "ours_no_lrp": generate_ours,
    "raw_attn": lambda attn, grads, cls: generate_raw_attn(attn, cls),
    "rollout": lambda attn, grads, cls: generate_rollout(attn, cls),
    "attn_gradcam": generate_attn_gradcam,
}
