"""ViT explanation methods.

The MM-repo's ViT workload (Transformer_MM_explainability_ViT.ipynb)
uses ``generate_relevance`` — implemented as models/vit.relevancy (one
jitted fwd+bwd + scan). This module adds the method family the sibling
baselines expose over the same captures (rollout, raw attention,
GradCAM), so ViT has the full strategy surface like the other models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import vit as vit_model
from transformer_mm_explainability_tpu.ops import relevancy as rl


def generate_relevance(params, images, targets,
                       cfg: vit_model.ViTConfig = vit_model.VIT_B_16,
                       start_layer: int = 0) -> jnp.ndarray:
    """Alias of models/vit.relevancy (ViT notebook cell 7)."""
    return vit_model.relevancy(params, images, targets, cfg, start_layer)


def generate_rollout(attn: jnp.ndarray, start_layer: int = 0) -> jnp.ndarray:
    """Attention rollout over head-means → CLS row [B, S-1]."""
    means = attn.mean(axis=2)  # [L, B, S, S]
    R = jax.vmap(
        lambda m: rl.compute_rollout_attention(m, start_layer=start_layer)
    )(jnp.moveaxis(means, 1, 0))
    return R[:, 0, 1:]


def generate_raw_attn(attn: jnp.ndarray) -> jnp.ndarray:
    """Last layer head-mean CLS row."""
    return attn[-1].mean(axis=1)[:, 0, 1:]


def generate_attn_gradcam(attn: jnp.ndarray, grads: jnp.ndarray
                          ) -> jnp.ndarray:
    """GradCAM on the last layer's CLS row."""
    cam = jax.vmap(rl.grad_cam)(attn[-1], grads[-1])
    return cam[:, 0, 1:]


METHODS = {
    "ours": "generate_relevance (fwd+bwd relevancy chain)",
    "rollout": "attention rollout",
    "raw_attn": "last-layer attention",
    "attn_gradcam": "gradient-weighted last-layer attention",
}
