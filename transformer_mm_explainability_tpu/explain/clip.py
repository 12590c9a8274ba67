"""CLIP bi-modal relevancy (the notebook's ``interpret``), one XLA program.

Reference: CLIP_explainability.ipynb cell 6 / CLIP/example.py:8-48.
The torch version calls ``torch.autograd.grad(one_hot, [blk.attn_probs])``
separately per block (12× image + 12× text backward passes per batch);
here ONE ``jax.grad`` w.r.t. the stacked taps produces every layer's ∇A,
and the relevancy chains run as ``lax.scan``s.

Semantics preserved from the notebook:
  * the single image is repeated over the text batch and the scalar is
    the sum of the diagonal of ``logits_per_image`` — per-text one-hots;
  * ``start_layer``/``start_layer_text`` = -1 means "last layer only";
  * image relevancy is the CLS row minus CLS (``R[:, 0, 1:]``), text
    relevancy is the full per-text ``[S, S]`` matrix.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import clip as clip_model
from transformer_mm_explainability_tpu.ops import relevancy as rl


def interpret(
    params: Dict[str, Any],
    image: jnp.ndarray,
    tokens: jnp.ndarray,
    cfg: clip_model.CLIPConfig = clip_model.CLIP_VIT_B_32,
    start_layer: int = -1,
    start_layer_text: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """image: [H, W, 3] (normalised); tokens: [B, 77].

    Returns ``(text_relevance [B, S_t, S_t], image_relevance [B, S_v-1],
    logits_per_image [B, B])``.
    """
    B = tokens.shape[0]
    images = jnp.broadcast_to(image[None], (B,) + image.shape)
    if start_layer == -1:
        start_layer = cfg.vision_layers - 1
    if start_layer_text == -1:
        start_layer_text = cfg.transformer_layers - 1

    def score_fn(taps):
        lpi, _, (v_attn, t_attn) = clip_model.forward(
            params, images, tokens, cfg, taps
        )
        return jnp.diag(lpi).sum(), (lpi, v_attn, t_attn)

    taps0 = clip_model.zero_taps(cfg, B, B, image.dtype)
    grads, (lpi, v_attn, t_attn) = jax.grad(score_fn, has_aux=True)(taps0)

    def img_rel(a, g):
        return rl.self_attention_relevancy(a, g, start_layer=start_layer)

    def txt_rel(a, g):
        return rl.self_attention_relevancy(a, g, start_layer=start_layer_text)

    R_img = jax.vmap(img_rel)(
        jnp.moveaxis(v_attn, 1, 0), jnp.moveaxis(grads.visual, 1, 0)
    )
    R_txt = jax.vmap(txt_rel)(
        jnp.moveaxis(t_attn, 1, 0), jnp.moveaxis(grads.text, 1, 0)
    )
    image_relevance = R_img[:, 0, 1:]
    return R_txt, image_relevance, lpi


def text_token_relevance(
    R_text: jnp.ndarray, tokens: jnp.ndarray
) -> jnp.ndarray:
    """Per-text heatmap row: the EOT row sliced to real tokens, as used
    by the notebook's ``show_heatmap_on_text`` (cell 8): row at the EOT
    index, columns 1..EOT. Returns a masked [B, S] array (zeros outside
    1..EOT) to keep shapes static."""
    eot = tokens.argmax(axis=-1)  # [B]
    rows = jnp.take_along_axis(
        R_text, eot[:, None, None], axis=1
    )[:, 0]  # [B, S]
    S = R_text.shape[-1]
    col = jnp.arange(S)[None, :]
    mask = (col >= 1) & (col < eot[:, None])
    return jnp.where(mask, rows, 0.0)
