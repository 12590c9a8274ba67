"""CLIP bi-modal relevancy (the notebook's ``interpret``), one XLA program.

Reference: CLIP_explainability.ipynb cell 6 / CLIP/example.py:8-48.
The torch version repeats the image over the text batch and calls
``torch.autograd.grad(one_hot, [blk.attn_probs])`` separately per block
(12× image + 12× text backward passes per batch); here each tower is
taped ONCE via ``jax.vjp`` — the per-text image ∇A stacks come from a
vmapped VJP over the B one-hot logit cotangents, the text ∇A from one
all-ones-cotangent VJP (text b only influences logit b) — and the
relevancy chains run as ``lax.scan``s.

Semantics preserved from the notebook:
  * the scalar is the sum of the diagonal of ``logits_per_image`` over
    the text batch — per-text one-hots (the image is NOT re-encoded
    per text; logits for all texts come from the one taped forward);
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
    if start_layer == -1:
        start_layer = cfg.vision_layers - 1
    if start_layer_text == -1:
        start_layer_text = cfg.transformer_layers - 1

    # Shared-forward capture: the reference (and the notebook) repeats
    # the image B times and takes diag(logits) — B identical vision
    # forwards. Here each tower is taped ONCE; the per-text image
    # gradients come from a vmapped VJP over the B one-hot logit
    # cotangents (1 vision forward + one B-batched backward), and the
    # text gradients from a single VJP with an all-ones cotangent
    # (text b only influences logit b, so Σ_b d logit_b/d taps_text
    # IS the per-text gradient stack).
    taps0 = clip_model.zero_taps(cfg, 1, B, image.dtype)
    img_feat, v_vjp, v_attn = jax.vjp(
        lambda tv: clip_model.encode_image(params, image[None], cfg, tv),
        taps0.visual, has_aux=True)
    txt_feat, t_vjp, t_attn = jax.vjp(
        lambda tt: clip_model.encode_text(params, tokens, cfg, tt),
        taps0.text, has_aux=True)

    def head(img_feat, txt_feat):
        imf = img_feat / jnp.linalg.norm(img_feat, axis=-1, keepdims=True)
        txf = txt_feat / jnp.linalg.norm(txt_feat, axis=-1, keepdims=True)
        return (jnp.exp(params["logit_scale"]) * imf @ txf.T)[0]  # [B]

    logits, h_vjp = jax.vjp(head, img_feat, txt_feat)
    d_img, d_txt = jax.vmap(h_vjp)(jnp.eye(B, dtype=logits.dtype))
    v_grads = jax.vmap(lambda c: v_vjp(c)[0])(d_img)  # [B, L, 1, H, S, S]
    t_grads = t_vjp(d_txt.sum(axis=0))[0]             # [L, B, H, S, S]

    def img_rel(a, g):
        return rl.self_attention_relevancy(a, g, start_layer=start_layer)

    def txt_rel(a, g):
        return rl.self_attention_relevancy(a, g, start_layer=start_layer_text)

    R_img = jax.vmap(img_rel)(
        jnp.broadcast_to(v_attn[:, 0][None], (B,) + v_attn[:, 0].shape),
        v_grads[:, :, 0],
    )
    R_txt = jax.vmap(txt_rel)(
        jnp.moveaxis(t_attn, 1, 0), jnp.moveaxis(t_grads, 1, 0)
    )
    image_relevance = R_img[:, 0, 1:]
    # all image rows are the one image: logits_per_image rows identical
    lpi = jnp.broadcast_to(logits[None], (B, B))
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
