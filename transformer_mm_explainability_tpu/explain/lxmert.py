"""LXMERT bi-modal explanation generators.

Implements the reference's ``GeneratorOurs.generate_ours``
(lxmert/lxmert/src/ExplanationGenerator.py:131-211) plus the baselines
(:368-666) and the no-aggregation ablation (:215-365) as pure functions
over the stacked captures from ``models.lxmert.capture``.

Propagation order (matching the reference exactly):
  1. 9 language self-attention layers  → rules 6+7 on (R_tt, R_ti)
  2. 5 visual self-attention layers    → rules 6+7 on (R_ii, R_it)
  3. x-layers 0..3: both cross-attentions (rules 10+11, computed from
     the PRE-update R's), then language self, then visual self
  4. last x-layer: text side only (CLS lives in the language stream,
     ExplanationGenerator.py:177-207)
  5. zero R_tt[0,0] (the CLS self-relevancy, :210)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models.lxmert import LxmertTaps
from transformer_mm_explainability_tpu.ops import relevancy as rl


class BiModalState(NamedTuple):
    R_t_t: jnp.ndarray
    R_t_i: jnp.ndarray
    R_i_i: jnp.ndarray
    R_i_t: jnp.ndarray


def _avg(cam, grad):
    return jnp.maximum(grad * cam, 0.0).mean(axis=0)  # over heads [H,Sq,Sk]


def _ours_single(attn: LxmertTaps, grads: LxmertTaps,
                 normalize_self_attention: bool = True,
                 apply_self_in_rule_10: bool = True,
                 aggregate: bool = True,
                 text_valid: Optional[jnp.ndarray] = None,
                 visual_valid: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-example propagation. attn/grads leaves: [L, H, Sq, Sk].

    ``text_valid`` [St] / ``visual_valid`` [Sv] mark real tokens/boxes:
    with static-shape padding, padded rows of R stay identity rows whose
    eq.-8+9 division is 0/0 — one padded position would NaN-poison the
    whole bi-modal map through the rule-10 matmuls. The masks pin those
    rows to identity instead (inert; see ops/relevancy.handle_residual).
    The reference never needs this because its shapes are dynamic."""
    St = attn.lang.shape[-1]
    Sv = attn.visn.shape[-1]
    dt = attn.lang.dtype
    s = BiModalState(
        R_t_t=jnp.eye(St, dtype=dt),
        R_t_i=jnp.zeros((St, Sv), dt),
        R_i_i=jnp.eye(Sv, dtype=dt),
        R_i_t=jnp.zeros((Sv, St), dt),
    )

    def self_update(R_ss, R_sq, cam, grad):
        e = _avg(cam, grad)
        add_ss, add_sq = rl.apply_self_attention_rules(R_ss, R_sq, e)
        if aggregate:
            return R_ss + add_ss, R_sq + add_sq
        return add_ss, add_sq

    # 1. language stack
    def lang_step(s, x):
        cam, grad = x
        R_t_t, R_t_i = self_update(s.R_t_t, s.R_t_i, cam, grad)
        return s._replace(R_t_t=R_t_t, R_t_i=R_t_i), None

    s, _ = jax.lax.scan(lang_step, s, (attn.lang, grads.lang))

    # 2. visual stack
    def visn_step(s, x):
        cam, grad = x
        R_i_i, R_i_t = self_update(s.R_i_i, s.R_i_t, cam, grad)
        return s._replace(R_i_i=R_i_i, R_i_t=R_i_t), None

    s, _ = jax.lax.scan(visn_step, s, (attn.visn, grads.visn))

    # 3. cross-modal layers except the last
    def x_step(s, x):
        (c_lc, g_lc), (c_vc, g_vc), (c_ls, g_ls), (c_vs, g_vs) = x
        cam_t_i = _avg(c_lc, g_lc)
        cam_i_t = _avg(c_vc, g_vc)
        R_t_i_add, R_t_t_add = rl.apply_mm_attention_rules(
            s.R_t_t, s.R_i_i, cam_t_i, R_qs=s.R_i_t,
            apply_normalization=normalize_self_attention,
            apply_self_in_rule_10=apply_self_in_rule_10,
            s_valid=text_valid, q_valid=visual_valid,
        )
        R_i_t_add, R_i_i_add = rl.apply_mm_attention_rules(
            s.R_i_i, s.R_t_t, cam_i_t, R_qs=s.R_t_i,
            apply_normalization=normalize_self_attention,
            apply_self_in_rule_10=apply_self_in_rule_10,
            s_valid=visual_valid, q_valid=text_valid,
        )
        if aggregate:
            s = BiModalState(
                R_t_t=s.R_t_t + R_t_t_add, R_t_i=s.R_t_i + R_t_i_add,
                R_i_i=s.R_i_i + R_i_i_add, R_i_t=s.R_i_t + R_i_t_add,
            )
        else:
            s = BiModalState(R_t_t=R_t_t_add, R_t_i=R_t_i_add,
                             R_i_i=R_i_i_add, R_i_t=R_i_t_add)
        R_t_t, R_t_i = self_update(s.R_t_t, s.R_t_i, c_ls, g_ls)
        s = s._replace(R_t_t=R_t_t, R_t_i=R_t_i)
        R_i_i, R_i_t = self_update(s.R_i_i, s.R_i_t, c_vs, g_vs)
        return s._replace(R_i_i=R_i_i, R_i_t=R_i_t), None

    head = lambda a: a[:-1]
    s, _ = jax.lax.scan(
        x_step, s,
        ((head(attn.x_lang_cross), head(grads.x_lang_cross)),
         (head(attn.x_visn_cross), head(grads.x_visn_cross)),
         (head(attn.x_lang_self), head(grads.x_lang_self)),
         (head(attn.x_visn_self), head(grads.x_visn_self))),
    )

    # 4. last x-layer: text side only
    cam_t_i = _avg(attn.x_lang_cross[-1], grads.x_lang_cross[-1])
    R_t_i_add, R_t_t_add = rl.apply_mm_attention_rules(
        s.R_t_t, s.R_i_i, cam_t_i, R_qs=s.R_i_t,
        apply_normalization=normalize_self_attention,
        apply_self_in_rule_10=apply_self_in_rule_10,
        s_valid=text_valid, q_valid=visual_valid,
    )
    if aggregate:
        s = s._replace(R_t_t=s.R_t_t + R_t_t_add, R_t_i=s.R_t_i + R_t_i_add)
    else:
        s = s._replace(R_t_t=R_t_t_add, R_t_i=R_t_i_add)
    R_t_t, R_t_i = self_update(s.R_t_t, s.R_t_i,
                               attn.x_lang_self[-1], grads.x_lang_self[-1])
    s = s._replace(R_t_t=R_t_t, R_t_i=R_t_i)

    # 5. CLS self-relevancy masked out
    R_t_t = s.R_t_t.at[0, 0].set(0.0)
    return R_t_t, s.R_t_i


def _vmap_over_batch(fn, attn: LxmertTaps, grads: LxmertTaps,
                     text_valid=None, visual_valid=None):
    batchify = lambda taps: LxmertTaps(*(jnp.moveaxis(a, 1, 0) for a in taps))
    in_axes = (0, 0,
               None if text_valid is None else 0,
               None if visual_valid is None else 0)
    return jax.vmap(fn, in_axes=in_axes)(
        batchify(attn), batchify(grads), text_valid, visual_valid)


def generate_ours(attn: LxmertTaps, grads: LxmertTaps,
                  normalize_self_attention: bool = True,
                  apply_self_in_rule_10: bool = True,
                  text_valid=None, visual_valid=None,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched (R_t_t [B,St,St], R_t_i [B,St,Sv]). ``text_valid``
    [B,St] / ``visual_valid`` [B,Sv] mark real positions of padded
    static-shape batches (see _ours_single)."""
    return _vmap_over_batch(
        lambda a, g, tv, vv: _ours_single(
            a, g, normalize_self_attention, apply_self_in_rule_10,
            aggregate=True, text_valid=tv, visual_valid=vv),
        attn, grads, text_valid, visual_valid)


def generate_ours_no_agg(attn: LxmertTaps, grads: LxmertTaps,
                         normalize_self_attention: bool = True,
                         text_valid=None, visual_valid=None,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The no-aggregation ablation (= overwrites instead of +=,
    ExplanationGenerator.py:215-365)."""
    return _vmap_over_batch(
        lambda a, g, tv, vv: _ours_single(
            a, g, normalize_self_attention, True, aggregate=False,
            text_valid=tv, visual_valid=vv),
        attn, grads, text_valid, visual_valid)


def generate_raw_attn(attn: LxmertTaps) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Head-mean of the last x-layer's attentions (:508-540)."""
    R_t_i = attn.x_lang_cross[-1].mean(axis=1)
    R_t_t = attn.x_lang_self[-1].mean(axis=1)
    R_t_t = R_t_t.at[:, 0, 0].set(0.0)
    return R_t_t, R_t_i


def generate_attn_gradcam(attn: LxmertTaps, grads: LxmertTaps
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GradCAM on the last x-layer (:549-593)."""
    R_t_i = jax.vmap(rl.grad_cam)(attn.x_lang_cross[-1],
                                  grads.x_lang_cross[-1])
    R_t_t = jax.vmap(rl.grad_cam)(attn.x_lang_self[-1],
                                  grads.x_lang_self[-1])
    R_t_t = R_t_t.at[:, 0, 0].set(0.0)
    return R_t_t, R_t_i


def generate_ours_lrp(cams: LxmertTaps, grads: LxmertTaps,
                      normalize_self_attention: bool = True,
                      apply_self_in_rule_10: bool = True,
                      text_valid=None, visual_valid=None,
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """'ours' with use_lrp=True: identical propagation but Ê is built
    from the relprop cams instead of raw attention probabilities
    (ExplanationGenerator.py:64-67 et al.). ``cams`` comes from
    models.lxmert_lrp.relprop."""
    return generate_ours(cams, grads, normalize_self_attention,
                         apply_self_in_rule_10, text_valid, visual_valid)


def _minmax(x):
    lo = x.min(axis=(-2, -1), keepdims=True)
    hi = x.max(axis=(-2, -1), keepdims=True)
    return (x - lo) / (hi - lo)


def generate_partial_lrp(cams: LxmertTaps) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Head-mean of the last x-layer's LRP cams, min-max normalised
    (ExplanationGenerator.py:462-506)."""
    R_t_i = _minmax(cams.x_lang_cross[-1].mean(axis=1))
    R_t_t = _minmax(cams.x_lang_self[-1].mean(axis=1))
    R_t_t = R_t_t.at[:, 0, 0].set(0.0)
    return R_t_t, R_t_i


def generate_transformer_att(cams: LxmertTaps, grads: LxmertTaps
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Chefer-2020 transformer-attribution baseline
    (ExplanationGenerator.py:373-460): grad⊙LRP-cam rollout per stream
    (NO cross-modal coupling), bridged by the last x-layer's cross cam.
    """
    def per_example(c: LxmertTaps, g: LxmertTaps):
        St = c.lang.shape[-1]
        R_t_t = jnp.eye(St, dtype=c.lang.dtype)

        def step(R, x):
            cam, grad = x
            return R + _avg(cam, grad) @ R, None

        # lang: 9 self layers + x-layers[:-1] lang self
        lang_chain = (jnp.concatenate([c.lang, c.x_lang_self[:-1]], axis=0),
                      jnp.concatenate([g.lang, g.x_lang_self[:-1]], axis=0))
        R_t_t, _ = jax.lax.scan(step, R_t_t, lang_chain)
        R_t_i = _avg(c.x_lang_cross[-1], g.x_lang_cross[-1])
        # last x-layer lang self
        R_t_t = R_t_t + _avg(c.x_lang_self[-1], g.x_lang_self[-1]) @ R_t_t
        R_t_t = R_t_t.at[0, 0].set(0.0)
        return R_t_t, R_t_i

    batchify = lambda taps: LxmertTaps(*(jnp.moveaxis(x, 1, 0) for x in taps))
    return jax.vmap(per_example)(batchify(cams), batchify(grads))


def generate_rollout(attn: LxmertTaps) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rollout baseline (:595-666): separate text/image rollouts over
    [self stacks + per-x self layers], bridged by the last cross cam."""
    def per_example(a: LxmertTaps):
        cams_text = jnp.concatenate(
            [a.lang.mean(axis=1), a.x_lang_self.mean(axis=1)], axis=0)
        cams_image = jnp.concatenate(
            [a.visn.mean(axis=1), a.x_visn_self[:-1].mean(axis=1)], axis=0)
        cam_t_i = a.x_lang_cross[-1].mean(axis=0)
        # reference computes R_t_t (without last x self), R_i_i, bridges,
        # then recomputes R_t_t including the last x-layer self-attention
        R_t_t_partial = rl.compute_rollout_attention(cams_text[:-1])
        R_i_i = rl.compute_rollout_attention(cams_image)
        R_t_i = R_t_t_partial.T @ (cam_t_i @ R_i_i)
        R_t_t = rl.compute_rollout_attention(cams_text)
        R_t_t = R_t_t.at[0, 0].set(0.0)
        return R_t_t, R_t_i

    batchify = lambda taps: LxmertTaps(*(jnp.moveaxis(x, 1, 0) for x in taps))
    return jax.vmap(per_example)(batchify(attn))
