"""DETR training step (C37: main.py/engine.py train path, TPU-shaped).

The Hungarian assignment is a tiny host-side solve between two jitted
programs (the forward producing logits/boxes, and the loss+grad step
taking the assignment as data). The loss weights follow the reference
(ce 1, bbox 5, giou 2; eos coef 0.1; DETR/main.py args).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from transformer_mm_explainability_tpu.models import detr as detr_model
from transformer_mm_explainability_tpu.models import matcher
from transformer_mm_explainability_tpu.train import steps

LOSS_WEIGHTS = {"loss_ce": 1.0, "loss_bbox": 5.0, "loss_giou": 2.0}


def make_detr_train_step(cfg: detr_model.DETRConfig,
                         tx: optax.GradientTransformation,
                         eos_coef: float = 0.1):
    """Returns (predict_fn, step_fn):
      predict_fn(params, images) → (pred_logits, pred_boxes)   [jitted]
      step_fn(state, batch, assignment) → (state, loss dict)   [jitted]
    Drive as: preds = predict(params, imgs); a = matcher.match(...);
    state, losses = step(state, batch, a).
    """

    @jax.jit
    def predict(params, images):
        out = detr_model.forward(params, images, cfg=cfg)
        return out["pred_logits"], out["pred_boxes"]

    def loss_fn(params, batch):
        out = detr_model.forward(params, batch["images"], cfg=cfg)
        losses = matcher.set_criterion_losses(
            out["pred_logits"], out["pred_boxes"],
            batch["tgt_labels"], batch["tgt_boxes"], batch["assignment"],
            eos_coef=eos_coef, num_classes=cfg.num_classes)
        total = sum(LOSS_WEIGHTS[k] * losses[k] for k in LOSS_WEIGHTS)
        return total, losses

    @jax.jit
    def step(state: steps.TrainState, batch):
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        losses = dict(losses, loss=total)
        return steps.TrainState(params, opt_state, state.step + 1), losses

    return predict, step


def train_batch(params_state: steps.TrainState, images, tgt_labels,
                tgt_boxes, n_valid, predict, step,
                match_cfg: matcher.MatcherConfig = matcher.MatcherConfig()):
    """One full update: forward → host Hungarian → loss/grad step."""
    logits, boxes = predict(params_state.params, images)
    assignment = matcher.match(logits, boxes, tgt_labels, tgt_boxes,
                               n_valid, match_cfg)
    batch = {"images": images, "tgt_labels": tgt_labels,
             "tgt_boxes": tgt_boxes,
             "assignment": jnp.asarray(assignment)}
    return step(params_state, batch)
