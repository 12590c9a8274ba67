"""LR-schedule registry — MMF's four registered schedulers + adam_w
(C24/C25).

Re-design of ``VisualBERT/mmf/modules/schedulers.py`` (pythia:14,
warmup_linear:28, warmup_cosine:34, multi_step:40) and
``mmf/modules/optimizers.py`` (adam_w:7), plus the ``pythia`` lambda
itself (``mmf/utils/general.py:18-24``).

TPU-native shape: each scheduler is a factory returning an optax-style
``schedule(step) -> multiplier`` (the torch ``LambdaLR`` contract —
multiply the base lr by the returned factor), usable directly as
``optax.scale_by_schedule`` inputs or via ``make_optimizer``.  All are
pure jnp functions of the step scalar, so they live inside the jitted
update step — no host-side `.step()` mutation like torch's LambdaLR.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import optax

from transformer_mm_explainability_tpu.core.registry import registry

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


@registry.register_scheduler("pythia")
def pythia(use_warmup: bool = False, warmup_iterations: int = 1000,
           warmup_factor: float = 0.2,
           lr_steps: Sequence[int] = (14000,),
           lr_ratio: float = 0.1) -> Schedule:
    """PythiaScheduler (schedulers.py:14-25) over lr_lambda_update
    (general.py:18-24): optional linear warmup from ``warmup_factor``,
    then staircase decay by ``lr_ratio`` at each milestone.  Matches
    torch's ``bisect(lr_steps, i)`` right-insertion semantics."""
    steps = jnp.asarray(list(lr_steps), jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        idx = (steps <= step).sum()  # bisect_right for step >= milestone
        decay = jnp.power(lr_ratio, idx.astype(jnp.float32))
        if not use_warmup:
            return decay
        alpha = step / float(warmup_iterations)
        warm = warmup_factor * (1.0 - alpha) + alpha
        return jnp.where(step <= warmup_iterations, warm, decay)

    return schedule


@registry.register_scheduler("warmup_linear")
def warmup_linear(num_warmup_steps: int, num_training_steps: int
                  ) -> Schedule:
    """WarmupLinearScheduler (schedulers.py:28-31) ==
    transformers.get_linear_schedule_with_warmup: linear 0→1 over the
    warmup, then linear 1→0 to the end."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        decay = (num_training_steps - step) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps)
        return jnp.maximum(0.0, jnp.where(step < num_warmup_steps,
                                          warm, decay))

    return schedule


@registry.register_scheduler("warmup_cosine")
def warmup_cosine(num_warmup_steps: int, num_training_steps: int,
                  num_cycles: float = 0.5) -> Schedule:
    """WarmupCosineScheduler (schedulers.py:34-37) ==
    transformers.get_cosine_schedule_with_warmup."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, num_warmup_steps)
        progress = (step - num_warmup_steps) / jnp.maximum(
            1.0, num_training_steps - num_warmup_steps)
        cos = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * progress))
        return jnp.where(step < num_warmup_steps, warm,
                         jnp.maximum(0.0, cos))

    return schedule


@registry.register_scheduler("multi_step")
def multi_step(use_warmup: bool = False, lr_steps: Sequence[int] = (14000,),
               lr_ratio: float = 0.1, warmup_iterations: int = 1000,
               warmup_factor: float = 0.2) -> Schedule:
    """MultiStepScheduler (schedulers.py:40-62): same staircase as
    pythia but the warmup gate checks ``use_warmup`` inside get_lr and
    asserts the warmup ends before the first milestone.  The reference
    zeroes warmup_iterations when use_warmup is False (:45-47) BEFORE
    asserting — no-warmup configs with early milestones are legal."""
    if not use_warmup:
        warmup_iterations = 0
    assert warmup_iterations < lr_steps[0]
    return pythia(use_warmup=use_warmup,
                  warmup_iterations=warmup_iterations,
                  warmup_factor=warmup_factor, lr_steps=lr_steps,
                  lr_ratio=lr_ratio)


@registry.register_optimizer("adam_w")
def adam_w(lr: float = 1e-4, betas=(0.9, 0.999), eps: float = 1e-8,
           weight_decay: float = 0.01,
           schedule: Schedule = None) -> optax.GradientTransformation:
    """adam_w (optimizers.py:7, transformers.AdamW): decoupled weight
    decay, optionally modulated by a registered schedule."""
    tx = optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                     weight_decay=weight_decay)
    if schedule is not None:
        tx = optax.chain(tx, optax.scale_by_schedule(
            lambda step: schedule(step)))
    return tx


def _register_torch_named_optimizers():
    """build_optimizer (mmf/utils/build.py:218-219) falls back to
    ``torch.optim`` names when a type isn't registered — mirror the
    names MMF configs actually use onto optax."""

    @registry.register_optimizer("Adamax")
    def adamax(lr: float = 2e-3, eps: float = 1e-8,
               weight_decay: float = 0.0, betas=(0.9, 0.999)):
        tx = optax.adamax(lr, b1=betas[0], b2=betas[1], eps=eps)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx

    @registry.register_optimizer("Adam")
    def adam(lr: float = 1e-3, eps: float = 1e-8, betas=(0.9, 0.999),
             weight_decay: float = 0.0):
        if weight_decay:
            return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                               weight_decay=weight_decay)
        return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)

    @registry.register_optimizer("AdamW")
    def adamw(lr: float = 1e-3, eps: float = 1e-8, betas=(0.9, 0.999),
              weight_decay: float = 0.01):
        return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)

    @registry.register_optimizer("SGD")
    def sgd(lr: float = 0.01, momentum: float = 0.0,
            weight_decay: float = 0.0, nesterov: bool = False):
        tx = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
        if weight_decay:
            tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
        return tx


_register_torch_named_optimizers()


def _register_bert_adam():
    """lxmert's BertAdam (lxrt/optimization.py) under the config name
    the run scripts use (--optim bert)."""
    from transformer_mm_explainability_tpu.train import steps

    registry.register_optimizer("bert_adam")(steps.make_bert_adam)


_register_bert_adam()
