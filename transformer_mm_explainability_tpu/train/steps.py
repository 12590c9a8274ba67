"""Jittable training steps (classification fine-tune) for the model zoo.

The reference's training loops (MMF TrainerTrainingLoopMixin with AMP +
grad accumulation, DETR train_one_epoch, lxmert tasks/vqa.py) reduce on
TPU to one jitted step over a sharded mesh: forward, loss, grad, optax
update. Gradient all-reduce over the ``dp`` axis and tensor-parallel
collectives over ``tp`` are inserted by XLA from the input shardings
(parallel/mesh.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_adamw(learning_rate: float = 5e-5, weight_decay: float = 1e-4,
               warmup_steps: int = 0, total_steps: int = 10000,
               grad_clip: float = 0.0) -> optax.GradientTransformation:
    """AdamW with linear warmup — the reference's optimizer family
    (VQA2 config: AdamW 5e-5 warmup 6000; DETR: AdamW + StepLR)."""
    if warmup_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup_steps, total_steps)
    else:
        sched = learning_rate
    txs = []
    if grad_clip > 0:
        txs.append(optax.clip_by_global_norm(grad_clip))
    txs.append(optax.adamw(sched, weight_decay=weight_decay))
    return optax.chain(*txs)


def make_bert_adam(learning_rate: float = 5e-5, warmup: float = 0.1,
                   total_steps: int = 10000, weight_decay: float = 0.01,
                   b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6,
                   grad_clip: float = 1.0) -> optax.GradientTransformation:
    """BertAdam — the LXMERT finetune optimizer (lxrt/optimization.py):
    Adam WITHOUT bias correction, decoupled weight decay, linear warmup
    then linear decay ("warmup_linear"), global-norm clip at 1."""
    def schedule(step):
        frac = jnp.minimum(step / total_steps, 1.0)
        warm = frac / warmup
        decay = (1.0 - frac) / (1.0 - warmup)
        return learning_rate * jnp.where(frac < warmup, warm, decay)

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return {"m": zeros, "v": jax.tree_util.tree_map(jnp.zeros_like,
                                                        params),
                "step": jnp.zeros((), jnp.int32)}

    def update(grads, state, params):
        m = jax.tree_util.tree_map(
            lambda m_, g: b1 * m_ + (1 - b1) * g, state["m"], grads)
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1 - b2) * g * g, state["v"], grads)
        lr = schedule(state["step"].astype(jnp.float32))
        updates = jax.tree_util.tree_map(
            lambda m_, v_, p: -lr * (m_ / (jnp.sqrt(v_) + eps)
                                     + weight_decay * p),
            m, v, params)
        return updates, {"m": m, "v": v, "step": state["step"] + 1}

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.GradientTransformation(init, update),
    )


def init_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels).mean()


def soft_target_bce(scores: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """VQA soft-label binary cross-entropy (MMF's logit_bce — the VQA2
    training loss), mean over batch, summed over answers."""
    logp = jax.nn.log_sigmoid(scores)
    lognp = jax.nn.log_sigmoid(-scores)
    return -(targets * logp + (1 - targets) * lognp).sum(-1).mean()


def make_train_step(
    loss_fn: Callable[[Any, Dict[str, jnp.ndarray]], jnp.ndarray],
    tx: optax.GradientTransformation,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], Tuple[TrainState, jnp.ndarray]]:
    """Build a jittable (state, batch) -> (state, loss) step."""

    def step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return step


def make_accum_train_step(loss_fn, tx, accum_steps: int):
    """Gradient-accumulation variant (reference: MMF ``update_frequency``,
    training_loop.py:77-107). ``batch`` gains a leading [accum_steps]
    axis scanned in one jitted program."""

    def step(state: TrainState, batches):
        def micro(carry, batch):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
            acc = jax.tree_util.tree_map(jnp.add, carry[0], grads)
            return (acc, carry[1] + loss), None

        zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, loss), _ = jax.lax.scan(micro, (zero, 0.0), batches)
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss / accum_steps

    return step


def bert_no_decay_mask(params) -> Any:
    """get_bert_configured_parameters (mmf/utils/modeling.py:18-41):
    bias and LayerNorm parameters get weight_decay 0.  In a functional
    pytree, "name contains 'bias'/'LayerNorm'" becomes: leaf path
    contains a bias-like key or a norm-scope key.  Returns a pytree of
    bools (True = APPLY decay) for optax.masked / adamw(mask=...)."""
    import jax

    NO_DECAY_KEYS = {"b", "bias", "conv_b", "decoder_bias"}
    NORM_SCOPES = {"ln", "layer_norm", "layernorm", "attn_ln", "mlp_ln",
                   "ln0", "ln1", "ln_mha", "ln_fcn", "ln_f", "bn",
                   "bn1", "bn2", "bn3"}

    def decay(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None))
                for p in path]
        for k in keys:
            if isinstance(k, str):
                if k in NO_DECAY_KEYS or k.lower() in NORM_SCOPES:
                    return False
        return True

    return jax.tree_util.tree_map_with_path(decay, params)


def make_bert_optimizer(params, learning_rate: float = 5e-5,
                        weight_decay: float = 0.01,
                        finetune_lr_multiplier: float = 1.0,
                        classifier_key: str = "classifier",
                        schedule=None):
    """get_optimizer_parameters_for_bert (mmf/utils/modeling.py:44-67)
    on optax: AdamW whose decay mask exempts bias/LayerNorm leaves,
    and — when ``finetune_lr_multiplier != 1`` — every subtree except
    ``classifier`` trained at lr × multiplier via optax.multi_transform
    (the reference's per-group lr override)."""
    import jax
    import optax

    mask = bert_no_decay_mask(params)

    def adamw(lr):
        tx = optax.adamw(lr if schedule is None else schedule,
                         weight_decay=weight_decay, mask=mask)
        return tx

    if finetune_lr_multiplier == 1.0:
        return adamw(learning_rate)

    def label(path, leaf):
        top = getattr(path[0], "key", None)
        return "classifier" if top == classifier_key else "backbone"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform(
        {"classifier": adamw(learning_rate),
         "backbone": adamw(learning_rate * finetune_lr_multiplier)},
        labels)
