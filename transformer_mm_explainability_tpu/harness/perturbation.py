"""Positive/negative perturbation evaluation (the paper's quantitative
benchmark).

Reference protocols:
  * VisualBERT (mmf_pert): image steps [0,.5,.75,.95,.96,.97,.98,.99,1],
    text steps [0,.25,.5,.75,.8,.85,.9,.95,1]; batch 1; keep top-(1-p)
    tokens/boxes by relevancy (negated for positive perturbation);
    accuracy = soft target of argmax answer
    (VisualBERT/mmf/trainers/core/evaluation_loop.py:73-169).
  * LXMERT: steps [0,.25,.5,.75,.8,.85,.9,.95,1] for both modalities;
    text keeps [CLS]/[SEP] always and SORTS kept indices so position
    embeddings stay consistent (lxmert/lxmert/perturbation.py:42-194).

TPU design: the reference re-runs the model once per step per sample in
Python (9 fwd per sample per modality). Here all steps are evaluated in
ONE jitted, step-vmapped forward:
  * image perturbation masks dropped boxes via the additive attention
    mask (-10000), which is numerically identical to physical removal
    (padded-box masking is the same mechanism the models already use);
  * text perturbation gathers kept tokens into a contiguous prefix in
    sorted order — exactly reproducing the reference's physical-removal
    + re-sort semantics with static shapes.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_STEPS_VISUALBERT = (0.0, 0.5, 0.75, 0.95, 0.96, 0.97, 0.98, 0.99, 1.0)
TEXT_STEPS = (0.0, 0.25, 0.5, 0.75, 0.8, 0.85, 0.9, 0.95, 1.0)
LXMERT_STEPS = TEXT_STEPS


def _num_keep_table(steps: Sequence[float], n_max: int) -> jnp.ndarray:
    """``int((1 - step) * n)`` for every n in [0, n_max], computed in
    Python float64 — bit-exact with the reference's host arithmetic
    (evaluation_loop.py:115, perturbation.py:64/105/167). Computing this
    in traced float32 is off by one at boundaries, e.g.
    step=0.9, n=10: f64 gives int(0.0999..*10)=0, f32 int(0.1000002*10)=1.
    Returns [n_steps, n_max+1] int32 (steps are static, so this is a
    compile-time constant gather table)."""
    return jnp.asarray(
        [[int((1.0 - s) * n) for n in range(n_max + 1)] for s in steps],
        jnp.int32)


def topk_keep_mask(cam: jnp.ndarray, num_keep: jnp.ndarray,
                   valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Boolean keep-mask of the ``num_keep`` highest-relevancy entries.

    ``cam``: [N] relevancy (already negated for positive perturbation);
    ``valid``: [N] entries eligible for ranking (invalid ranked last).
    Static-shape top-k via sorting.
    """
    N = cam.shape[0]
    if valid is not None:
        cam = jnp.where(valid, cam, -jnp.inf)
    order = jnp.argsort(-cam)  # descending
    ranks = jnp.zeros((N,), jnp.int32).at[order].set(jnp.arange(N, dtype=jnp.int32))
    return ranks < num_keep


def gather_kept_prefix(tokens: jnp.ndarray, keep: jnp.ndarray,
                       pad_id: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack kept tokens into a contiguous prefix preserving order (the
    reference's sorted physical removal). Returns (packed_tokens,
    packed_mask)."""
    N = tokens.shape[0]
    keep_i = keep.astype(jnp.int32)
    dest = jnp.cumsum(keep_i) - 1  # position for each kept token
    dest = jnp.where(keep, dest, N)  # dropped → scatter to overflow slot
    packed = jnp.full((N + 1,), pad_id, tokens.dtype).at[dest].set(tokens)[:N]
    n_keep = keep_i.sum()
    packed_mask = (jnp.arange(N) < n_keep).astype(jnp.int32)
    return packed, packed_mask


def run_image_perturbation(
    forward_scores: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cam_image: jnp.ndarray,            # [N_boxes] relevancy per box
    targets: jnp.ndarray,              # [num_labels] soft labels
    steps: Sequence[float],
    positive: bool,
    num_boxes: Optional[jnp.ndarray] = None,
    visual_mask_key: str = "visual_mask",
) -> jnp.ndarray:
    """Per-step accuracies [len(steps)] for ONE sample.

    ``forward_scores`` maps a batch dict to answer scores
    [B, num_labels]; it is called once with B = len(steps) (the step
    axis rides the batch axis, so the model's ordinary batched forward
    is reused — no per-step graph replication)."""
    cam = -cam_image if positive else cam_image
    N = cam_image.shape[0]
    if num_boxes is None:
        num_boxes = jnp.asarray(N)
    num_keep = _num_keep_table(steps, N)[:, num_boxes]
    n_steps = len(steps)

    # the step axis becomes a plain batch axis: ONE ordinary forward at
    # B=n_steps instead of n_steps copies of the graph (huge compile win)
    keeps = jax.vmap(
        lambda k: topk_keep_mask(cam, k, valid=jnp.arange(N) < num_boxes)
    )(num_keep)
    b = {k: jnp.broadcast_to(v[0], (n_steps,) + v.shape[1:])
         for k, v in batch.items()}
    b[visual_mask_key] = keeps.astype(jnp.int32)
    scores = forward_scores(b)           # [n_steps, num_labels]
    return targets[jnp.argmax(scores, axis=-1)]


def run_text_perturbation(
    forward_scores: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    cam_text: jnp.ndarray,             # [S_text]
    targets: jnp.ndarray,
    steps: Sequence[float],
    positive: bool,
    always_keep: jnp.ndarray,          # [S_text] bool (CLS/SEP/'?' etc.)
    text_len: jnp.ndarray,             # actual (unpadded) length
    input_ids_key: str = "input_ids",
    input_mask_key: str = "input_mask",
    extra_gather_keys: Sequence[str] = (),
) -> jnp.ndarray:
    """Per-step accuracies for text perturbation of one sample.

    Ranks only non-protected valid tokens; packs kept tokens (sorted) to
    a contiguous prefix (reference perturbation.py:160-194 semantics).
    """
    cam = -cam_text if positive else cam_text
    S = cam_text.shape[0]
    valid = jnp.arange(S) < text_len
    rankable = valid & ~always_keep
    n_rankable = rankable.sum()
    num_keep = _num_keep_table(steps, S)[:, n_rankable]
    n_steps = len(steps)

    def build_step(k):
        keep_ranked = topk_keep_mask(cam, k, valid=rankable)
        keep = (keep_ranked & rankable) | (always_keep & valid)
        ids, mask = gather_kept_prefix(batch[input_ids_key][0], keep)
        extras = tuple(gather_kept_prefix(batch[key][0], keep)[0]
                       for key in extra_gather_keys)
        return ids, mask, extras

    ids, mask, extras = jax.vmap(build_step)(num_keep)
    b = {k: jnp.broadcast_to(v[0], (n_steps,) + v.shape[1:])
         for k, v in batch.items()}
    b[input_ids_key] = ids
    b[input_mask_key] = mask
    for key, g in zip(extra_gather_keys, extras):
        b[key] = g
    scores = forward_scores(b)           # [n_steps, num_labels]
    return targets[jnp.argmax(scores, axis=-1)]


def run_image_perturbation_batch(
    forward_scores: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray],
    batch: Dict[str, jnp.ndarray],      # leaves [N, ...]
    cam_image: jnp.ndarray,             # [N, N_boxes]
    targets: jnp.ndarray,               # [N, num_labels]
    steps: Sequence[float],
    positive: bool,
    num_boxes: Optional[jnp.ndarray] = None,   # [N]
    visual_mask_key: str = "visual_mask",
) -> jnp.ndarray:
    """Multi-sample variant: N samples × n_steps ride one batch axis
    (B = N·n_steps) through a single ordinary forward.
    Returns [N, n_steps] per-step accuracies."""
    N, Nb = cam_image.shape
    cam = -cam_image if positive else cam_image
    if num_boxes is None:
        num_boxes = jnp.full((N,), Nb)
    n_steps = len(steps)
    num_keep = _num_keep_table(steps, Nb)[:, num_boxes].T    # [N, S]
    keeps = jax.vmap(lambda c, ks, nb: jax.vmap(
        lambda k: topk_keep_mask(c, k, valid=jnp.arange(Nb) < nb))(ks)
    )(cam, num_keep, num_boxes)                              # [N, S, Nb]

    big = {k: jnp.repeat(v, n_steps, axis=0) for k, v in batch.items()}
    big[visual_mask_key] = keeps.reshape(N * n_steps, Nb).astype(jnp.int32)
    scores = forward_scores(big).reshape(N, n_steps, -1)
    picked = jnp.take_along_axis(
        targets[:, None, :], scores.argmax(-1)[..., None], axis=2)[..., 0]
    return picked


def run_text_perturbation_batch(
    forward_scores: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray],
    batch: Dict[str, jnp.ndarray],      # leaves [N, ...]
    cam_text: jnp.ndarray,              # [N, S_text]
    targets: jnp.ndarray,               # [N, num_labels]
    steps: Sequence[float],
    positive: bool,
    always_keep: jnp.ndarray,           # [N, S_text] bool
    text_len: jnp.ndarray,              # [N]
    input_ids_key: str = "input_ids",
    input_mask_key: str = "input_mask",
) -> jnp.ndarray:
    """Multi-sample text perturbation: N samples × n_steps in one
    forward. Returns [N, n_steps]."""
    N, S = cam_text.shape
    cam = -cam_text if positive else cam_text
    n_steps = len(steps)
    valid = jnp.arange(S)[None, :] < text_len[:, None]
    rankable = valid & ~always_keep
    n_rankable = rankable.sum(axis=1)
    num_keep = _num_keep_table(steps, S)[:, n_rankable].T      # [N, S_steps]

    def build(c, ks, rk, ak, vd, ids):
        def one(k):
            keep_ranked = topk_keep_mask(c, k, valid=rk)
            keep = (keep_ranked & rk) | (ak & vd)
            return gather_kept_prefix(ids, keep)
        return jax.vmap(one)(ks)

    packed_ids, packed_mask = jax.vmap(build)(
        cam, num_keep, rankable, always_keep, valid,
        batch[input_ids_key])                                  # [N, S_steps, S]
    big = {k: jnp.repeat(v, n_steps, axis=0) for k, v in batch.items()}
    big[input_ids_key] = packed_ids.reshape(N * n_steps, S)
    big[input_mask_key] = packed_mask.reshape(N * n_steps, S)
    scores = forward_scores(big).reshape(N, n_steps, -1)
    picked = jnp.take_along_axis(
        targets[:, None, :], scores.argmax(-1)[..., None], axis=2)[..., 0]
    return picked


def auc(step_accs: np.ndarray, steps: Sequence[float]) -> float:
    """Area under the per-step accuracy curve (trapezoidal over the
    perturbation fractions) — the paper's summary metric."""
    trapezoid = getattr(np, "trapezoid", None) or np.trapz  # numpy<2.0
    return float(trapezoid(step_accs, x=np.asarray(steps)))
