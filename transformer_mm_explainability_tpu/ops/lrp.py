"""LRP relevance-propagation rules (the "relprop" op library).

The reference ships four near-identical torch op libraries whose modules
record inputs via forward hooks and implement per-op ``relprop``
(DETR/modules/layers.py, lxmert/lxmert/src/layers.py,
VisualBERT/.../backends/layers_ours.py, layers_lrp.py). On TPU the
stateful hook machinery disappears: each rule here is a pure function of
(R, recorded inputs); model-level relprop passes are explicit reversed
walks that REMATERIALISE layer internals from taped layer inputs
(recompute-not-store — the TPU-friendly trade).

Rule semantics (cited from lxmert/lxmert/src/layers.py):
  safe_divide        :10-13
  RelPropSimple      :48-60  (Z=f(X); S=R/Z; C=vjp(S); out=X·C)
  Add (sum-conserving factor split)    :107-130
  Clone (sum of cotangents)            :161-179
  IndexSelect / Cat                    :139-157, 182-196
  Linear α-β (uniform S=R/(Z1+Z2))     :219-242
  layers_lrp.py Linear (per-branch S1=R/Z1, S2=R/Z2) — the
  "orig_lrp" variant used by BERT_orig_lrp.
  Softmax/LayerNorm/GELU/Tanh/Dropout/ReLU: identity pass-through
  (RelProp base class :45-46).
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp


def safe_divide(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a / b with the reference's exact guard (layers.py:10-13):
    den = clamp(b, min=1e-9) + clamp(b, max=1e-9); +1e-9 where zero;
    result zeroed where b == 0."""
    den = jnp.maximum(b, 1e-9) + jnp.minimum(b, 1e-9)
    den = den + (den == 0).astype(den.dtype) * 1e-9
    return a / den * (b != 0).astype(b.dtype)


def relprop_simple(f: Callable, xs: Sequence[jnp.ndarray],
                   R: jnp.ndarray) -> List[jnp.ndarray]:
    """Generic RelPropSimple: works for matmul, einsum, mul, cat, index
    ops — any op whose relevance rule is X ⊙ ∇f·(R/Z)."""
    Z, vjp = jax.vjp(lambda *a: f(*a), *xs)
    S = safe_divide(R, Z)
    Cs = vjp(S)
    return [x * c for x, c in zip(xs, Cs)]


def matmul_relprop(a: jnp.ndarray, b: jnp.ndarray, R: jnp.ndarray,
                   halve: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RelPropSimple on a matmul; the attention relprops halve both
    outputs (lxmert_lrp.py:427-430, 443-445)."""
    Ra, Rb = relprop_simple(jnp.matmul, (a, b), R)
    if halve:
        return Ra / 2, Rb / 2
    return Ra, Rb


def add_relprop(x1: jnp.ndarray, x2: jnp.ndarray, R: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sum-conserving Add split (layers.py:107-130): RelPropSimple then
    renormalise each branch so branch totals split R.sum() by |mass|."""
    a, b = relprop_simple(jnp.add, (x1, x2), R)
    a_sum, b_sum = a.sum(), b.sum()
    tot = jnp.abs(a_sum) + jnp.abs(b_sum)
    a_fact = safe_divide(jnp.abs(a_sum), tot) * R.sum()
    b_fact = safe_divide(jnp.abs(b_sum), tot) * R.sum()
    a = a * safe_divide(a_fact, a.sum())
    b = b * safe_divide(b_fact, b.sum())
    return a, b


def add_relprop_simple(x1: jnp.ndarray, x2: jnp.ndarray, R: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain RelPropSimple Add — the layers_lrp.py variant."""
    a, b = relprop_simple(jnp.add, (x1, x2), R)
    return a, b


def clone_relprop(x: jnp.ndarray, Rs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Clone: each consumer's R is divided by X and the cotangents sum
    (layers.py:161-179) → R = X · Σ (R_i / X)."""
    S = sum(safe_divide(r, x) for r in Rs)
    return x * S


def linear_alpha_beta(
    R: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray,
    alpha: float = 1.0, uniform: bool = True,
) -> jnp.ndarray:
    """α-β LRP for y = x @ w ([..., in] @ [in, out]).

    ``uniform=True`` → S1 = S2 = R/(Z1+Z2) (lxmert layers.py:227-235 and
    layers_ours.py); ``uniform=False`` → per-branch S1 = R/Z1, S2 = R/Z2
    (layers_lrp.py). Bias is ignored by the rule, as in the reference.
    """
    beta = alpha - 1.0
    pw, nw = jnp.maximum(w, 0.0), jnp.minimum(w, 0.0)
    px, nx = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)

    def f(w1, w2, x1, x2):
        Z1 = x1 @ w1
        Z2 = x2 @ w2
        if uniform:
            S1 = S2 = safe_divide(R, Z1 + Z2)
        else:
            S1, S2 = safe_divide(R, Z1), safe_divide(R, Z2)
        C1 = x1 * (S1 @ w1.T)
        C2 = x2 * (S2 @ w2.T)
        return C1 + C2

    activator = f(pw, nw, px, nx)
    inhibitor = f(nw, pw, px, nx)
    return alpha * activator - beta * inhibitor


def index_select_relprop(x: jnp.ndarray, dim: int, indices: jnp.ndarray,
                         R: jnp.ndarray) -> jnp.ndarray:
    return relprop_simple(
        lambda a: jnp.take(a, indices, axis=dim), (x,), R)[0]


def cat_relprop(xs: Sequence[jnp.ndarray], dim: int, R: jnp.ndarray
                ) -> List[jnp.ndarray]:
    return relprop_simple(
        lambda *a: jnp.concatenate(a, axis=dim), xs, R)
