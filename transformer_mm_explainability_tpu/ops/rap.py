"""RAP (Relative Attributing Propagation) relevance rules.

Completes the DETR relprop library (C13): the reference's richest op
copy attaches a ``RAP_relprop`` to every op (DETR/modules/layers.py:
RelPropSimple:69-92, Clone:272-302, Cat:319-343, Sequential:351-354,
BatchNorm2d:369-407, Linear:439-533, Conv2d:585-664).  No reference
entry point calls RAP — it is carried by the op library itself — so
these are pure-functional ports of the per-op rules, parity-tested
per-op against the torch originals.

Conventions match the rest of this package (NOT the torch layouts):
linear weights are ``[in, out]`` (y = x @ w + b), convs are NHWC with
HWIO weights.  Signs/masks/eps guards reproduce the reference
semantics exactly, including its idiosyncrasies (Clone's RAP takes the
PRODUCT of the positive- and negative-part cotangents, :291;
RelPropSimple's RAP multiplies every input by the cotangent of the
FIRST input, :701-705-style ``[0]`` indexing at :73).

All rules are jittable: the "first propagation" switch that the
reference infers from ``R_p.max() == 1`` (layers.py:520) is an
explicit ``first=`` argument here (data-dependent Python branching
does not trace).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from .lrp import safe_divide


def _vjp1(f: Callable, x: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """Cotangent of f at x with seed S (the reference's gradprop)."""
    _, vjp = jax.vjp(f, x)
    return vjp(S)[0]


# ---------------------------------------------------------------------------
# generic ops
# ---------------------------------------------------------------------------

def rap_simple(f: Callable, xs: Sequence[jnp.ndarray], R_p: jnp.ndarray
               ) -> List[jnp.ndarray]:
    """RelPropSimple.RAP_relprop (layers.py:69-92): Sp = R_p/Z, then
    every input is scaled by the cotangent of the FIRST input (the
    reference indexes gradprop(...)[0] even for tuple inputs — for its
    RAP users (Add, pools) the cotangents coincide)."""
    Z, vjp = jax.vjp(lambda *a: f(*a), *xs)
    Sp = safe_divide(R_p, Z)
    Cp = vjp(Sp)[0]
    return [x * Cp for x in xs]


def rap_add(x1: jnp.ndarray, x2: jnp.ndarray, R_p: jnp.ndarray
            ) -> List[jnp.ndarray]:
    """Add inherits RelPropSimple's RAP (layers.py:194, :69-92)."""
    return rap_simple(jnp.add, (x1, x2), R_p)


def rap_clone(x: jnp.ndarray, R_ps: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Clone.RAP_relprop (layers.py:272-302): split each consumer's
    relevance into +/- parts, accumulate both cotangent sums, and
    combine as X * (Cpp * Cpn) — the reference multiplies the two
    accumulated cotangents."""
    Cpp = sum(safe_divide(jnp.maximum(rp, 0.0), x) for rp in R_ps)
    Cpn = sum(safe_divide(jnp.minimum(rp, 0.0), x) for rp in R_ps)
    return x * (Cpp * Cpn)


def rap_cat(xs: Sequence[jnp.ndarray], dim: int, R_p: jnp.ndarray
            ) -> List[jnp.ndarray]:
    """Cat.RAP_relprop (layers.py:319-343)."""
    Z, vjp = jax.vjp(lambda *a: jnp.concatenate(a, axis=dim), *xs)
    Sp = safe_divide(R_p, Z)
    Cps = vjp(Sp)
    return [x * cp for x, cp in zip(xs, Cps)]


# ---------------------------------------------------------------------------
# BatchNorm2d (frozen / eval semantics, NHWC)
# ---------------------------------------------------------------------------

def rap_batchnorm2d(R_p: jnp.ndarray, x: jnp.ndarray, weight: jnp.ndarray,
                    running_var: jnp.ndarray, eps: float,
                    bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BatchNorm2d.RAP_relprop (layers.py:369-407), NHWC.

    The effective channel gain reproduces the reference formula
    verbatim — w / sqrt(running_var**2 + eps), i.e. the VARIANCE is
    squared before the root (:378-380) — and the bias mass is peeled
    off proportionally to the nonzero support of R_p per (N, C) slice
    (:382-386) and re-propagated through the same gain (:390-393).
    """
    w_eff = weight / jnp.sqrt(running_var ** 2 + eps)   # [C], last axis

    def f(R):
        Z1 = x * w_eff
        S1 = safe_divide(R, Z1) * w_eff
        return x * S1

    if bias is not None:
        nz = (R_p != 0).astype(R_p.dtype)
        # torch sums the mask over dims [2,3] of NCHW = spatial; NHWC
        # spatial dims are (1, 2)
        bias_p = safe_divide(bias * nz,
                             jnp.sum(nz, axis=(1, 2), keepdims=True))
        R_p = R_p - bias_p
        return f(R_p) + f(bias_p)
    return f(R_p)


# ---------------------------------------------------------------------------
# Linear ([..., in] @ [in, out] + b)
# ---------------------------------------------------------------------------

def _shift_rel(R: jnp.ndarray, R_val: jnp.ndarray,
               dims) -> jnp.ndarray:
    """shift_rel (layers.py:440-444 / :586-591): subtract the surplus
    R_val evenly over R's nonzero support along `dims`."""
    nz = (R != 0).astype(R.dtype)
    shift = safe_divide(R_val, jnp.sum(nz, axis=dims, keepdims=True)) * nz
    return R - shift


def rap_linear(R_p: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray,
               b: Optional[jnp.ndarray] = None,
               first: bool = False) -> jnp.ndarray:
    """Linear.RAP_relprop (layers.py:439-533).

    ``first=True`` is the reference's "first propagation" branch
    (:520-526, triggered there by R_p.max()==1 on the one-hot seed):
    sign-decomposed forward mass + bias split + redistribute.  The
    generic branch (:528-531) runs the dual pos_prop flows.
    """
    pw, nw = jnp.maximum(w, 0.0), jnp.minimum(w, 0.0)
    px, nx = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)

    if first:
        return _linear_first_prop(R_p, px, nx, pw, nw, b)

    R_nz = (R_p != 0).astype(R_p.dtype)

    def pos_prop(R, fa1, fa2, Za1, Za2, x1):
        """pos_prop (layers.py:446-462).  fa1/fa2 rebuild Za1/Za2 from
        x1 so the cotangent flows through the R_nonzero mask exactly as
        torch's autograd does."""
        R_pos = jnp.maximum(R, 0.0)
        R_neg = jnp.minimum(R, 0.0)
        mask = safe_divide(Za1 + Za2, Za1 + Za2)
        S1 = safe_divide(R_pos * mask, Za1)
        C1 = x1 * _vjp1(fa1, x1, S1)
        S1n = safe_divide(R_neg * mask, Za1)
        C1n = x1 * _vjp1(fa1, x1, S1n)
        S2 = safe_divide(R_pos * safe_divide(Za2, Za1 + Za2), Za2)
        C2 = x1 * _vjp1(fa2, x1, S2)
        S2n = safe_divide(R_neg * safe_divide(Za2, Za1 + Za2), Za2)
        C2n = x1 * _vjp1(fa2, x1, S2n)
        C = (C1 + C2) + (C2n + C1n)
        return _shift_rel(
            C, jnp.sum(C, axis=-1, keepdims=True)
            - jnp.sum(R, axis=-1, keepdims=True), dims=-1)

    def f(R, w1, w2, x1, x2):
        """f (layers.py:464-475): activator/inhibitor decomposition."""
        fa1 = lambda t: (t @ w1) * R_nz
        fa2 = lambda t: -(t @ w2) * R_nz
        fb1 = lambda t: -(t @ w1) * R_nz
        fb2 = lambda t: (t @ w2) * R_nz
        C1 = pos_prop(R, fa1, fa2, fa1(x1), fa2(x1), x1)
        C2 = pos_prop(R, fb1, fb2, fb1(x2), fb2(x2), x2)
        return C1 + C2

    return f(R_p, pw, nw, px, nx)


def _linear_first_prop(pd, px, nx, pw, nw, b):
    """first_prop + redistribute (layers.py:477-518)."""
    Rpp = (px @ pw) * pd
    Rpn = (px @ nw) * pd
    Rnp = (nx @ pw) * pd
    Rnn = (nx @ nw) * pd
    Pos = jnp.sum(Rpp + Rnn, axis=-1, keepdims=True)
    Neg = jnp.sum(Rpn + Rnp, axis=-1, keepdims=True)

    Z1, Z2, Z3, Z4 = px @ pw, px @ nw, nx @ pw, nx @ nw
    C1 = px * (safe_divide(Rpp, Z1) @ pw.T)
    C2 = px * (safe_divide(Rpn, Z2) @ nw.T)
    C3 = nx * (safe_divide(Rnp, Z3) @ pw.T)
    C4 = nx * (safe_divide(Rnn, Z4) @ nw.T)
    bp = b * pd * safe_divide(Pos, Pos + Neg)
    bn = b * pd * safe_divide(Neg, Pos + Neg)
    Cb1 = px * (safe_divide(bp, Z1) @ pw.T)
    Cb2 = px * (safe_divide(bn, Z2) @ nw.T)
    Rp_tmp = C1 + C4 + Cb1 + C2 + C3 + Cb2

    # redistribute (:507-513): Rp3 + Rn3 = (Rp - Rn)/|R|_tot · ΣR
    Rp = jnp.maximum(Rp_tmp, 0.0)
    Rn = jnp.minimum(Rp_tmp, 0.0)
    R_tot = jnp.sum(Rp - Rn, axis=-1, keepdims=True)
    total = jnp.sum(Rp + Rn, axis=-1, keepdims=True)
    return safe_divide(Rp - Rn, R_tot) * total


# ---------------------------------------------------------------------------
# Conv2d (NHWC, HWIO)
# ---------------------------------------------------------------------------

def _conv(x, w, stride, padding):
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    return lax.conv_general_dilated(
        x, w, window_strides=s, padding=[(p[0], p[0]), (p[1], p[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def rap_conv2d(R_p: jnp.ndarray, x: jnp.ndarray, w: jnp.ndarray,
               stride=1, padding=0, first: Optional[bool] = None
               ) -> jnp.ndarray:
    """Conv2d.RAP_relprop (layers.py:585-664), NHWC/HWIO.

    ``first`` = the zB input-layer rule (:639-655); the reference
    auto-selects it when the input has 3 channels (:662).  1x1 kernels
    take the |x|·|w| rule (:612-618); everything else the dual
    pos_prop decomposition (:620-632).
    """
    if first is None:
        first = x.shape[-1] == 3
    pw, nw = jnp.maximum(w, 0.0), jnp.minimum(w, 0.0)
    px, nx = jnp.maximum(x, 0.0), jnp.minimum(x, 0.0)
    conv = lambda t, k: _conv(t, k, stride, padding)

    if first:
        # final_backward (:639-655): zB rule bounded by per-image
        # min (L) and max (H) activations
        L = jnp.min(x, axis=(1, 2, 3), keepdims=True) * jnp.ones_like(x)
        H = jnp.max(x, axis=(1, 2, 3), keepdims=True) * jnp.ones_like(x)
        Za = conv(x, w) - conv(L, pw) - conv(H, nw)
        Sp = safe_divide(R_p, Za)
        g = lambda k: _vjp1(lambda t: conv(t, k), x, Sp)
        return x * g(w) - L * g(pw) - H * g(nw)

    R_nz = (R_p != 0).astype(R_p.dtype)

    if w.shape[0] == 1:  # torch checks kernel-h == 1 (:613)
        xabs, wabs = jnp.abs(x), jnp.abs(w)
        fabs = lambda t: conv(t, wabs) * R_nz
        S = safe_divide(R_p, fabs(xabs))
        return xabs * _vjp1(fabs, xabs, S)

    def pos_prop(R, fa1, fa2, Za1, Za2, x1):
        """pos_prop, conv flavour (:593-609) — NOTE the reference's
        C1n seeds S1n = R_neg·mask / Za2 and pulls it through Za2
        (:598-599), unlike the Linear copy which uses Za1."""
        R_pos = jnp.maximum(R, 0.0)
        R_neg = jnp.minimum(R, 0.0)
        mask = safe_divide(Za1 + Za2, Za1 + Za2)
        S1 = safe_divide(R_pos * mask, Za1)
        C1 = x1 * _vjp1(fa1, x1, S1)
        S1n = safe_divide(R_neg * mask, Za2)
        C1n = x1 * _vjp1(fa2, x1, S1n)
        S2 = safe_divide(R_pos * safe_divide(Za2, Za1 + Za2), Za2)
        C2 = x1 * _vjp1(fa2, x1, S2)
        S2n = safe_divide(R_neg * safe_divide(Za2, Za1 + Za2), Za2)
        C2n = x1 * _vjp1(fa2, x1, S2n)
        C = (C1 + C2) + (C2n + C1n)
        return _shift_rel(
            C, jnp.sum(C, axis=(1, 2, 3), keepdims=True)
            - jnp.sum(R, axis=(1, 2, 3), keepdims=True), dims=(1, 2, 3))

    def f(R, w1, w2, x1, x2):
        fa1 = lambda t: conv(t, w1) * R_nz
        fa2 = lambda t: -conv(t, w2) * R_nz
        fb1 = lambda t: -conv(t, w1) * R_nz
        fb2 = lambda t: conv(t, w2) * R_nz
        C1 = pos_prop(R, fa1, fa2, fa1(x1), fa2(x1), x1)
        C2 = pos_prop(R, fb1, fb2, fb1(x2), fb2(x2), x2)
        return C1 + C2

    return f(R_p, pw, nw, px, nx)
