"""Per-op RAP rule parity vs the reference RAP_relprop implementations
(DETR/modules/layers.py:69-92, 272-302, 319-343, 369-407, 439-533,
585-664). RAP is carried by the reference op library but never invoked
by its main flow; these tests pin every rule the library ships."""

import numpy as np
import pytest

from conftest import load_reference_module, requires_reference

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from transformer_mm_explainability_tpu.ops import rap


@pytest.fixture(scope="module")
def L():
    return load_reference_module("DETR/modules/layers.py", "ref_rap_layers")


def _np(t):
    return t.detach().numpy()


@requires_reference
def test_rap_add(L):
    rng = np.random.RandomState(0)
    x1 = rng.randn(4, 7).astype(np.float32)
    x2 = rng.randn(4, 7).astype(np.float32)
    Rp = rng.randn(4, 7).astype(np.float32)

    mod = L.Add()
    mod([torch.from_numpy(x1), torch.from_numpy(x2)])
    ref = mod.RAP_relprop(torch.from_numpy(Rp))

    got = rap.rap_add(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(Rp))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), _np(r), atol=1e-6)


@requires_reference
def test_rap_simple_pool(L):
    """RelPropSimple.RAP on a single-input op (MaxPool2d)."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, 6, 8, 8).astype(np.float32)  # NCHW for torch

    mod = L.MaxPool2d(kernel_size=2, stride=2)
    y = mod(torch.from_numpy(x))
    Rp = rng.randn(*y.shape).astype(np.float32)
    ref = mod.RAP_relprop(torch.from_numpy(Rp))

    import jax

    def pool(t):  # NHWC maxpool 2x2/2
        return jax.lax.reduce_window(
            t, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    got = rap.rap_simple(pool, (jnp.asarray(x.transpose(0, 2, 3, 1)),),
                         jnp.asarray(Rp.transpose(0, 2, 3, 1)))[0]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               _np(ref), atol=1e-5)


@requires_reference
def test_rap_clone(L):
    """The reference Clone.RAP_relprop is unrunnable as shipped:
    `for z, rp, rn in zip(Z, R_p)` (layers.py:280) unpacks 2-tuples
    into three names and raises ValueError on every input.  Pin that
    fact, then check our rule implements the evident intent (per-
    consumer ±-split cotangent sums, combined as X·(Cpp·Cpn), :282-291)
    against a direct NumPy transcription."""
    rng = np.random.RandomState(2)
    x = rng.randn(3, 5).astype(np.float32) + 0.1
    Rps = [rng.randn(3, 5).astype(np.float32) for _ in range(3)]

    mod = L.Clone()
    mod(torch.from_numpy(x), 3)
    with pytest.raises(ValueError):
        mod.RAP_relprop([torch.from_numpy(r) for r in Rps])

    got = rap.rap_clone(jnp.asarray(x), [jnp.asarray(r) for r in Rps])
    cpp = sum(np.clip(r, 0, None) / x for r in Rps)
    cpn = sum(np.clip(r, None, 0) / x for r in Rps)
    np.testing.assert_allclose(np.asarray(got), x * cpp * cpn, atol=1e-5)


@requires_reference
def test_rap_cat(L):
    rng = np.random.RandomState(3)
    xs = [rng.randn(2, k, 4).astype(np.float32) for k in (3, 5)]
    Rp = rng.randn(2, 8, 4).astype(np.float32)

    mod = L.Cat()
    mod([torch.from_numpy(x) for x in xs], 1)
    ref = mod.RAP_relprop(torch.from_numpy(Rp))

    got = rap.rap_cat([jnp.asarray(x) for x in xs], 1, jnp.asarray(Rp))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), _np(r), atol=1e-6)


@requires_reference
def test_rap_batchnorm2d(L):
    rng = np.random.RandomState(4)
    C = 6
    x = rng.randn(2, C, 5, 7).astype(np.float32)
    Rp = rng.randn(2, C, 5, 7).astype(np.float32)
    Rp[0, 1, :2] = 0.0  # exercise the nonzero-support bias split

    mod = L.BatchNorm2d(C)
    mod.eval()
    with torch.no_grad():
        mod.weight.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
        mod.bias.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
        mod.running_var.copy_(torch.from_numpy(
            (rng.rand(C) + 0.3).astype(np.float32)))
        mod.running_mean.copy_(torch.from_numpy(
            rng.randn(C).astype(np.float32)))
    mod(torch.from_numpy(x))
    ref = mod.RAP_relprop(torch.from_numpy(Rp))

    got = rap.rap_batchnorm2d(
        jnp.asarray(Rp.transpose(0, 2, 3, 1)),
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(_np(mod.weight)), jnp.asarray(_np(mod.running_var)),
        mod.eps, bias=jnp.asarray(_np(mod.bias)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               _np(ref), atol=1e-5)


@requires_reference
def test_rap_linear_generic(L):
    rng = np.random.RandomState(5)
    x = rng.randn(4, 9).astype(np.float32)
    Rp = rng.randn(4, 11).astype(np.float32)
    Rp[1, :5] = 0.0  # nonzero-mask path

    mod = L.Linear(9, 11)
    mod(torch.from_numpy(x))
    ref = mod.RAP_relprop(torch.from_numpy(Rp))

    got = rap.rap_linear(jnp.asarray(Rp), jnp.asarray(x),
                         jnp.asarray(_np(mod.weight).T),
                         b=jnp.asarray(_np(mod.bias)))
    np.testing.assert_allclose(np.asarray(got), _np(ref),
                               atol=1e-5, rtol=1e-4)


@requires_reference
def test_rap_linear_first(L):
    """The one-hot 'first propagation' branch (layers.py:520-526)."""
    rng = np.random.RandomState(6)
    x = rng.randn(4, 9).astype(np.float32)
    pd = np.zeros((4, 11), np.float32)
    pd[np.arange(4), rng.randint(0, 11, 4)] = 1.0  # max == 1 → first

    mod = L.Linear(9, 11)
    mod(torch.from_numpy(x))
    ref = mod.RAP_relprop(torch.from_numpy(pd))

    got = rap.rap_linear(jnp.asarray(pd), jnp.asarray(x),
                         jnp.asarray(_np(mod.weight).T),
                         b=jnp.asarray(_np(mod.bias)), first=True)
    np.testing.assert_allclose(np.asarray(got), _np(ref),
                               atol=1e-5, rtol=1e-4)


def _conv_pair(L, rng, cin, cout, k, stride, padding):
    mod = L.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False)
    x = rng.randn(2, cin, 9, 9).astype(np.float32)
    y = mod(torch.from_numpy(x))
    Rp = rng.randn(*y.shape).astype(np.float32)
    w_hwio = _np(mod.weight).transpose(2, 3, 1, 0)
    return mod, x, Rp, w_hwio


@requires_reference
def test_rap_conv2d_first_zb(L):
    """3-channel input → zB final_backward (layers.py:639-655, :662)."""
    rng = np.random.RandomState(7)
    mod, x, Rp, w = _conv_pair(L, rng, 3, 8, 3, stride=2, padding=1)
    ref = mod.RAP_relprop(torch.from_numpy(Rp))
    got = rap.rap_conv2d(jnp.asarray(Rp.transpose(0, 2, 3, 1)),
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(w), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               _np(ref), atol=1e-5, rtol=1e-4)


@requires_reference
def test_rap_conv2d_1x1(L):
    rng = np.random.RandomState(8)
    mod, x, Rp, w = _conv_pair(L, rng, 5, 8, 1, stride=1, padding=0)
    ref = mod.RAP_relprop(torch.from_numpy(Rp))
    got = rap.rap_conv2d(jnp.asarray(Rp.transpose(0, 2, 3, 1)),
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(w), stride=1, padding=0)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               _np(ref), atol=1e-5, rtol=1e-4)


@requires_reference
def test_rap_conv2d_general(L):
    rng = np.random.RandomState(9)
    mod, x, Rp, w = _conv_pair(L, rng, 5, 6, 3, stride=1, padding=1)
    Rp[0, 2, :3] = 0.0  # exercise the R_nonzero mask
    ref = mod.RAP_relprop(torch.from_numpy(Rp))
    got = rap.rap_conv2d(jnp.asarray(Rp.transpose(0, 2, 3, 1)),
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(w), stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               _np(ref), atol=1e-4, rtol=1e-3)


@requires_reference
def test_rap_sequential_chain(L):
    """Two-op reversed walk (Sequential.RAP_relprop, layers.py:351-354):
    Linear → ReLU → Linear, RAP seeded at the output."""
    rng = np.random.RandomState(10)
    x = rng.randn(3, 8).astype(np.float32)

    l1, relu, l2 = L.Linear(8, 12), L.ReLU(), L.Linear(12, 5)
    seq = L.Sequential(l1, relu, l2)
    seq(torch.from_numpy(x))
    Rp = rng.randn(3, 5).astype(np.float32)
    ref = seq.RAP_relprop(torch.from_numpy(Rp))

    h1 = _np(l1.X)        # captured inputs at each stage
    h2 = _np(l2.X)
    R = rap.rap_linear(jnp.asarray(Rp), jnp.asarray(h2),
                       jnp.asarray(_np(l2.weight).T),
                       b=jnp.asarray(_np(l2.bias)))
    # ReLU: RelProp base → identity (layers.py:51-52)
    R = rap.rap_linear(R, jnp.asarray(h1),
                       jnp.asarray(_np(l1.weight).T),
                       b=jnp.asarray(_np(l1.bias)))
    np.testing.assert_allclose(np.asarray(R), _np(ref),
                               atol=1e-5, rtol=1e-4)
