"""LRP rule parity vs the reference's torch relprop op library."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import requires_reference, load_reference_module

from transformer_mm_explainability_tpu.ops import lrp


@pytest.fixture(scope="module")
def ref_layers():
    return load_reference_module("lxmert/lxmert/src/layers.py", "ref_layers_lx")


def rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@requires_reference
def test_safe_divide_parity(ref_layers):
    import torch

    a = rand(4, 5, seed=1)
    b = rand(4, 5, seed=2)
    b[0, 0] = 0.0
    b[1, 1] = 1e-12
    want = ref_layers.safe_divide(torch.tensor(a), torch.tensor(b)).numpy()
    got = np.asarray(lrp.safe_divide(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-6)


@requires_reference
def test_matmul_relprop_parity(ref_layers):
    import torch

    x1 = rand(2, 3, 4, seed=3)
    x2 = rand(2, 4, 5, seed=4)
    R = rand(2, 3, 5, seed=5)
    m = ref_layers.MatMul()
    tx = [torch.tensor(x1, requires_grad=True),
          torch.tensor(x2, requires_grad=True)]
    m(tx)  # triggers forward hook to record X
    want = m.relprop(torch.tensor(R), alpha=1)
    got = lrp.relprop_simple(jnp.matmul, (jnp.asarray(x1), jnp.asarray(x2)),
                             jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(got[0]), want[0].detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got[1]), want[1].detach().numpy(),
                               atol=1e-4)


@requires_reference
def test_add_relprop_parity(ref_layers):
    import torch

    x1 = rand(3, 6, seed=6)
    x2 = rand(3, 6, seed=7)
    R = np.abs(rand(3, 6, seed=8))
    m = ref_layers.Add()
    m([torch.tensor(x1, requires_grad=True),
       torch.tensor(x2, requires_grad=True)])
    want = m.relprop(torch.tensor(R), alpha=1)
    got = lrp.add_relprop(jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(got[0]), want[0].detach().numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[1]), want[1].detach().numpy(),
                               atol=1e-5)


@requires_reference
def test_clone_relprop_parity(ref_layers):
    import torch

    x = rand(3, 5, seed=9)
    R1, R2 = rand(3, 5, seed=10), rand(3, 5, seed=11)
    m = ref_layers.Clone()
    m(torch.tensor(x, requires_grad=True), 2)
    want = m.relprop([torch.tensor(R1), torch.tensor(R2)], alpha=1)
    got = lrp.clone_relprop(jnp.asarray(x),
                            [jnp.asarray(R1), jnp.asarray(R2)])
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=1e-5)


@requires_reference
@pytest.mark.parametrize("alpha", [1.0, 2.0])
def test_linear_alpha_beta_parity(ref_layers, alpha):
    import torch

    x = rand(3, 7, seed=12)
    R = rand(3, 4, seed=13)
    lin = ref_layers.Linear(7, 4)
    torch.manual_seed(5)
    lin.weight.data = torch.randn(4, 7)
    lin.bias.data = torch.randn(4)
    lin(torch.tensor(x, requires_grad=True))
    want = lin.relprop(torch.tensor(R), alpha=alpha).detach().numpy()
    got = lrp.linear_alpha_beta(
        jnp.asarray(R), jnp.asarray(x),
        jnp.asarray(lin.weight.detach().numpy().T), alpha=alpha)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@requires_reference
def test_linear_per_branch_variant():
    """layers_lrp.py's per-branch Linear rule (the BERT_orig_lrp copy)."""
    import torch

    ref = load_reference_module(
        "VisualBERT/mmf/models/transformers/backends/layers_lrp.py",
        "ref_layers_lrp_vb")
    x = rand(2, 6, seed=14)
    R = rand(2, 3, seed=15)
    lin = ref.Linear(6, 3)
    torch.manual_seed(6)
    lin.weight.data = torch.randn(3, 6)
    lin.bias.data = torch.randn(3)
    lin(torch.tensor(x, requires_grad=True))
    want = lin.relprop(torch.tensor(R), alpha=1).detach().numpy()
    got = lrp.linear_alpha_beta(
        jnp.asarray(R), jnp.asarray(x),
        jnp.asarray(lin.weight.detach().numpy().T), alpha=1.0,
        uniform=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@requires_reference
def test_index_select_relprop_parity(ref_layers):
    import torch

    x = rand(2, 5, 4, seed=16)
    idx = np.array([3], dtype=np.int64)
    R = rand(2, 1, 4, seed=17)
    m = ref_layers.IndexSelect()
    m(torch.tensor(x, requires_grad=True), 1, torch.tensor(idx))
    want = m.relprop(torch.tensor(R), alpha=1).detach().numpy()
    got = lrp.index_select_relprop(jnp.asarray(x), 1, jnp.asarray(idx),
                                   jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6)
