"""Pallas fused relevancy kernel vs the jnp scan (interpreter mode on
CPU; the real-TPU run is exercised by bench/drive scripts)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.ops import relevancy as rl
from transformer_mm_explainability_tpu.ops.relevancy_pallas import (
    self_attention_relevancy_pallas,
)


@pytest.mark.parametrize("S", [37, 128])
def test_kernel_matches_scan(S):
    B, L, H = 2, 3, 4
    rng = np.random.RandomState(0)
    cams = jnp.asarray(np.abs(rng.randn(B, L, H, S, S)).astype(np.float32))
    grads = jnp.asarray(rng.randn(B, L, H, S, S).astype(np.float32))
    want = jax.vmap(lambda a, g: rl.self_attention_relevancy(a, g))(cams, grads)
    got = self_attention_relevancy_pallas(cams, grads, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_start_layer():
    B, L, H, S = 1, 4, 2, 16
    rng = np.random.RandomState(1)
    cams = jnp.asarray(np.abs(rng.randn(B, L, H, S, S)).astype(np.float32))
    grads = jnp.asarray(rng.randn(B, L, H, S, S).astype(np.float32))
    want = jax.vmap(
        lambda a, g: rl.self_attention_relevancy(a, g, start_layer=2)
    )(cams, grads)
    got = self_attention_relevancy_pallas(cams, grads, start_layer=2,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
