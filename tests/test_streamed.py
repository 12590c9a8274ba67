"""Streamed relevancy == stacked relevancy (memory-optimised path)."""

import numpy as np
import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import vit

CFG = vit.ViTConfig(image_size=32, patch_size=8, width=64, depth=3,
                    num_heads=4, mlp_ratio=2, num_classes=10)


def test_streamed_equals_stacked():
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(3, 32, 32, 3).astype(np.float32))
    targets = jnp.asarray([1, 7, 0])
    a = vit.relevancy(params, images, targets, CFG)
    b = vit.relevancy_streamed(params, images, targets, CFG)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_streamed_row_equals_stacked():
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    targets = jnp.asarray([3, 9])
    a = vit.relevancy(params, images, targets, CFG)
    b = vit.relevancy_streamed_row(params, images, targets, CFG)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)


def test_streamed_jits():
    params = vit.init_params(jax.random.PRNGKey(1), CFG)
    f = jax.jit(lambda p, im, tg: vit.relevancy_streamed(p, im, tg, CFG))
    out = f(params, jnp.zeros((2, 32, 32, 3)), jnp.zeros((2,), jnp.int32))
    assert out.shape == (2, CFG.seq_len - 1)
    assert np.isfinite(np.asarray(out)).all()


def test_remat_equals_plain():
    params = vit.init_params(jax.random.PRNGKey(2), CFG)
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    targets = jnp.asarray([0, 5])
    a = vit.relevancy(params, images, targets, CFG, remat=False)
    b = vit.relevancy(params, images, targets, CFG, remat=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
