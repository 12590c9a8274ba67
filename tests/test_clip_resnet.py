"""CLIP ModifiedResNet parity vs the reference implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import requires_reference

from transformer_mm_explainability_tpu.models import clip_resnet

from test_clip import _load_ref_clip_model_module


@requires_reference
def test_modified_resnet_parity():
    import torch

    mm = _load_ref_clip_model_module()
    torch.manual_seed(3)
    # tiny RN: layers (1,1,1,1), width 16, heads 2, 32px input
    ref = mm.ModifiedResNet(layers=(1, 1, 1, 1), output_dim=24, heads=2,
                            input_resolution=32, width=16).float().eval()
    sd = {f"visual.{k}": v for k, v in ref.state_dict().items()}
    params = clip_resnet.from_state_dict(sd)

    rng = np.random.RandomState(5)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(clip_resnet.forward(params, jnp.asarray(x), num_heads=2))
    np.testing.assert_allclose(got, want, atol=2e-4)
