"""Full RN-CLIP parity: reference CLIP(RN tower) vs ours end-to-end."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import requires_reference

from transformer_mm_explainability_tpu.models import clip as jclip
from transformer_mm_explainability_tpu.utils import convert

from test_clip import _load_ref_clip_model_module, make_inputs


@requires_reference
def test_rn_clip_logits_parity():
    import torch

    mm = _load_ref_clip_model_module()
    torch.manual_seed(9)
    ref = mm.CLIP(
        embed_dim=24,
        image_resolution=64,           # 64/32 = 2 → attnpool 2x2 grid
        vision_layers=(1, 1, 1, 1),
        vision_width=16,
        vision_patch_size=None,
        context_length=13,
        vocab_size=100,
        transformer_width=64,
        transformer_heads=2,
        transformer_layers=2,
    ).float().eval()
    params, cfg = convert.clip_from_state_dict(
        ref.state_dict(), transformer_heads=2)
    assert cfg.is_resnet
    assert cfg.vision_layers == (1, 1, 1, 1)

    rng = np.random.RandomState(7)
    image = rng.randn(64, 64, 3).astype(np.float32)
    tokens = np.zeros((2, 13), dtype=np.int64)
    for b in range(2):
        tokens[b, 0] = 1
        tokens[b, 1:5] = rng.randint(2, 98, 4)
        tokens[b, 5] = 99
    timg = torch.tensor(image).permute(2, 0, 1)[None].repeat(2, 1, 1, 1)
    want_i, want_t = (t.detach() for t in ref(timg, torch.tensor(tokens)))
    images = jnp.broadcast_to(jnp.asarray(image)[None], (2, 64, 64, 3))
    got_i, got_t, _ = jclip.forward(params, images, jnp.asarray(tokens), cfg)
    np.testing.assert_allclose(np.asarray(got_i), want_i.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=2e-4)
