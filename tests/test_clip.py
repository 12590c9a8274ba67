"""CLIP parity: JAX tower vs the reference's instrumented torch CLIP.

Instantiates the actual reference model (CLIP/clip/model.py) with random
weights on torch CPU, converts the state dict with utils/convert, and
checks logits and the notebook ``interpret`` relevancies end-to-end.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import REFERENCE, requires_reference

from transformer_mm_explainability_tpu.models import clip as jclip
from transformer_mm_explainability_tpu.explain import clip as explain_clip
from transformer_mm_explainability_tpu.utils import convert

# tiny CLIP for fast torch CPU execution
KW = dict(
    embed_dim=64,
    image_resolution=32,
    vision_layers=3,
    vision_width=128,
    vision_patch_size=8,
    context_length=13,
    vocab_size=100,
    transformer_width=64,
    transformer_heads=2,
    transformer_layers=3,
)


def _load_ref_clip_model_module():
    """Import reference CLIP/clip/model.py without the package __init__
    (which pulls PIL/torchvision/tqdm)."""
    import importlib.util
    import types

    pkg = types.ModuleType("refclip")
    pkg.__path__ = [str(REFERENCE / "CLIP" / "clip")]
    sys.modules.setdefault("refclip", pkg)
    for name in ("auxilary", "model"):
        spec = importlib.util.spec_from_file_location(
            f"refclip.{name}", str(REFERENCE / "CLIP" / "clip" / f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refclip.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refclip.model"]


@pytest.fixture(scope="module")
def ref_clip():
    import torch

    model_mod = _load_ref_clip_model_module()
    torch.manual_seed(0)
    model = model_mod.CLIP(**KW).float().eval()
    return model


@pytest.fixture(scope="module")
def jax_clip(ref_clip):
    params, cfg = convert.clip_from_state_dict(
        ref_clip.state_dict(), transformer_heads=KW["transformer_heads"]
    )
    assert cfg.vision_layers == KW["vision_layers"]
    assert cfg.embed_dim == KW["embed_dim"]
    assert cfg.context_length == KW["context_length"]
    return params, cfg


def make_inputs():
    rng = np.random.RandomState(7)
    image = rng.randn(32, 32, 3).astype(np.float32)
    tokens = np.zeros((2, 13), dtype=np.int64)
    for b in range(2):
        n = 5 + b
        tokens[b, 0] = 1
        tokens[b, 1:n] = rng.randint(2, 98, size=n - 1)
        tokens[b, n] = 99  # EOT = highest id → argmax pooling picks it
    return image, tokens


@requires_reference
def test_logits_parity(ref_clip, jax_clip):
    import torch

    params, cfg = jax_clip
    image, tokens = make_inputs()
    # no torch.no_grad(): the reference registers backward hooks on the
    # attention probs unconditionally, which needs grad mode
    timg = torch.tensor(image).permute(2, 0, 1)[None].repeat(2, 1, 1, 1)
    want_i, want_t = (t.detach() for t in ref_clip(timg, torch.tensor(tokens)))
    images = jnp.broadcast_to(jnp.asarray(image)[None], (2, 32, 32, 3))
    got_i, got_t, _ = jclip.forward(params, images, jnp.asarray(tokens), cfg)
    np.testing.assert_allclose(np.asarray(got_i), want_i.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.numpy(), atol=1e-4)


def _torch_interpret(model, image, tokens, start_layer, start_layer_text):
    """The notebook's interpret() loop run against the reference model
    (CLIP_explainability.ipynb cell 6), reproduced as test oracle."""
    import torch

    B = tokens.shape[0]
    timg = torch.tensor(image).permute(2, 0, 1)[None].repeat(B, 1, 1, 1)
    logits_per_image, _ = model(timg, torch.tensor(tokens))
    one_hot = logits_per_image.diagonal().sum()
    model.zero_grad()

    def chain(blocks, start):
        S = blocks[0].attn_probs.shape[-1]
        R = torch.eye(S).unsqueeze(0).repeat(B, 1, 1)
        for i, blk in enumerate(blocks):
            if i < start:
                continue
            grad = torch.autograd.grad(one_hot, [blk.attn_probs],
                                       retain_graph=True)[0].detach()
            cam = blk.attn_probs.detach()
            cam = cam.reshape(B, -1, S, S)
            grad = grad.reshape(B, -1, S, S)
            e = (grad * cam).clamp(min=0).mean(1)
            R = R + torch.bmm(e, R)
        return R

    img_blocks = list(model.visual.transformer.resblocks)
    txt_blocks = list(model.transformer.resblocks)
    R_img = chain(img_blocks, start_layer)
    R_txt = chain(txt_blocks, start_layer_text)
    return R_txt.numpy(), R_img[:, 0, 1:].numpy()


@requires_reference
@pytest.mark.parametrize("start_layer,start_layer_text", [(-1, -1), (0, 0)])
def test_interpret_parity(ref_clip, jax_clip, start_layer, start_layer_text):
    params, cfg = jax_clip
    image, tokens = make_inputs()
    sl = cfg.vision_layers - 1 if start_layer == -1 else start_layer
    slt = cfg.transformer_layers - 1 if start_layer_text == -1 else start_layer_text
    want_txt, want_img = _torch_interpret(ref_clip, image, tokens, sl, slt)
    got_txt, got_img, _ = explain_clip.interpret(
        params, jnp.asarray(image), jnp.asarray(tokens), cfg,
        start_layer=start_layer, start_layer_text=start_layer_text,
    )
    np.testing.assert_allclose(np.asarray(got_img), want_img, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_txt), want_txt, atol=1e-4)


def test_text_token_relevance_masking(jax_clip):
    params, cfg = jax_clip
    image, tokens = make_inputs()
    R_txt, _, _ = explain_clip.interpret(
        params, jnp.asarray(image), jnp.asarray(tokens), cfg
    )
    rows = explain_clip.text_token_relevance(R_txt, jnp.asarray(tokens))
    rows = np.asarray(rows)
    eots = tokens.argmax(-1)
    for b in range(2):
        assert rows[b, 0] == 0.0
        assert (rows[b, eots[b]:] == 0.0).all()
        assert (rows[b, 1:eots[b]] != 0.0).any()
