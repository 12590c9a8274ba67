"""ViT-B end-to-end cross-check: JAX functional-tap capture vs a
hook-based torch implementation of the same architecture.

This validates the core architectural inversion (SURVEY.md §7.1): that
one jitted fwd+bwd w.r.t. additive attention taps reproduces, to <1e-4,
the attention gradients and relevancy maps that the PyTorch reference
collects with ``attention_probs.register_hook`` (ViT notebook cell 7).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.models import vit
from transformer_mm_explainability_tpu.ops import relevancy as rl

CFG = vit.ViTConfig(
    image_size=32, patch_size=8, width=64, depth=3, num_heads=4,
    mlp_ratio=2, num_classes=10,
)


@pytest.fixture(scope="module")
def params():
    return vit.init_params(jax.random.PRNGKey(0), CFG)


def build_torch_twin(params, cfg):
    """Torch ViT with identical math + hook-based attention capture,
    the way the reference instruments models."""
    import torch
    import torch.nn as nn

    t = lambda x: torch.tensor(np.asarray(x, dtype=np.float32))

    class Block(nn.Module):
        def __init__(self, i):
            super().__init__()
            b = params["blocks"]
            self.ln1_w, self.ln1_b = t(b["ln1"]["scale"][i]), t(b["ln1"]["bias"][i])
            self.ln2_w, self.ln2_b = t(b["ln2"]["scale"][i]), t(b["ln2"]["bias"][i])
            self.w_qkv, self.b_qkv = t(b["attn"].w_qkv[i]), t(b["attn"].b_qkv[i])
            self.w_out, self.b_out = t(b["attn"].w_out[i]), t(b["attn"].b_out[i])
            self.w1, self.b1 = t(b["mlp"]["w1"][i]), t(b["mlp"]["b1"][i])
            self.w2, self.b2 = t(b["mlp"]["w2"][i]), t(b["mlp"]["b2"][i])
            self.attn_probs = None
            self.attn_grad = None

        def forward(self, x):
            import torch.nn.functional as F

            h = F.layer_norm(x, (cfg.width,), self.ln1_w, self.ln1_b, cfg.ln_eps)
            B, S, D = h.shape
            H = cfg.num_heads
            qkv = h @ self.w_qkv + self.b_qkv
            q, k, v = qkv.chunk(3, dim=-1)
            q = q.reshape(B, S, H, D // H).permute(0, 2, 1, 3)
            k = k.reshape(B, S, H, D // H).permute(0, 2, 1, 3)
            v = v.reshape(B, S, H, D // H).permute(0, 2, 1, 3)
            probs = ((q @ k.transpose(-2, -1)) * (D // H) ** -0.5).softmax(-1)
            self.attn_probs = probs
            probs.register_hook(lambda g: setattr(self, "attn_grad", g))
            o = (probs @ v).permute(0, 2, 1, 3).reshape(B, S, D)
            x = x + o @ self.w_out + self.b_out
            h = F.layer_norm(x, (cfg.width,), self.ln2_w, self.ln2_b, cfg.ln_eps)
            h = F.gelu(h @ self.w1 + self.b1) @ self.w2 + self.b2
            return x + h

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.ModuleList([Block(i) for i in range(cfg.depth)])
            self.pe_w = t(params["patch_embed"]["w"])
            self.pe_b = t(params["patch_embed"]["b"])
            self.cls = t(params["cls_token"])
            self.pos = t(params["pos_embed"])
            self.n_w, self.n_b = t(params["norm"]["scale"]), t(params["norm"]["bias"])
            self.h_w, self.h_b = t(params["head"]["w"]), t(params["head"]["b"])

        def forward(self, images):
            import torch
            import torch.nn.functional as F

            B, Hh, W, C = images.shape
            P = cfg.patch_size
            x = images.reshape(B, Hh // P, P, W // P, P, C)
            x = x.permute(0, 1, 3, 2, 4, 5).reshape(B, -1, P * P * C)
            x = x @ self.pe_w + self.pe_b
            x = torch.cat([self.cls.expand(B, 1, cfg.width), x], 1) + self.pos
            for blk in self.blocks:
                x = blk(x)
            x = F.layer_norm(x, (cfg.width,), self.n_w, self.n_b, cfg.ln_eps)
            return x[:, 0] @ self.h_w + self.h_b

    return Twin()


@pytest.fixture(scope="module")
def torch_state(params):
    import torch

    rng = np.random.RandomState(42)
    images = rng.randn(2, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    twin = build_torch_twin(params, CFG)
    timg = torch.tensor(images, requires_grad=True)
    logits = twin(timg)
    targets = logits.argmax(-1).detach()
    score = logits.gather(1, targets[:, None]).sum()
    score.backward(retain_graph=True)
    return images, twin, logits, targets


def test_logits_parity(params, torch_state):
    images, twin, tlogits, _ = torch_state
    logits, _ = vit.forward(params, jnp.asarray(images), CFG)
    np.testing.assert_allclose(
        np.asarray(logits), tlogits.detach().numpy(), atol=1e-4
    )


def test_attention_capture_parity(params, torch_state):
    """A and ∇A from the functional tap == torch hook captures."""
    images, twin, _, targets = torch_state
    _, attn, grads = vit.capture(
        params, jnp.asarray(images), jnp.asarray(targets.numpy()), CFG
    )
    for i, blk in enumerate(twin.blocks):
        np.testing.assert_allclose(
            np.asarray(attn[i]), blk.attn_probs.detach().numpy(), atol=1e-4,
            err_msg=f"attn probs layer {i}",
        )
        np.testing.assert_allclose(
            np.asarray(grads[i]), blk.attn_grad.numpy(), atol=1e-4,
            err_msg=f"attn grads layer {i}",
        )


def test_relevancy_parity(params, torch_state):
    """Full generate_relevance chain matches the hook-based loop."""
    import torch

    images, twin, _, targets = torch_state
    got = vit.relevancy(params, jnp.asarray(images), jnp.asarray(targets.numpy()), CFG)

    S = CFG.seq_len
    for b in range(2):
        R = torch.eye(S)
        for blk in twin.blocks:
            cam = blk.attn_probs[b].detach()
            grad = blk.attn_grad[b].detach()
            e = (grad * cam).clamp(min=0).mean(0)
            R = R + e @ R
        want = R[0, 1:].numpy()
        np.testing.assert_allclose(np.asarray(got[b]), want, atol=1e-4)


def test_relevancy_jits_and_batches(params):
    f = jax.jit(lambda im, tg: vit.relevancy(params, im, tg, CFG))
    images = jnp.zeros((4, CFG.image_size, CFG.image_size, 3))
    out = f(images, jnp.zeros((4,), jnp.int32))
    assert out.shape == (4, CFG.seq_len - 1)
    assert np.isfinite(np.asarray(out)).all()
