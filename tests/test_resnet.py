"""ResNet backbone numerics vs torch functional ops + converter mapping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.models import resnet as jres
from transformer_mm_explainability_tpu.utils import convert


def test_conv_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11, 5).astype(np.float32)       # NHWC
    w = rng.randn(3, 3, 5, 7).astype(np.float32)        # HWIO
    for stride, dil in ((1, 1), (2, 1), (1, 2)):
        got = np.asarray(jres.conv(jnp.asarray(x), jnp.asarray(w),
                                   stride=stride, dilation=dil))
        tw = torch.tensor(w.transpose(3, 2, 0, 1))       # OIHW
        tx = torch.tensor(x.transpose(0, 3, 1, 2))       # NCHW
        want = F.conv2d(tx, tw, stride=stride, padding=dil, dilation=dil)
        want = want.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, atol=2e-4,
                                   err_msg=f"s={stride} d={dil}")


def test_maxpool_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(1, 12, 14, 3).astype(np.float32)
    got = np.asarray(jres.max_pool_3x3_s2(jnp.asarray(x)))
    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    want = F.max_pool2d(tx, 3, 2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bottleneck_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    cin, mid = 8, 4
    x = rng.randn(1, 10, 10, cin).astype(np.float32)

    def bn_params(n, seed):
        r = np.random.RandomState(seed)
        return {
            "weight": r.rand(n).astype(np.float32) + 0.5,
            "bias": r.randn(n).astype(np.float32) * 0.1,
            "mean": r.randn(n).astype(np.float32) * 0.1,
            "var": r.rand(n).astype(np.float32) + 0.5,
        }

    p = {
        "conv1": {"w": rng.randn(1, 1, cin, mid).astype(np.float32) * 0.2},
        "bn1": bn_params(mid, 3),
        "conv2": {"w": rng.randn(3, 3, mid, mid).astype(np.float32) * 0.2},
        "bn2": bn_params(mid, 4),
        "conv3": {"w": rng.randn(1, 1, mid, mid * 4).astype(np.float32) * 0.2},
        "bn3": bn_params(mid * 4, 5),
        "downsample": {"w": rng.randn(1, 1, cin, mid * 4).astype(np.float32) * 0.2},
        "downsample_bn": bn_params(mid * 4, 6),
    }
    jp = jax.tree.map(jnp.asarray, p)
    got = np.asarray(jres.bottleneck(jnp.asarray(x), jp, stride=2))

    def t_fbn(tx, bp):
        w = torch.tensor(bp["weight"])
        b = torch.tensor(bp["bias"])
        m = torch.tensor(bp["mean"])
        v = torch.tensor(bp["var"])
        scale = w * (v + 1e-5).rsqrt()
        return tx * scale[None, :, None, None] + (b - m * scale)[None, :, None, None]

    tx = torch.tensor(x.transpose(0, 3, 1, 2))
    tconv = lambda t, w, s=1: F.conv2d(
        t, torch.tensor(np.transpose(w, (3, 2, 0, 1))), stride=s,
        padding=(w.shape[0] - 1) // 2)
    out = F.relu(t_fbn(tconv(tx, p["conv1"]["w"]), p["bn1"]))
    out = F.relu(t_fbn(tconv(out, p["conv2"]["w"], 2), p["bn2"]))
    out = t_fbn(tconv(out, p["conv3"]["w"]), p["bn3"])
    ident = t_fbn(tconv(tx, p["downsample"]["w"], 2), p["downsample_bn"])
    want = F.relu(out + ident).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_detr_converter_roundtrip():
    """Synthesize a torch-layout DETR state dict from random tensors,
    convert, and check the forward runs + key mapping lands."""
    import torch

    from transformer_mm_explainability_tpu.models import detr as jdetr

    cfg = jdetr.DETRConfig(num_classes=7, num_queries=5, d_model=32,
                           nheads=4, num_encoder_layers=2,
                           num_decoder_layers=2, dim_feedforward=64,
                           backbone_channels=2048)
    torch.manual_seed(0)
    sd = {}

    def lin(prefix, din, dout):
        sd[f"{prefix}.weight"] = torch.randn(dout, din) * 0.05
        sd[f"{prefix}.bias"] = torch.zeros(dout)

    def lnp(prefix, d):
        sd[f"{prefix}.weight"] = torch.ones(d)
        sd[f"{prefix}.bias"] = torch.zeros(d)

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = torch.ones(n)
        sd[f"{prefix}.bias"] = torch.zeros(n)
        sd[f"{prefix}.running_mean"] = torch.zeros(n)
        sd[f"{prefix}.running_var"] = torch.ones(n)

    # torchvision resnet50 naming under backbone.0.body.
    pre = "backbone.0.body."
    sd[f"{pre}conv1.weight"] = torch.randn(64, 3, 7, 7) * 0.05
    bn(f"{pre}bn1", 64)
    in_ch = 64
    for si, nb in enumerate((3, 4, 6, 3)):
        mid = 64 * 2 ** si
        for bi in range(nb):
            p = f"{pre}layer{si+1}.{bi}"
            sd[f"{p}.conv1.weight"] = torch.randn(mid, in_ch, 1, 1) * 0.05
            bn(f"{p}.bn1", mid)
            sd[f"{p}.conv2.weight"] = torch.randn(mid, mid, 3, 3) * 0.05
            bn(f"{p}.bn2", mid)
            sd[f"{p}.conv3.weight"] = torch.randn(mid * 4, mid, 1, 1) * 0.05
            bn(f"{p}.bn3", mid * 4)
            if bi == 0:
                sd[f"{p}.downsample.0.weight"] = \
                    torch.randn(mid * 4, in_ch, 1, 1) * 0.05
                bn(f"{p}.downsample.1", mid * 4)
            in_ch = mid * 4

    D = cfg.d_model
    for i in range(2):
        p = f"transformer.encoder.layers.{i}"
        sd[f"{p}.self_attn.in_proj_weight"] = torch.randn(3 * D, D) * 0.05
        sd[f"{p}.self_attn.in_proj_bias"] = torch.zeros(3 * D)
        lin(f"{p}.self_attn.out_proj", D, D)
        lnp(f"{p}.norm1", D), lnp(f"{p}.norm2", D)
        lin(f"{p}.linear1", D, 64), lin(f"{p}.linear2", 64, D)
        p = f"transformer.decoder.layers.{i}"
        for att in ("self_attn", "multihead_attn"):
            sd[f"{p}.{att}.in_proj_weight"] = torch.randn(3 * D, D) * 0.05
            sd[f"{p}.{att}.in_proj_bias"] = torch.zeros(3 * D)
            lin(f"{p}.{att}.out_proj", D, D)
        for n in ("norm1", "norm2", "norm3"):
            lnp(f"{p}.{n}", D)
        lin(f"{p}.linear1", D, 64), lin(f"{p}.linear2", 64, D)
    lnp("transformer.decoder.norm", D)
    lin("class_embed", D, cfg.num_classes + 1)
    lin("bbox_embed.layers.0", D, D)
    lin("bbox_embed.layers.1", D, D)
    lin("bbox_embed.layers.2", D, 4)
    sd["query_embed.weight"] = torch.randn(cfg.num_queries, D)
    sd["input_proj.weight"] = torch.randn(D, 2048, 1, 1) * 0.02
    sd["input_proj.bias"] = torch.zeros(D)

    params = convert.detr_from_state_dict(sd, cfg)
    img = jnp.asarray(np.random.RandomState(1)
                      .randn(1, 64, 64, 3).astype(np.float32))
    out = jdetr.forward(params, img, cfg=cfg)
    assert out["pred_logits"].shape == (1, 5, 8)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
