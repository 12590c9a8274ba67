"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from transformer_mm_explainability_tpu.models import vit
from transformer_mm_explainability_tpu.parallel import mesh as pmesh
from transformer_mm_explainability_tpu.train import steps

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = vit.ViTConfig(image_size=32, patch_size=8, width=64, depth=2,
                    num_heads=4, mlp_ratio=4, num_classes=16)


def make_batch(B):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.randn(B, 32, 32, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 16, (B,))),
    }


def test_mesh_factorisation():
    mesh = pmesh.make_mesh(jax.devices())
    assert mesh.shape["dp"] * mesh.shape["tp"] == 8
    assert mesh.shape["tp"] > 1 and mesh.shape["dp"] > 1


def test_sharded_train_step_matches_single_device():
    """The dp×tp sharded step computes the same loss/params as an
    unsharded one — sharding is layout, not math."""
    mesh = pmesh.make_mesh(jax.devices())
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    tx = steps.make_adamw(1e-3)

    def loss_fn(p, batch):
        logits, _ = vit.forward(p, batch["images"], CFG)
        return steps.softmax_xent(logits, batch["labels"])

    step = steps.make_train_step(loss_fn, tx)
    batch = make_batch(8)

    state0 = steps.init_state(params, tx)
    state_ref, loss_ref = jax.jit(step)(state0, batch)

    sharded = steps.init_state(pmesh.shard_params(params, mesh), tx)
    sbatch = pmesh.shard_batch(batch, mesh)
    with mesh:
        state_sh, loss_sh = jax.jit(step)(sharded, sbatch)

    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)
    ref_leaf = np.asarray(state_ref.params["blocks"]["attn"].w_qkv)
    sh_leaf = np.asarray(state_sh.params["blocks"]["attn"].w_qkv)
    np.testing.assert_allclose(sh_leaf, ref_leaf, atol=1e-5)


def test_sharded_relevancy():
    """Batched relevancy over a dp-sharded batch."""
    mesh = pmesh.make_mesh(jax.devices())
    params = pmesh.shard_params(vit.init_params(jax.random.PRNGKey(0), CFG), mesh)
    batch = make_batch(8)
    images = pmesh.shard_batch({"x": batch["images"]}, mesh)["x"]
    with mesh:
        out = jax.jit(
            lambda p, im, tg: vit.relevancy(p, im, tg, CFG)
        )(params, images, jnp.zeros((8,), jnp.int32))
    assert out.shape == (8, CFG.seq_len - 1)
    assert np.isfinite(np.asarray(out)).all()


def test_param_sharding_layout():
    mesh = pmesh.make_mesh(jax.devices())
    params = pmesh.shard_params(vit.init_params(jax.random.PRNGKey(0), CFG), mesh)
    qkv = params["blocks"]["attn"].w_qkv
    spec = qkv.sharding.spec
    assert spec[-1] == "tp"  # column-parallel qkv
    w2 = params["blocks"]["mlp"]["w2"]
    assert w2.sharding.spec[1] == "tp"  # row-parallel mlp out


def test_sharded_streamed_relevancy():
    """The streamed (row) relevancy path works over a dp-sharded batch."""
    mesh = pmesh.make_mesh(jax.devices())
    params = pmesh.shard_params(vit.init_params(jax.random.PRNGKey(0), CFG),
                                mesh)
    batch = make_batch(8)
    images = pmesh.shard_batch({"x": batch["images"]}, mesh)["x"]
    with mesh:
        out = jax.jit(
            lambda p, im, tg: vit.relevancy_streamed_row(p, im, tg, CFG)
        )(params, images, jnp.zeros((8,), jnp.int32))
    assert out.shape == (8, CFG.seq_len - 1)
    ref = vit.relevancy(vit.init_params(jax.random.PRNGKey(0), CFG),
                        batch["images"], jnp.zeros((8,), jnp.int32), CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dp_shard_map_fused_relevancy():
    """The fused-Pallas flagship path under REAL dp sharding.

    Mosaic custom calls have no SPMD partitioning rule, so the fused
    path must go through ``dp_shard_map`` (per-shard local shapes) on a
    multi-chip mesh — here with interpret-mode kernels on the CPU mesh;
    the compiled kernel is chip-validated by tools/chip_check.py."""
    mesh = pmesh.make_mesh(jax.devices())
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(8)
    targets = jnp.zeros((8,), jnp.int32)

    fn = lambda p, im, tg: vit.relevancy_fused(p, im, tg, CFG,
                                               interpret=True)
    ref = np.asarray(jax.jit(fn)(params, batch["images"], targets))

    sharded_fn = jax.jit(pmesh.dp_shard_map(fn, mesh, batch_argnums=(1, 2)))
    rep = pmesh.replicated(params, mesh)
    images = pmesh.shard_batch({"x": batch["images"]}, mesh)["x"]
    tg = pmesh.shard_batch({"t": targets}, mesh)["t"]
    with mesh:
        out = np.asarray(sharded_fn(rep, images, tg))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_dp_shard_map_fused_block_relevancy():
    """The layer-granular kernel path (relevancy_fused_block) under the
    same dp_shard_map pattern as the flash-kernel path above."""
    mesh = pmesh.make_mesh(jax.devices())
    params = vit.init_params(jax.random.PRNGKey(0), CFG)
    batch = make_batch(8)
    targets = jnp.zeros((8,), jnp.int32)

    fn = lambda p, im, tg: vit.relevancy_fused_block(p, im, tg, CFG,
                                                     interpret=True)
    ref = np.asarray(jax.jit(fn)(params, batch["images"], targets))

    sharded_fn = jax.jit(pmesh.dp_shard_map(fn, mesh, batch_argnums=(1, 2)))
    rep = pmesh.replicated(params, mesh)
    images = pmesh.shard_batch({"x": batch["images"]}, mesh)["x"]
    tg = pmesh.shard_batch({"t": targets}, mesh)["t"]
    with mesh:
        out = np.asarray(sharded_fn(rep, images, tg))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("S,start_layer", [(16, 0), (37, 0), (37, 2)])
def test_sp_self_attention_relevancy(S, start_layer):
    """Sequence-parallel chain == the single-device scan, including a
    seq length not divisible by the mesh axis (padding is exact)."""
    from transformer_mm_explainability_tpu.ops import relevancy as rl
    from transformer_mm_explainability_tpu.parallel import sp

    mesh = pmesh.make_mesh(jax.devices())
    rng = np.random.RandomState(0)
    L, H = 4, 3
    cams = jnp.asarray(np.abs(rng.randn(L, H, S, S)).astype(np.float32))
    grads = jnp.asarray(rng.randn(L, H, S, S).astype(np.float32))

    ref = np.asarray(jax.jit(
        lambda c, g: rl.self_attention_relevancy(c, g, start_layer))(
            cams, grads))
    out = np.asarray(jax.jit(
        lambda c, g: sp.sp_self_attention_relevancy(
            c, g, mesh, axis="tp", start_layer=start_layer))(cams, grads))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("normalize", [True, False])
def test_sp_rollout_attention(normalize):
    from transformer_mm_explainability_tpu.ops import relevancy as rl
    from transformer_mm_explainability_tpu.parallel import sp

    mesh = pmesh.make_mesh(jax.devices())
    rng = np.random.RandomState(1)
    L, S = 5, 23
    mats = jnp.asarray(np.abs(rng.randn(L, S, S)).astype(np.float32))

    ref = np.asarray(jax.jit(
        lambda m: rl.compute_rollout_attention(m, 1, normalize))(mats))
    out = np.asarray(jax.jit(
        lambda m: sp.sp_rollout_attention(
            m, mesh, axis="tp", start_layer=1, normalize=normalize))(mats))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("aggregate", [True, False])
def test_sp_self_attention_update(aggregate):
    """SP rules 6+7 (the DETR big-S carry) == the single-device scan,
    with a seq length not divisible by the mesh axis."""
    from transformer_mm_explainability_tpu.ops import relevancy as rl
    from transformer_mm_explainability_tpu.parallel import sp

    mesh = pmesh.make_mesh(jax.devices())
    rng = np.random.RandomState(2)
    L, H, S, Q = 3, 2, 19, 7
    cams = jnp.asarray(np.abs(rng.randn(L, H, S, S)).astype(np.float32))
    grads = jnp.asarray(rng.randn(L, H, S, S).astype(np.float32))
    R_ss = jnp.asarray(np.eye(S, dtype=np.float32))
    R_sq = jnp.asarray(rng.rand(S, Q).astype(np.float32))

    ref_ss, ref_sq = jax.jit(
        lambda a, b, c, g: rl.self_attention_relevancy_update(
            a, b, c, g, aggregate=aggregate))(R_ss, R_sq, cams, grads)
    out_ss, out_sq = jax.jit(
        lambda a, b, c, g: sp.sp_self_attention_update(
            a, b, c, g, mesh, axis="tp", aggregate=aggregate))(
            R_ss, R_sq, cams, grads)
    np.testing.assert_allclose(np.asarray(out_ss), np.asarray(ref_ss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_sq), np.asarray(ref_sq),
                               rtol=1e-5, atol=1e-6)


def test_sp_self_attention_update_bf16_capture():
    """bf16 captures: sharded == single-device holds because BOTH paths
    cast cams/grads (and the carries) to fp32 before forming Ê."""
    from transformer_mm_explainability_tpu.ops import relevancy as rl
    from transformer_mm_explainability_tpu.parallel import sp

    mesh = pmesh.make_mesh(jax.devices())
    rng = np.random.RandomState(3)
    L, H, S, Q = 3, 2, 21, 5
    cams = jnp.asarray(np.abs(rng.randn(L, H, S, S))).astype(jnp.bfloat16)
    grads = jnp.asarray(rng.randn(L, H, S, S)).astype(jnp.bfloat16)
    R_ss = jnp.eye(S, dtype=jnp.bfloat16)
    R_sq = jnp.asarray(rng.rand(S, Q)).astype(jnp.bfloat16)

    ref_ss, ref_sq = jax.jit(rl.self_attention_relevancy_update)(
        R_ss, R_sq, cams, grads)
    out_ss, out_sq = jax.jit(
        lambda a, b, c, g: sp.sp_self_attention_update(
            a, b, c, g, mesh, axis="tp"))(R_ss, R_sq, cams, grads)
    assert ref_ss.dtype == jnp.float32 and out_ss.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_ss), np.asarray(ref_ss),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_sq), np.asarray(ref_sq),
                               rtol=1e-5, atol=1e-6)


def _detr_taps(seed, K, Le, Ld, H, S, Q, dtype=np.float32):
    rng = np.random.RandomState(seed)
    mk = lambda *shape: jnp.asarray(rng.randn(*shape).astype(dtype))
    mkp = lambda *shape: jnp.asarray(
        np.abs(rng.randn(*shape)).astype(dtype))
    return ((mkp(K, Le, H, S, S), mk(K, Le, H, S, S)),
            (mkp(K, Ld, H, Q, Q), mk(K, Ld, H, Q, Q)),
            (mkp(K, Ld, H, Q, S), mk(K, Ld, H, Q, S)))


@pytest.mark.parametrize("normalize,self10,aggregate", [
    (True, True, True),       # ours_no_lrp
    (False, True, True),      # ours_no_lrp_no_norm
    (True, False, True),      # ablation_no_self_in_10
    (False, True, False),     # ablation_no_aggregation
])
def test_sp_detr_relevancy(normalize, self10, aggregate):
    """The full sharded DETR encoder→decoder propagation equals the
    single-device explain.detr.relevancy_from_capture for every 'ours'
    method variant, at an S not divisible by the mesh axis."""
    from transformer_mm_explainability_tpu.explain import detr as expl
    from transformer_mm_explainability_tpu.models.detr import DETRTaps
    from transformer_mm_explainability_tpu.parallel import sp

    mesh = pmesh.make_mesh(jax.devices())
    K, Le, Ld, H, S, Q = 2, 3, 2, 2, 19, 5
    (ec, eg), (dsc, dsg), (dxc, dxg) = _detr_taps(5, K, Le, Ld, H, S, Q)
    tv = jnp.asarray(
        np.r_[np.ones(S - 3), np.zeros(3)].astype(np.float32))

    def ref_one(a, g):
        return expl.relevancy_from_capture(
            a, g, normalize_self_attention=normalize,
            apply_self_in_rule_10=self10, aggregate=aggregate,
            token_valid=tv)

    ref = np.asarray(jax.vmap(ref_one)(
        DETRTaps(ec, dsc, dxc), DETRTaps(eg, dsg, dxg)))
    out = np.asarray(jax.jit(
        lambda *t: sp.sp_detr_relevancy(
            *t, mesh=mesh, axis="tp",
            normalize_self_attention=normalize,
            apply_self_in_rule_10=self10, aggregate=aggregate,
            token_valid=tv))(ec, eg, dsc, dsg, dxc, dxg))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_generate_ours_sp_end_to_end():
    """explain.detr.generate_ours(mesh=...) == the unsharded generator
    through the real capture path (tiny DETR, random weights)."""
    from transformer_mm_explainability_tpu.explain import detr as expl
    from transformer_mm_explainability_tpu.models import detr as detr_model

    mesh = pmesh.make_mesh(jax.devices())
    cfg = detr_model.DETRConfig(
        num_classes=7, num_queries=6, d_model=32, nheads=4,
        num_encoder_layers=2, num_decoder_layers=2, dim_feedforward=64)
    params = detr_model.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.randn(64, 96, 3).astype(np.float32))
    tq = jnp.asarray([0, 3], jnp.int32)
    tc = jnp.asarray([1, 2], jnp.int32)

    # no_norm variant: nonzero on random weights (the normalized chain
    # is parity-faithfully all-zero here — eq. 8+9's 0/0 NaN on a random
    # R_qq row triggers the reference's nan→0 wipe of every rule-10 add)
    ref = np.asarray(expl.generate_ours(params, image, tq, tc, cfg,
                                        normalize_self_attention=False))
    assert np.abs(ref).sum() > 1e-4, "vacuous test: reference map is zero"
    with mesh:
        out = np.asarray(expl.generate_ours(
            params, image, tq, tc, cfg, normalize_self_attention=False,
            mesh=mesh, sp_axis="tp"))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)

    # normalized variant: pins that the sharded chain reproduces the
    # NaN-wipe semantics exactly (both sides zero on these weights)
    ref_n = np.asarray(expl.generate_ours(params, image, tq, tc, cfg))
    with mesh:
        out_n = np.asarray(expl.generate_ours(params, image, tq, tc, cfg,
                                              mesh=mesh, sp_axis="tp"))
    np.testing.assert_allclose(out_n, ref_n, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_sp_update_detr_protocol_scale():
    """The shape that motivated sp.py: DETR encoder accumulation at
    S≈1900 (800px → 25×76 feature map), L=6
    (DETR/modules/ExplanationGenerator.py:176). Sharded == single-device
    at protocol scale, with S not divisible by the mesh axis."""
    from transformer_mm_explainability_tpu.ops import relevancy as rl
    from transformer_mm_explainability_tpu.parallel import sp

    mesh = pmesh.make_mesh(jax.devices())
    rng = np.random.RandomState(4)
    L, H, S, Q = 6, 2, 1900, 100
    cams = jnp.asarray(np.abs(rng.randn(L, H, S, S)).astype(np.float32))
    grads = jnp.asarray(rng.randn(L, H, S, S).astype(np.float32))
    R_ss = jnp.eye(S, dtype=jnp.float32)
    R_sq = jnp.zeros((S, Q), jnp.float32)

    ref_ss, _ = jax.jit(rl.self_attention_relevancy_update)(
        R_ss, R_sq, cams, grads)
    out_ss, _ = jax.jit(
        lambda a, b, c, g: sp.sp_self_attention_update(
            a, b, c, g, mesh, axis="tp"))(R_ss, R_sq, cams, grads)
    np.testing.assert_allclose(np.asarray(out_ss), np.asarray(ref_ss),
                               rtol=1e-5, atol=1e-5)
