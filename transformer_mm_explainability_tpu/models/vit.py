"""ViT-B/16 (timm ``vit_base_patch16_224`` architecture) with functional
attention capture.

The reference's ViT workload (Transformer_MM_explainability_ViT.ipynb)
imports ``baselines.ViT.ViT_new.vit_base_patch16_224`` from the sibling
Transformer-Explainability repo — a timm-style pre-LN ViT whose attention
modules record A and ∇A via hooks (SURVEY.md §1 "external dependency").
This module defines that model natively in JAX:

  * patchify = conv as a single reshaped matmul (MXU-friendly),
  * blocks stacked along a leading layer axis and driven by ``lax.scan``
    (one traced block → fast compiles, perfect layout reuse),
  * attention probabilities captured functionally via additive taps
    (see ops/attention.py).

``vit_relevancy`` computes the notebook's ``generate_relevance``
(cell 7: one fwd, one bwd, then R += Ê_l R over the 12 blocks) as a
single jitted XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.ops.attention import (
    AttentionParams,
    gelu,
    layer_norm,
    multi_head_self_attention,
)
from transformer_mm_explainability_tpu.ops import relevancy as rl


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    num_classes: int = 1000
    ln_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1  # patches + CLS


VIT_B_16 = ViTConfig()


def init_params(key: jax.Array, cfg: ViTConfig = VIT_B_16,
                dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    """Random init (trunc-normal-ish); real weights come from the
    torch→jax converter (utils/convert.py)."""
    D, L, P = cfg.width, cfg.depth, cfg.patch_size
    Dm = cfg.mlp_ratio * D
    ks = jax.random.split(key, 12)

    def nrm(k, shape, s=0.02):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    zeros = lambda shape: jnp.zeros(shape, dtype)
    ones = lambda shape: jnp.ones(shape, dtype)
    return {
        "patch_embed": {"w": nrm(ks[0], (P * P * 3, D)), "b": zeros((D,))},
        "cls_token": nrm(ks[1], (1, D)),
        "pos_embed": nrm(ks[2], (cfg.seq_len, D)),
        "blocks": {
            "ln1": {"scale": ones((L, D)), "bias": zeros((L, D))},
            "attn": AttentionParams(
                w_qkv=nrm(ks[3], (L, D, 3 * D)),
                b_qkv=zeros((L, 3 * D)),
                w_out=nrm(ks[4], (L, D, D)),
                b_out=zeros((L, D)),
            ),
            "ln2": {"scale": ones((L, D)), "bias": zeros((L, D))},
            "mlp": {
                "w1": nrm(ks[5], (L, D, Dm)), "b1": zeros((L, Dm)),
                "w2": nrm(ks[6], (L, Dm, D)), "b2": zeros((L, D)),
            },
        },
        "norm": {"scale": ones((D,)), "bias": zeros((D,))},
        "head": {"w": nrm(ks[7], (D, cfg.num_classes)),
                 "b": zeros((cfg.num_classes,))},
    }


def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """[B, H, W, 3] -> [B, N_patches, P*P*3].

    Equivalent to the stride-P conv patch embed, expressed as a reshape +
    matmul so XLA maps it straight onto the MXU.
    """
    B, H, W, C = images.shape
    P = patch_size
    x = images.reshape(B, H // P, P, W // P, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, gh, gw, P, P, C
    return x.reshape(B, (H // P) * (W // P), P * P * C)


def _block(x, p, tap, cfg: ViTConfig):
    """One pre-LN transformer block; returns (x_out, attn_probs)."""
    h = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.ln_eps)
    attn_out, probs = multi_head_self_attention(
        p["attn"], h, cfg.num_heads, tap=tap)
    x = x + attn_out
    h = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.ln_eps)
    h = gelu(h @ p["mlp"]["w1"] + p["mlp"]["b1"])
    h = h @ p["mlp"]["w2"] + p["mlp"]["b2"]
    return x + h, probs


def _embed(params, images, cfg: ViTConfig):
    B = images.shape[0]
    x = patchify(images, cfg.patch_size) @ params["patch_embed"]["w"]
    x = x + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls_token"], (B, 1, cfg.width))
    return jnp.concatenate([cls, x], axis=1) + params["pos_embed"]


def forward(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    taps: Optional[jnp.ndarray] = None,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ViT forward. images: [B, H, W, 3] (already normalised).

    ``taps``: optional [L, B, H, S, S] additive attention-probability
    taps (zeros for capture). Returns ``(logits [B, C],
    attn_probs [L, B, H, S, S])``. ``remat`` checkpoints each block
    (recompute-in-backward) — trades ~⅓ more FLOPs for dropping the
    per-layer activation residuals, unlocking larger capture batches.
    """
    B = images.shape[0]
    x = _embed(params, images, cfg)

    if taps is None:
        taps = jnp.zeros(
            (cfg.depth, B, cfg.num_heads, cfg.seq_len, cfg.seq_len), x.dtype
        )

    def block(x, layer):
        p, tap = layer
        return _block(x, p, tap, cfg)

    if remat:
        block = jax.checkpoint(block,
                               policy=jax.checkpoint_policies.nothing_saveable)
    x, attn = jax.lax.scan(block, x, (params["blocks"], taps))
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], cfg.ln_eps)
    logits = x[:, 0] @ params["head"]["w"] + params["head"]["b"]
    return logits, attn


def capture(
    params: Dict[str, Any],
    images: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    remat: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One fused fwd+bwd: returns (logits, A, ∇A), each [L, B, H, S, S]
    for A/∇A. ``targets``: [B] int class indices (the explained logits).

    The scalar differentiated is Σ_b logits[b, targets[b]] — per-example
    gradients stay independent, so this batches the reference's
    ``one_hot.backward(retain_graph=True)`` over B images in one pass.
    """
    B = images.shape[0]
    shape = (cfg.depth, B, cfg.num_heads, cfg.seq_len, cfg.seq_len)

    def score_fn(taps):
        logits, attn = forward(params, images, cfg, taps, remat=remat)
        score = jnp.take_along_axis(logits, targets[:, None], axis=1).sum()
        return score, (logits, attn)

    grads, (logits, attn) = jax.grad(score_fn, has_aux=True)(
        jnp.zeros(shape, images.dtype)
    )
    return logits, attn, grads


def relevancy_streamed(
    params: Dict[str, Any],
    images: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
) -> jnp.ndarray:
    """Memory-streamed ``relevancy``: never materialises the
    [L, B, H, S, S] attention/gradient stacks.

    Forward tapes only the per-layer block inputs ([L, B, S, D]); the
    reverse pass is a ``lax.scan`` running per-layer VJPs — each step
    recomputes one block, extracts that layer's (A, ∇A), folds it into
    the rollout product P ← P·(I + Ê_l), and frees the buffers. Exactly
    equal to ``relevancy`` (same math, same fp32 accumulations); HBM
    drops from O(L·B·H·S²) to O(B·H·S²), unlocking much larger batches.
    """
    B = images.shape[0]
    H, S, D = cfg.num_heads, cfg.seq_len, cfg.width
    stacked = params["blocks"]

    def block(x, p, tap):
        return _block(x, p, tap, cfg)

    # --- forward, taping block inputs only --------------------------------
    x = _embed(params, images, cfg)
    zero_tap = jnp.zeros((B, H, S, S), x.dtype)

    def fwd_step(x, p):
        x_out, _ = block(x, p, zero_tap)
        return x_out, x  # tape the INPUT

    x_final, tape = jax.lax.scan(fwd_step, x, stacked)

    # --- head cotangent -----------------------------------------------------
    def head_fn(xf):
        h = layer_norm(xf, params["norm"]["scale"], params["norm"]["bias"],
                       cfg.ln_eps)
        logits = h[:, 0] @ params["head"]["w"] + params["head"]["b"]
        return jnp.take_along_axis(logits, targets[:, None], axis=1).sum()

    cot_x = jax.grad(head_fn)(x_final)

    # --- reverse: per-layer VJP + rollout fold ------------------------------
    def bwd_step(carry, inputs):
        cot_x, P = carry
        p, x_in = inputs
        (x_out, probs), vjp = jax.vjp(
            lambda xi, tap: block(xi, p, tap), x_in, zero_tap)
        cot_x_in, grad_A = vjp((cot_x, jnp.zeros_like(probs)))
        prod = (grad_A.astype(jnp.float32) * probs.astype(jnp.float32))
        e_hat = jnp.maximum(prod, 0.0).mean(axis=1)            # [B, S, S]
        # P accumulates right-to-left: P ← P(I + Ê_l) over l = L..1
        P = P + jnp.einsum("bij,bjk->bik", P, e_hat,
                           preferred_element_type=jnp.float32)
        return (cot_x_in, P), None

    P0 = jnp.broadcast_to(jnp.eye(S, dtype=jnp.float32), (B, S, S))
    (_, P), _ = jax.lax.scan(bwd_step, (cot_x, P0), (stacked, tape),
                             reverse=True)
    return P[:, 0, 1:]


def relevancy_streamed_row(
    params: Dict[str, Any],
    images: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    row: int = 0,
) -> jnp.ndarray:
    """Row-streamed ``relevancy``: computes ONLY the CLS row of R.

    The notebook's output is ``R[0, 1:]`` — a single row of the rollout
    product. Since R = (I+Ê_L)···(I+Ê_1), its row is
    ``e_rowᵀ(I+Ê_L)···(I+Ê_1)``: the chain becomes L vector-matrix
    products (O(L·S²) instead of O(L·S³)) folded into the same
    per-layer-VJP reverse scan as ``relevancy_streamed``. Identical
    values to ``relevancy(...)[:, row, 1:]`` — and the relevancy math
    stops being the FLOPs bottleneck entirely.
    """
    B = images.shape[0]
    H, S, D = cfg.num_heads, cfg.seq_len, cfg.width
    stacked = params["blocks"]

    def block(x, p, tap):
        return _block(x, p, tap, cfg)

    x = _embed(params, images, cfg)
    zero_tap = jnp.zeros((B, H, S, S), x.dtype)

    def fwd_step(x, p):
        x_out, _ = block(x, p, zero_tap)
        return x_out, x

    x_final, tape = jax.lax.scan(fwd_step, x, stacked)

    def head_fn(xf):
        h = layer_norm(xf, params["norm"]["scale"], params["norm"]["bias"],
                       cfg.ln_eps)
        logits = h[:, 0] @ params["head"]["w"] + params["head"]["b"]
        return jnp.take_along_axis(logits, targets[:, None], axis=1).sum()

    cot_x = jax.grad(head_fn)(x_final)

    def bwd_step(carry, inputs):
        cot_x, r = carry
        p, x_in = inputs
        (x_out, probs), vjp = jax.vjp(
            lambda xi, tap: block(xi, p, tap), x_in, zero_tap)
        cot_x_in, grad_A = vjp((cot_x, jnp.zeros_like(probs)))
        prod = (grad_A.astype(jnp.float32) * probs.astype(jnp.float32))
        e_hat = jnp.maximum(prod, 0.0).mean(axis=1)            # [B, S, S]
        r = r + jnp.einsum("bj,bjk->bk", r, e_hat,
                           preferred_element_type=jnp.float32)
        return (cot_x_in, r), None

    r0 = jnp.zeros((B, S), jnp.float32).at[:, row].set(1.0)
    (_, r), _ = jax.lax.scan(bwd_step, (cot_x, r0), (stacked, tape),
                             reverse=True)
    return r[:, 1:]


def relevancy_fused(
    params: Dict[str, Any],
    images: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    row: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``relevancy_streamed_row`` with fused Pallas attention kernels —
    the speed-of-light fp32 path.

    vs the per-layer-VJP variant:
      * attention probabilities NEVER touch HBM: the forward uses a
        flash kernel, and the backward recomputes A in VMEM while
        emitting dq/dk/dv AND the rule-6 row fold e_row = r·Ê in one
        program (ops/flash_attention.flash_bwd_ehat);
      * the forward tapes (x_in, x_mid, pre-GELU) per layer, so the
        backward re-runs NO matmuls beyond the cotangent products —
        the MLP backward drops from 4 big matmuls (vjp-with-recompute)
        to 2.

    Output == ``relevancy(...)[:, row, 1:]`` (same math; fp32 softmax
    and accumulation; matmuls at the TPU-default bf16-operand/f32-
    accumulate precision on chip, full f32 in interpret mode).
    """
    from transformer_mm_explainability_tpu.ops import flash_attention as fa

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B = images.shape[0]
    Hn, S, D = cfg.num_heads, cfg.seq_len, cfg.width
    stacked = params["blocks"]
    eps = cfg.ln_eps

    def attn_part(x, p):
        """x → x_mid: LN1 + fused-QKV + flash attention (merged-head
        layout end to end — zero transposes) + projection + residual."""
        h1 = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps)
        qkv = h1 @ p["attn"].w_qkv + p["attn"].b_qkv
        out = fa.flash_fwd_qkv(qkv, Hn, interpret=interpret)
        x_mid = x + out @ p["attn"].w_out + p["attn"].b_out
        return x_mid, None

    def mlp_part(x_mid, p):
        """x_mid → (x_out, a1): LN2 + MLP + residual, taping pre-GELU."""
        h2 = layer_norm(x_mid, p["ln2"]["scale"], p["ln2"]["bias"], eps)
        a1 = h2 @ p["mlp"]["w1"] + p["mlp"]["b1"]
        x_out = x_mid + gelu(a1) @ p["mlp"]["w2"] + p["mlp"]["b2"]
        return x_out, a1

    # --- forward, taping (x_in, x_mid, a1) ---------------------------------
    x = _embed(params, images, cfg)

    def fwd_step(x, p):
        x_mid, _ = attn_part(x, p)
        x_out, a1 = mlp_part(x_mid, p)
        return x_out, (x, x_mid, a1)

    x_final, tape = jax.lax.scan(fwd_step, x, stacked)

    def head_fn(xf):
        h = layer_norm(xf, params["norm"]["scale"], params["norm"]["bias"],
                       eps)
        logits = h[:, 0] @ params["head"]["w"] + params["head"]["b"]
        return jnp.take_along_axis(logits, targets[:, None], axis=1).sum()

    cot_x = jax.grad(head_fn)(x_final)

    # --- manual per-layer backward + fused Ê fold ---------------------------
    def bwd_step(carry, inputs):
        cot_x, r = carry
        p, (x_in, x_mid, a1) = inputs

        # MLP backward from the taped pre-GELU (2 matmuls, no refwd)
        d_g = cot_x @ p["mlp"]["w2"].T
        _, gelu_vjp = jax.vjp(gelu, a1)
        (d_a1,) = gelu_vjp(d_g)
        d_h2 = d_a1 @ p["mlp"]["w1"].T
        _, ln2_vjp = jax.vjp(
            lambda xm: layer_norm(xm, p["ln2"]["scale"], p["ln2"]["bias"],
                                  eps), x_mid)
        (d_xmid_ln,) = ln2_vjp(d_h2)
        cot_mid = cot_x + d_xmid_ln

        # attention backward: recompute qkv (1 matmul) and run the
        # fused kernel; the relevancy row folds in the same program
        h1, ln1_vjp = jax.vjp(
            lambda xi: layer_norm(xi, p["ln1"]["scale"], p["ln1"]["bias"],
                                  eps), x_in)
        qkv = h1 @ p["attn"].w_qkv + p["attn"].b_qkv
        d_merged = cot_mid @ p["attn"].w_out.T
        d_qkv, e_row = fa.flash_bwd_ehat_qkv(qkv, d_merged, r, Hn,
                                             interpret=interpret)
        d_h1 = d_qkv @ p["attn"].w_qkv.T
        (d_x_ln,) = ln1_vjp(d_h1)
        cot_x_in = cot_mid + d_x_ln
        return (cot_x_in, r + e_row), None

    r0 = jnp.zeros((B, S), jnp.float32).at[:, row].set(1.0)
    (_, r), _ = jax.lax.scan(bwd_step, (cot_x, r0), (stacked, tape),
                             reverse=True)
    return r[:, 1:]


def relevancy_fused_block(
    params: Dict[str, Any],
    images: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    row: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``relevancy_fused`` with layer-granular attention kernels —
    the HBM-minimal fp32 path.

    vs ``relevancy_fused`` (which already keeps A in VMEM): the WHOLE
    attention residual branch of each block runs as one Pallas program
    per image (ops/attn_block_pallas), so qkv, the merged attention
    output, d_merged and dqkv never touch HBM either — per layer the
    attention branch costs one [S, D] read + one write in each
    direction instead of ~0.9 GB/batch of intermediate round-trips.
    Weights ride as grid-constant bf16 blocks (same bf16-operand/f32-
    accumulate dot arithmetic as XLA's default f32 matmul lowering, so
    outputs still match the parity-tested chain to fp32 noise). The
    MLP branch stays in XLA (its matmul chain fuses well and tapes a1).
    """
    from transformer_mm_explainability_tpu.ops import attn_block_pallas as ab

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B = images.shape[0]
    Hn, S = cfg.num_heads, cfg.seq_len
    stacked = params["blocks"]
    eps = cfg.ln_eps
    # pre-cast attention weights ONCE (outside the scan): under
    # fast_dots the kernel casts dot operands to bf16 anyway, so bf16
    # storage is arithmetic-neutral and halves weight VMEM/HBM traffic
    wdt = jnp.float32 if interpret else jnp.bfloat16
    attn_w = {
        "w_qkv": stacked["attn"].w_qkv.astype(wdt),
        "w_out": stacked["attn"].w_out.astype(wdt),
        "b_qkv": stacked["attn"].b_qkv,
        "b_out": stacked["attn"].b_out,
        "ln1s": stacked["ln1"]["scale"], "ln1b": stacked["ln1"]["bias"],
    }
    mlp_w = {"ln2": stacked["ln2"], "mlp": stacked["mlp"]}

    def mlp_part(x_mid, p):
        h2 = layer_norm(x_mid, p["ln2"]["scale"], p["ln2"]["bias"], eps)
        a1 = h2 @ p["mlp"]["w1"] + p["mlp"]["b1"]
        x_out = x_mid + gelu(a1) @ p["mlp"]["w2"] + p["mlp"]["b2"]
        return x_out, a1

    x = _embed(params, images, cfg)

    def fwd_step(x, layer):
        aw, mw = layer
        x_mid = ab.attn_block_fwd(
            x, aw["w_qkv"], aw["b_qkv"], aw["w_out"], aw["b_out"],
            aw["ln1s"], aw["ln1b"], Hn, eps, interpret=interpret)
        x_out, a1 = mlp_part(x_mid, mw)
        return x_out, (x, x_mid, a1)

    x_final, tape = jax.lax.scan(fwd_step, x, (attn_w, mlp_w))

    def head_fn(xf):
        h = layer_norm(xf, params["norm"]["scale"], params["norm"]["bias"],
                       eps)
        logits = h[:, 0] @ params["head"]["w"] + params["head"]["b"]
        return jnp.take_along_axis(logits, targets[:, None], axis=1).sum()

    cot_x = jax.grad(head_fn)(x_final)

    def bwd_step(carry, inputs):
        cot_x, r = carry
        (aw, mw), (x_in, x_mid, a1) = inputs
        p = mw
        # MLP backward from the taped pre-GELU (as in relevancy_fused)
        d_g = cot_x @ p["mlp"]["w2"].T
        _, gelu_vjp = jax.vjp(gelu, a1)
        (d_a1,) = gelu_vjp(d_g)
        d_h2 = d_a1 @ p["mlp"]["w1"].T
        _, ln2_vjp = jax.vjp(
            lambda xm: layer_norm(xm, p["ln2"]["scale"], p["ln2"]["bias"],
                                  eps), x_mid)
        (d_xmid_ln,) = ln2_vjp(d_h2)
        cot_mid = cot_x + d_xmid_ln
        # the whole attention backward + Ê fold in one kernel
        cot_x_in, e_row = ab.attn_block_bwd(
            x_in, cot_mid, r, aw["w_qkv"], aw["b_qkv"], aw["w_out"],
            aw["ln1s"], aw["ln1b"], Hn, eps, interpret=interpret)
        return (cot_x_in, r + e_row), None

    r0 = jnp.zeros((B, S), jnp.float32).at[:, row].set(1.0)
    (_, r), _ = jax.lax.scan(bwd_step, (cot_x, r0),
                             ((attn_w, mlp_w), tape), reverse=True)
    return r[:, 1:]


def relevancy_fused_forward_probe(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """EXACTLY the forward subprogram of ``relevancy_fused`` (embed +
    taping scan over flash-attention blocks + head), returning the
    logits. Used by ``tools/roofline.py`` to split the measured
    wall-clock into forward vs backward shares; not a user API."""
    from transformer_mm_explainability_tpu.ops import flash_attention as fa

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    Hn, eps = cfg.num_heads, cfg.ln_eps
    x = _embed(params, images, cfg)

    def fwd_step(x, p):
        h1 = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps)
        qkv = h1 @ p["attn"].w_qkv + p["attn"].b_qkv
        out = fa.flash_fwd_qkv(qkv, Hn, interpret=interpret)
        x_mid = x + out @ p["attn"].w_out + p["attn"].b_out
        h2 = layer_norm(x_mid, p["ln2"]["scale"], p["ln2"]["bias"], eps)
        a1 = h2 @ p["mlp"]["w1"] + p["mlp"]["b1"]
        x_out = x_mid + gelu(a1) @ p["mlp"]["w2"] + p["mlp"]["b2"]
        return x_out, (x, x_mid, a1)

    x_final, _ = jax.lax.scan(fwd_step, x, params["blocks"])
    h = layer_norm(x_final, params["norm"]["scale"], params["norm"]["bias"],
                   eps)
    return h[:, 0] @ params["head"]["w"] + params["head"]["b"]


def relevancy_fused_block2(
    params: Dict[str, Any],
    images: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    row: int = 0,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``relevancy_fused_block`` with the MLP backward ALSO fused
    (ops/attn_block_pallas.mlp_block_bwd) — no a1 tape.

    The backward recomputes the pre-GELU activations from x_mid inside
    VMEM (one extra [S, D]×[D, I] dot per layer) instead of taping
    [L, B, S, I] fp32 through HBM, killing both the tape traffic and
    the MLP-backward intermediates (d_g, d_a1, d_h2 round-trips). HBM
    footprint drops by L·B·S·I·4 bytes (~1.6 GB at B=56), which also
    unlocks larger batches. Same fp32-parity bar as the other fused
    paths.
    """
    from transformer_mm_explainability_tpu.ops import attn_block_pallas as ab

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    B = images.shape[0]
    Hn, S = cfg.num_heads, cfg.seq_len
    stacked = params["blocks"]
    eps = cfg.ln_eps
    wdt = jnp.float32 if interpret else jnp.bfloat16
    attn_w = {
        "w_qkv": stacked["attn"].w_qkv.astype(wdt),
        "w_out": stacked["attn"].w_out.astype(wdt),
        "b_qkv": stacked["attn"].b_qkv,
        "b_out": stacked["attn"].b_out,
        "ln1s": stacked["ln1"]["scale"], "ln1b": stacked["ln1"]["bias"],
    }
    mlp_w = {
        "w1": stacked["mlp"]["w1"].astype(wdt),
        "b1": stacked["mlp"]["b1"],
        "w2": stacked["mlp"]["w2"].astype(wdt),
        "b2": stacked["mlp"]["b2"],
        "ln2s": stacked["ln2"]["scale"], "ln2b": stacked["ln2"]["bias"],
    }

    x = _embed(params, images, cfg)

    def fwd_step(x, layer):
        aw, mw = layer
        x_mid = ab.attn_block_fwd(
            x, aw["w_qkv"], aw["b_qkv"], aw["w_out"], aw["b_out"],
            aw["ln1s"], aw["ln1b"], Hn, eps, interpret=interpret)
        x_out = ab.mlp_block_fwd(
            x_mid, mw["w1"], mw["b1"], mw["w2"], mw["b2"],
            mw["ln2s"], mw["ln2b"], eps, interpret=interpret)
        return x_out, (x, x_mid)

    x_final, tape = jax.lax.scan(fwd_step, x, (attn_w, mlp_w))

    def head_fn(xf):
        h = layer_norm(xf, params["norm"]["scale"], params["norm"]["bias"],
                       eps)
        logits = h[:, 0] @ params["head"]["w"] + params["head"]["b"]
        return jnp.take_along_axis(logits, targets[:, None], axis=1).sum()

    cot_x = jax.grad(head_fn)(x_final)

    def bwd_step(carry, inputs):
        cot_x, r = carry
        (aw, mw), (x_in, x_mid) = inputs
        cot_mid = ab.mlp_block_bwd(
            x_mid, cot_x, mw["w1"], mw["b1"], mw["w2"],
            mw["ln2s"], mw["ln2b"], eps, interpret=interpret)
        cot_x_in, e_row = ab.attn_block_bwd(
            x_in, cot_mid, r, aw["w_qkv"], aw["b_qkv"], aw["w_out"],
            aw["ln1s"], aw["ln1b"], Hn, eps, interpret=interpret)
        return (cot_x_in, r + e_row), None

    r0 = jnp.zeros((B, S), jnp.float32).at[:, row].set(1.0)
    (_, r), _ = jax.lax.scan(bwd_step, (cot_x, r0),
                             ((attn_w, mlp_w), tape), reverse=True)
    return r[:, 1:]


def relevancy_fused_block_forward_probe(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """EXACTLY the forward subprogram of ``relevancy_fused_block``
    (embed + taping scan over layer-granular attention kernels + head),
    returning the logits. Used by ``tools/roofline.py --path
    fused_block`` to split wall-clock into fwd vs bwd; not a user API."""
    from transformer_mm_explainability_tpu.ops import attn_block_pallas as ab

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    Hn, eps = cfg.num_heads, cfg.ln_eps
    stacked = params["blocks"]
    wdt = jnp.float32 if interpret else jnp.bfloat16
    attn_w = {
        "w_qkv": stacked["attn"].w_qkv.astype(wdt),
        "w_out": stacked["attn"].w_out.astype(wdt),
        "b_qkv": stacked["attn"].b_qkv,
        "b_out": stacked["attn"].b_out,
        "ln1s": stacked["ln1"]["scale"], "ln1b": stacked["ln1"]["bias"],
    }
    mlp_w = {"ln2": stacked["ln2"], "mlp": stacked["mlp"]}
    x = _embed(params, images, cfg)

    def fwd_step(x, layer):
        aw, p = layer
        x_mid = ab.attn_block_fwd(
            x, aw["w_qkv"], aw["b_qkv"], aw["w_out"], aw["b_out"],
            aw["ln1s"], aw["ln1b"], Hn, eps, interpret=interpret)
        h2 = layer_norm(x_mid, p["ln2"]["scale"], p["ln2"]["bias"], eps)
        a1 = h2 @ p["mlp"]["w1"] + p["mlp"]["b1"]
        x_out = x_mid + gelu(a1) @ p["mlp"]["w2"] + p["mlp"]["b2"]
        return x_out, (x, x_mid, a1)

    x_final, _ = jax.lax.scan(fwd_step, x, (attn_w, mlp_w))
    h = layer_norm(x_final, params["norm"]["scale"], params["norm"]["bias"],
                   eps)
    return h[:, 0] @ params["head"]["w"] + params["head"]["b"]


def relevancy_fused_block2_forward_probe(
    params: Dict[str, Any],
    images: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Forward subprogram of ``relevancy_fused_block2`` (both branch
    kernels), returning the logits — roofline fwd/bwd split probe."""
    from transformer_mm_explainability_tpu.ops import attn_block_pallas as ab

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    Hn, eps = cfg.num_heads, cfg.ln_eps
    stacked = params["blocks"]
    wdt = jnp.float32 if interpret else jnp.bfloat16
    x = _embed(params, images, cfg)

    def fwd_step(x, p):
        x_mid = ab.attn_block_fwd(
            x, p["attn"].w_qkv.astype(wdt), p["attn"].b_qkv,
            p["attn"].w_out.astype(wdt), p["attn"].b_out,
            p["ln1"]["scale"], p["ln1"]["bias"], Hn, eps,
            interpret=interpret)
        x_out = ab.mlp_block_fwd(
            x_mid, p["mlp"]["w1"].astype(wdt), p["mlp"]["b1"],
            p["mlp"]["w2"].astype(wdt), p["mlp"]["b2"],
            p["ln2"]["scale"], p["ln2"]["bias"], eps,
            interpret=interpret)
        return x_out, (x, x_mid)

    x_final, _ = jax.lax.scan(fwd_step, x, stacked)
    h = layer_norm(x_final, params["norm"]["scale"], params["norm"]["bias"],
                   eps)
    return h[:, 0] @ params["head"]["w"] + params["head"]["b"]


def relevancy(
    params: Dict[str, Any],
    images: jnp.ndarray,
    targets: jnp.ndarray,
    cfg: ViTConfig = VIT_B_16,
    start_layer: int = 0,
    remat: bool = False,
) -> jnp.ndarray:
    """The ViT notebook's ``generate_relevance``: per-image [S-1] patch
    relevancy (CLS row minus the CLS entry), batched.

    ViT notebook cell 7: R = I; per block R += avg_heads(A, ∇A) @ R;
    return R[0, 1:].
    """
    _, attn, grads = capture(params, images, targets, cfg, remat=remat)
    # [L, B, H, S, S] -> batch-first for vmap
    attn_b = jnp.moveaxis(attn, 1, 0)
    grads_b = jnp.moveaxis(grads, 1, 0)
    R = jax.vmap(
        lambda a, g: rl.self_attention_relevancy(a, g, start_layer=start_layer)
    )(attn_b, grads_b)
    return R[:, 0, 1:]
