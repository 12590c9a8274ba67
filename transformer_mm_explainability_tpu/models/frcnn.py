"""Faster R-CNN visual frontend (the LXMERT feature extractor, C10).

Equivalent of the reference's vendored detectron2 port
(lxmert/lxmert/src/modeling_frcnn.py: ResNet backbone :943, RPN +
AnchorGenerator :1352-1592, ROIPooler :1056 (torchvision **RoIPool** —
quantised max pooling, NOT RoIAlign), Res5ROIHeads :1251, ROIOutputs
do_nms/decode :116-140,:1137, GeneralizedRCNN :1660-1922) producing 36
ROI features (2048-d) + normalised boxes for LXMERT.

Reference semantics reproduced exactly:
  * anchors at ``offset * stride`` grid shifts (OFFSET = 0.0,
    :_create_grid_offsets) with centre-0 bases;
  * RPN hidden width from PROPOSAL_GENERATOR.HIDDEN_CHANNELS (512 for
    the VG config, "Use hidden dim instead of the same dim as Res4",
    :1467-1471);
  * proposal selection: top-K by raw objectness logit → clip →
    drop empty boxes → NMS 0.7 → top post_nms_topk (:find_top_rpn_proposals);
  * RoIPool: round() box quantisation, +1 width convention, per-bin
    floor/ceil boundaries, max pooling, empty bins = 0 (torchvision
    roi_pool semantics, the ROIPooler's ``level_poolers``);
  * VG res5: first block stride 1 and dilation-2 3×3 convs
    (RES5HALVE=False modifications, :1494-1502);
  * background class is the LAST column — detection scores use
    ``softmax(logits)[:, :-1]`` and attr scores ``attr_logits[..., :-1]``
    (:do_nms, :_predict_attrs);
  * detection selection = single NMS over the class-max scores of ALL
    proposals, first MAX_DETECTIONS kept; the configured score_thresh is
    accepted-and-ignored exactly like the reference's ``do_nms``;
  * attr head: class embedding of the argmax over ALL classes
    (background included, :1649-1654) concatenated to the 2048-d
    feature.

TPU-first design — every stage is static-shape: top-K + validity masks
instead of dynamic filtering, fixed-iteration argmax-suppress NMS
(lax.fori_loop over the output budget), axis-factorised RoIPool (two
masked-max passes instead of per-bin loops), and a chunked lax.map so
the pooled intermediate stays small.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from transformer_mm_explainability_tpu.models import resnet
from transformer_mm_explainability_tpu.ops.roi_pool_pallas import (
    roi_bin_bounds,
)
from transformer_mm_explainability_tpu.utils import box_ops


@dataclasses.dataclass(frozen=True)
class FrcnnConfig:
    # backbone: ResNet-101 C4 (res2-res4 features; res5 = ROI head)
    stages: Tuple[int, ...] = (3, 4, 23, 3)
    stride_in_1x1: bool = True
    caffe_maxpool: bool = True        # MODEL.MAX_POOL (caffe stem pool)
    feat_stride: int = 16
    # anchors (ANCHOR_GENERATOR.*; OFFSET=0.0 is the detectron2 default)
    anchor_sizes: Tuple[float, ...] = (32, 64, 128, 256, 512)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_offset: float = 0.0
    # RPN (RPN.* + PROPOSAL_GENERATOR.*)
    rpn_hidden_dim: int = 512         # VG config HIDDEN_CHANNELS
    pre_nms_topk: int = 6000          # PRE_NMS_TOPK_TEST
    post_nms_topk: int = 1000         # POST_NMS_TOPK_TEST
    rpn_nms_thresh: float = 0.7
    # ROI heads
    pooler_resolution: int = 14
    res5_halve: bool = False          # VG: stride-1 res5 + dilation 2
    num_classes: int = 1600
    num_attrs: int = 400
    score_thresh: float = 0.2         # accepted + ignored, like do_nms
    detection_nms_thresh: float = 0.5
    max_detections: int = 36          # MIN_DETECTIONS == MAX_DETECTIONS
    # the VG checkpoint regresses one box per foreground class: do_nms's
    # ``arange(N)*K + max_classes`` gather (modeling_frcnn.py:128-130)
    # is only well-formed when K == num_classes
    cls_agnostic_bbox_reg: bool = False
    # box transform weights (RPN.BBOX_REG_WEIGHTS / ROI_BOX_HEAD.*)
    rpn_box_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    box_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)
    # RoIPool implementation: "xla" (chunked lax.map gather) or
    # "pallas" (VMEM-resident feature slab, ops/roi_pool_pallas.py);
    # both are exactness-equivalent (tests/test_frcnn.py)
    roi_pool_impl: str = "xla"
    # NMS implementation: "argmax" (max_out sequential argmax+suppress
    # iterations) or "blocked" (score-sorted block processing, ~N/512
    # sequential stages); exactness-equivalent (tests/test_frcnn.py).
    # Measured on v5e at the RPN shape (6000->1000, all picks forced):
    # argmax 0.86 ms vs blocked 2.02 ms — the serial loop's per-pick
    # vector work is cheap enough that the blocked path's ~6x extra
    # elementwise work loses; "argmax" stays the default.
    nms_impl: str = "argmax"


FRCNN_VG = FrcnnConfig()


# ---------------------------------------------------------------------------
# anchors & box transform
# ---------------------------------------------------------------------------

def anchor_grid(feat_h: int, feat_w: int, cfg: FrcnnConfig) -> jnp.ndarray:
    """[H*W*A, 4] xyxy anchors: cell-major (y, x), anchor-minor — the
    layout of grid_anchors (modeling_frcnn.py:1402-1412) with
    generate_cell_anchors' centre-0 bases (:1414-1429)."""
    bases = []
    for size in cfg.anchor_sizes:
        area = size * size
        for ratio in cfg.aspect_ratios:
            w = (area / ratio) ** 0.5
            h = w * ratio
            bases.append([-w / 2, -h / 2, w / 2, h / 2])
    bases = jnp.asarray(bases)                      # [A, 4]
    shifts_x = (jnp.arange(feat_w) + cfg.anchor_offset) * cfg.feat_stride
    shifts_y = (jnp.arange(feat_h) + cfg.anchor_offset) * cfg.feat_stride
    sx, sy = jnp.meshgrid(shifts_x, shifts_y)       # [H, W]
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + bases[None]).reshape(-1, 4)


def apply_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray,
                 weights: Sequence[float],
                 scale_clamp: float = 4.135166556742356) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas (dx,dy,dw,dh on cxcywh; the clamp
    default is ln(1000/16), modeling_frcnn.py:429-520)."""
    wx, wy, ww, wh = weights
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + 0.5 * w
    cy = boxes[:, 1] + 0.5 * h
    dx, dy, dw, dh = (deltas[:, 0] / wx, deltas[:, 1] / wy,
                      deltas[:, 2] / ww, deltas[:, 3] / wh)
    dw = jnp.minimum(dw, scale_clamp)
    dh = jnp.minimum(dh, scale_clamp)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack([pcx - pw / 2, pcy - ph / 2,
                      pcx + pw / 2, pcy + ph / 2], axis=1)


def clip_boxes(boxes: jnp.ndarray, img_h: float, img_w: float) -> jnp.ndarray:
    x0 = jnp.clip(boxes[:, 0], 0, img_w)
    y0 = jnp.clip(boxes[:, 1], 0, img_h)
    x1 = jnp.clip(boxes[:, 2], 0, img_w)
    y1 = jnp.clip(boxes[:, 3], 0, img_h)
    return jnp.stack([x0, y0, x1, y1], axis=1)


def nonempty(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """_nonempty_boxes (modeling_frcnn.py:152-156)."""
    return ((boxes[:, 2] - boxes[:, 0] > threshold)
            & (boxes[:, 3] - boxes[:, 1] > threshold))


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray,
              iou_thresh: float, max_out: int,
              valid: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape NMS: ``max_out`` iterations of argmax + suppress.
    Matches torchvision ``nms`` (suppress on IoU strictly > thresh;
    score-descending output order; first-index tie-break).
    Returns (indices [max_out], keep_valid [max_out])."""
    s = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def cond(carry):
        i, s, idxs, ok, alive = carry
        return (i < max_out) & alive

    def body(carry):
        i, s, idxs, ok, _ = carry
        j = jnp.argmax(s)
        good = s[j] > -jnp.inf
        idxs = idxs.at[i].set(j.astype(jnp.int32))
        ok = ok.at[i].set(good)
        # IoU row against the winner, computed on the fly: an O(N) vector
        # op per pick instead of a precomputed [N, N] matrix (144 MB at
        # the 6k-proposal RPN stage, of which only max_out rows are read)
        bj = boxes[j]
        lt = jnp.maximum(boxes[:, :2], bj[:2])
        rb = jnp.minimum(boxes[:, 2:], bj[2:])
        wh = jnp.clip(rb - lt, 0)
        inter = wh[:, 0] * wh[:, 1]
        iou_row = inter / (areas + areas[j] - inter)
        s = jnp.where(iou_row > iou_thresh, -jnp.inf, s)
        s = s.at[j].set(-jnp.inf)
        return i + 1, s, idxs, ok, good

    # while_loop (not fori): candidates can run out before max_out picks
    # (masked `valid`, small feature maps) — stop instead of burning the
    # remaining iterations on argmax-of-(-inf); outputs are identical
    # (unwritten slots stay idx 0 / ok False).
    _, _, idxs, ok, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), s, jnp.zeros((max_out,), jnp.int32),
         jnp.zeros((max_out,), bool), jnp.bool_(True)))
    return idxs, ok


def nms_blocked(boxes: jnp.ndarray, scores: jnp.ndarray,
                iou_thresh: float, max_out: int,
                valid: Optional[jnp.ndarray] = None,
                block: int = 512) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``nms_fixed`` with blocked score-order processing — same outputs
    (exact greedy NMS, torchvision semantics), ~N/block sequential
    stages instead of ``max_out`` argmax+suppress iterations.

    The greedy recurrence ``keep[t] = ¬∃u<t: keep[u] ∧ iou(u,t)>τ`` is
    evaluated over score-sorted boxes one block at a time: boxes are
    first suppressed against the already-finalised earlier blocks (one
    [T, N] vector stage), then the within-block recurrence is solved by
    iterating ``alive ← base ∧ ¬(Sᵀ alive)`` to its fixpoint — the
    dependency DAG levels settle one per iteration, so the while_loop
    terminates in ≤ depth(T) steps (typically a handful). The fixpoint
    equation has a unique solution (induction over the sorted order),
    which IS the sequential greedy answer. TPU-wise this turns a
    1000-step serial argmax loop into ~N/512 blocked VPU stages.

    Measured on the real v5e chip the trade does NOT pay at protocol
    shapes: 6000->1000 with all 1000 picks forced runs 0.86 ms via
    ``nms_fixed`` vs 2.02 ms here (outputs bit-identical) — XLA's
    while_loop overhead per pick is far below the blocked path's extra
    [T, N] IoU work. Kept as an exact alternative for shapes where the
    pick count (not the IoU bandwidth) dominates.
    """
    N = boxes.shape[0]
    s = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    # stable score-descending order == nms_fixed's argmax
    # first-index tie-break
    order = jnp.argsort(-s, stable=True)
    bb = boxes[order]
    base = s[order] > -jnp.inf            # pickable at all
    areas = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])

    T = min(block, N)
    nb = -(-N // T)
    Np = nb * T
    if Np != N:
        bb = jnp.pad(bb, ((0, Np - N), (0, 0)))
        base = jnp.pad(base, (0, Np - N))
        areas = jnp.pad(areas, (0, Np - N))

    def iou_rows(cur, cur_areas):
        # [T, Np]: IoU of the block's boxes against every sorted box,
        # same f32 expression as nms_fixed's iou_row
        lt = jnp.maximum(cur[:, None, :2], bb[None, :, :2])
        rb = jnp.minimum(cur[:, None, 2:], bb[None, :, 2:])
        wh = jnp.clip(rb - lt, 0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (cur_areas[:, None] + areas[None, :] - inter)

    def block_step(keep, i):
        lo = i * T
        cur = jax.lax.dynamic_slice(bb, (lo, 0), (T, 4))
        cur_areas = jax.lax.dynamic_slice(areas, (lo,), (T,))
        cur_base = jax.lax.dynamic_slice(base, (lo,), (T,))
        iou = iou_rows(cur, cur_areas)                     # [T, Np]
        gidx = jnp.arange(Np)
        # suppressed by a finalised survivor of an earlier block
        prev = (iou > iou_thresh) & keep[None, :] & (gidx[None, :] < lo)
        cur_base = cur_base & ~prev.any(axis=1)
        # within-block: S[u, t] ⇔ u precedes t and suppresses it
        S = jax.lax.dynamic_slice(iou, (0, lo), (T, T)) > iou_thresh
        tidx = jnp.arange(T)
        S = S & (tidx[:, None] < tidx[None, :])

        def fix_cond(st):
            alive, changed = st
            return changed

        def fix_body(st):
            alive, _ = st
            new = cur_base & ~(S & alive[:, None]).any(axis=0)
            return new, jnp.any(new != alive)

        alive, _ = jax.lax.while_loop(fix_cond, fix_body,
                                      (cur_base, jnp.bool_(True)))
        keep = jax.lax.dynamic_update_slice(keep, alive, (lo,))
        return keep, None

    keep, _ = jax.lax.scan(block_step, jnp.zeros((Np,), bool),
                           jnp.arange(nb))
    keep = keep[:N]
    # first max_out survivors in sorted (= pick) order, like nms_fixed
    rank = jnp.cumsum(keep) - 1
    slot = jnp.where(keep & (rank < max_out), rank, max_out)
    idxs = jnp.zeros((max_out,), jnp.int32).at[slot].set(
        order.astype(jnp.int32), mode="drop")
    ok = jnp.arange(max_out) < jnp.minimum(keep.sum(), max_out)
    return idxs, ok


def roi_pool(features: jnp.ndarray, boxes: jnp.ndarray,
             output_size: int, spatial_scale: float,
             chunk: int = 2) -> jnp.ndarray:
    """torchvision ``roi_pool`` (the reference ROIPooler's level pooler):
    [H, W, C] features × [K, 4] xyxy boxes → [K, P, P, C].

    Per torchvision's kernel: box coords are round()-quantised after
    scaling, ROI width/height use the +1 convention with a min of 1,
    each output bin spans [floor(p·bin), ceil((p+1)·bin)) clipped to the
    feature map, bins are MAX-pooled, and empty bins yield 0.

    TPU shape: instead of per-bin dynamic loops, the 2D bin max is
    factorised into two masked-max passes (x then y) over a static
    candidate window of K_cand pixels per axis, and boxes are processed
    in ``chunk``-sized lax.map slices to bound the intermediate size.
    ``chunk`` trades lax.map trip count against per-step intermediate
    size; measured on v5e (1000 VG rois, 800x1216): chunk 2 keeps the
    [H, P*K_cand, C] gather fused in VMEM and runs ~3x faster than
    chunk 32 (41 ms vs 121 ms), with 1/4/8+ all slower — keep it tiny.
    """
    H, W, C = features.shape
    P = output_size
    # widest possible bin: ceil(roi/P)+1 pixels; roi ≤ max(H, W)+2
    K_cand = int(np.ceil((max(H, W) + 2) / P)) + 2
    kk = jnp.arange(K_cand)

    def one_box(box):
        # exact-integer bin boundaries, shared with the Pallas kernel
        # (ops/roi_pool_pallas.roi_bin_bounds — the single copy of the
        # round-quantisation + floor/ceil arithmetic both paths must
        # agree on bit-exactly)
        hs, he, ws, we = (a[0] for a in roi_bin_bounds(
            box[None], P, spatial_scale, H, W))

        # pass 1 — masked max along x per (row, x-bin)
        idx_x = jnp.clip(ws[:, None] + kk[None, :], 0, W - 1)     # [P, K]
        ok_x = (ws[:, None] + kk[None, :]) < we[:, None]          # [P, K]
        g = features[:, idx_x.reshape(-1), :].reshape(H, P, K_cand, C)
        t1 = jnp.max(jnp.where(ok_x[None, :, :, None], g, -jnp.inf),
                     axis=2)                                       # [H, P, C]
        # pass 2 — masked max along y per (y-bin, x-bin)
        idx_y = jnp.clip(hs[:, None] + kk[None, :], 0, H - 1)     # [P, K]
        ok_y = (hs[:, None] + kk[None, :]) < he[:, None]
        g2 = t1[idx_y.reshape(-1)].reshape(P, K_cand, P, C)
        out = jnp.max(jnp.where(ok_y[:, :, None, None], g2, -jnp.inf),
                      axis=1)                                      # [P, P, C]
        empty = (he <= hs)[:, None] | (we <= ws)[None, :]
        return jnp.where(empty[..., None] | ~jnp.isfinite(out), 0.0, out)

    K = boxes.shape[0]
    n_chunks = -(-K // chunk)
    padded = jnp.concatenate(
        [boxes, jnp.zeros((n_chunks * chunk - K, 4), boxes.dtype)], axis=0)
    pooled = lax.map(jax.vmap(one_box),
                     padded.reshape(n_chunks, chunk, 4))
    return pooled.reshape(n_chunks * chunk, P, P, C)[:K]


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: FrcnnConfig = FRCNN_VG,
                dtype: jnp.dtype = jnp.float32) -> Dict[str, Any]:
    ks = jax.random.split(key, 10)
    nrm = lambda k, shape, s=0.01: (jax.random.normal(k, shape) * s).astype(dtype)
    zeros = lambda shape: jnp.zeros(shape, dtype)
    backbone = resnet.init_params(ks[0], cfg.stages, dtype=dtype)
    # C4 backbone: features from res4 (layers[0..2]); res5 is the head
    A = len(cfg.anchor_sizes) * len(cfg.aspect_ratios)
    C4 = 1024
    Dh = cfg.rpn_hidden_dim if cfg.rpn_hidden_dim > 0 else C4
    return {
        "backbone": backbone,
        "rpn": {
            "conv": {"w": nrm(ks[1], (3, 3, C4, Dh)), "b": zeros((Dh,))},
            "objectness": {"w": nrm(ks[2], (1, 1, Dh, A)), "b": zeros((A,))},
            "deltas": {"w": nrm(ks[3], (1, 1, Dh, A * 4)),
                       "b": zeros((A * 4,))},
        },
        # background LAST (detectron2 convention; do_nms drops scores[:, -1])
        "cls_score": {"w": nrm(ks[4], (2048, cfg.num_classes + 1)),
                      "b": zeros((cfg.num_classes + 1,))},
        "bbox_pred": {
            "w": nrm(ks[5],
                     (2048, 4 if cfg.cls_agnostic_bbox_reg
                      else cfg.num_classes * 4), s=0.001),
            "b": zeros((4 if cfg.cls_agnostic_bbox_reg
                        else cfg.num_classes * 4,))},
        "attr_cls_emb": nrm(ks[6], (cfg.num_classes + 1, 2048 // 8), s=1.0),
        "attr_fc": {"w": nrm(ks[7], (2048 + 2048 // 8, 2048 // 4)),
                    "b": zeros((2048 // 4,))},
        "attr_score": {"w": nrm(ks[8], (2048 // 4, cfg.num_attrs + 1)),
                       "b": zeros((cfg.num_attrs + 1,))},
    }


def _res4_features(params, images, cfg: FrcnnConfig):
    """Backbone through res4 (C4): stop before the last stage."""
    x = jax.nn.relu(resnet.frozen_bn(
        resnet.conv(images, params["backbone"]["conv1"]["w"], stride=2),
        params["backbone"]["bn1"]))
    x = (resnet.max_pool_3x3_s2_caffe(x) if cfg.caffe_maxpool
         else resnet.max_pool_3x3_s2(x))
    for si, blocks in enumerate(params["backbone"]["layers"][:3]):
        stage_stride = 1 if si == 0 else 2
        for bi, bp in enumerate(blocks):
            x = resnet.bottleneck(x, bp, stride=stage_stride if bi == 0 else 1,
                                  stride_in_1x1=cfg.stride_in_1x1)
    return x


def _res5_head(params, rois, cfg: FrcnnConfig):
    """res5 stage on pooled features [K, P, P, 1024] → [K, 2048].

    VG modification (RES5HALVE=False, modeling_frcnn.py:1494-1502):
    block-0 stride 2 → 1 (conv1 AND shortcut) and every 3×3 conv gets
    dilation 2 / padding 2, preserving the 14×14 spatial size."""
    x = rois
    halve = cfg.res5_halve
    for bi, bp in enumerate(params["backbone"]["layers"][3]):
        stride = (2 if bi == 0 else 1) if halve else 1
        x = resnet.bottleneck(x, bp, stride=stride,
                              dilation=1 if halve else 2,
                              stride_in_1x1=cfg.stride_in_1x1)
    return x.mean(axis=(1, 2))


def forward(
    params: Dict[str, Any],
    image: jnp.ndarray,              # [H, W, 3], preprocessed
    cfg: FrcnnConfig = FRCNN_VG,
) -> Dict[str, jnp.ndarray]:
    """Single-image detection → padded {roi_features [M, 2048],
    boxes [M, 4] xyxy pixels, normalized_boxes, obj_ids, obj_probs,
    attr_ids, attr_probs, valid [M]} with M = max_detections."""
    H, W, _ = image.shape
    feats = _res4_features(params, image[None], cfg)[0]   # [Hf, Wf, 1024]
    Hf, Wf, _ = feats.shape

    # --- RPN (RPNHead :1453-1497 → find_top_rpn_proposals) ------------------
    rpn = params["rpn"]
    t = jax.nn.relu(resnet.conv(feats[None], rpn["conv"]["w"]) +
                    rpn["conv"]["b"])[0]
    obj = (resnet.conv(t[None], rpn["objectness"]["w"])
           + rpn["objectness"]["b"])[0].reshape(-1)        # [Hf*Wf*A]
    deltas = (resnet.conv(t[None], rpn["deltas"]["w"])
              + rpn["deltas"]["b"])[0].reshape(-1, 4)
    anchors = anchor_grid(Hf, Wf, cfg)
    proposals = apply_deltas(anchors, deltas, cfg.rpn_box_weights)

    k_pre = min(cfg.pre_nms_topk, proposals.shape[0])
    top_scores, top_idx = jax.lax.top_k(obj, k_pre)
    top_boxes = clip_boxes(proposals[top_idx], H, W)
    if cfg.nms_impl == "blocked":
        nms_fn = nms_blocked
    elif cfg.nms_impl == "argmax":
        nms_fn = nms_fixed
    else:
        raise ValueError(f"unknown nms_impl {cfg.nms_impl!r} "
                         "(expected 'argmax' or 'blocked')")
    keep_idx, keep_ok = nms_fn(top_boxes, top_scores,
                               cfg.rpn_nms_thresh, cfg.post_nms_topk,
                               valid=nonempty(top_boxes))
    rois = top_boxes[keep_idx]                             # [post_nms, 4]

    # --- ROI heads: RoIPool + res5 (Res5ROIHeads :1415-1450) -----------------
    if cfg.roi_pool_impl == "pallas":
        from transformer_mm_explainability_tpu.ops import roi_pool_pallas

        pooled = roi_pool_pallas.roi_pool_pallas(
            feats, rois, cfg.pooler_resolution, 1.0 / cfg.feat_stride)
    elif cfg.roi_pool_impl == "xla":
        pooled = roi_pool(feats, rois, cfg.pooler_resolution,
                          1.0 / cfg.feat_stride)
    else:
        raise ValueError(
            f"unknown roi_pool_impl {cfg.roi_pool_impl!r} "
            "(expected 'xla' or 'pallas')")
    feat_vec = _res5_head(params, pooled, cfg)             # [post_nms, 2048]
    logits = feat_vec @ params["cls_score"]["w"] + params["cls_score"]["b"]
    scores = jax.nn.softmax(logits, -1)                    # [N, K+1], bg LAST
    box_deltas = feat_vec @ params["bbox_pred"]["w"] + params["bbox_pred"]["b"]

    # --- detection selection (do_nms :116-140) -------------------------------
    # class-max over the foreground columns; the regressed box of the max
    # class; ONE NMS over all proposals, first MAX_DETECTIONS kept — no
    # score threshold (do_nms accepts and ignores it)
    cls_prob = scores[:, :-1]
    best_prob = cls_prob.max(-1)
    best_cls = cls_prob.argmax(-1)
    N_p = rois.shape[0]
    if box_deltas.shape[-1] == 4:      # class-agnostic variant
        boxes = clip_boxes(
            apply_deltas(rois, box_deltas, cfg.box_weights), H, W)
    else:                              # per-class regression (VG)
        Kc = box_deltas.shape[-1] // 4
        rep = jnp.repeat(rois, Kc, axis=0)                 # [N*K, 4]
        all_boxes = clip_boxes(
            apply_deltas(rep, box_deltas.reshape(N_p * Kc, 4),
                         cfg.box_weights), H, W).reshape(N_p, Kc, 4)
        boxes = jnp.take_along_axis(
            all_boxes, best_cls[:, None, None].astype(jnp.int32), axis=1
        )[:, 0]
    final_idx, det_ok = nms_fn(boxes, best_prob, cfg.detection_nms_thresh,
                               cfg.max_detections, valid=keep_ok)

    out_boxes = boxes[final_idx]
    norm = out_boxes / jnp.asarray([W, H, W, H], jnp.float32)
    obj_probs = best_prob[final_idx]
    obj_ids = best_cls[final_idx]
    roi_features = feat_vec[final_idx]

    # attribute head (FastRCNNOutputLayers :1643-1655 + _predict_attrs
    # :1165-1168): class embedding of the argmax over ALL classes
    # (background included); attr softmax drops the LAST logit
    emb_cls = logits.argmax(-1)[final_idx]
    cls_emb = params["attr_cls_emb"][emb_cls]
    ah = jax.nn.relu(
        jnp.concatenate([roi_features, cls_emb], -1)
        @ params["attr_fc"]["w"] + params["attr_fc"]["b"])
    attr_logits = ah @ params["attr_score"]["w"] + params["attr_score"]["b"]
    attr_prob = jax.nn.softmax(attr_logits[:, :-1], -1)
    return {
        "roi_features": roi_features,
        "boxes": out_boxes,
        "normalized_boxes": norm,
        "obj_ids": obj_ids,
        "obj_probs": obj_probs,
        "attr_ids": attr_prob.argmax(-1),
        "attr_probs": attr_prob.max(-1),
        # reference runs MIN_DETECTIONS == MAX_DETECTIONS == 36; with a
        # realistic image every slot holds a real (NMS-surviving) box
        "valid": det_ok,
        "rois": rois,
        "roi_valid": keep_ok,
        "roi_scores": top_scores[keep_idx],
        "det_scores": best_prob,
    }


def preprocess(image_u8: jnp.ndarray, target_shortest: int = 800,
               longest_cap: int = 1333,
               pixel_mean: Sequence[float] = (102.9801, 115.9465, 122.7717),
               pixel_std: Sequence[float] = (1.0, 1.0, 1.0),
               ) -> jnp.ndarray:
    """detectron2-caffe preprocessing (processing_image.py:29-134):
    BGR channel order, (x - mean) / std (std = 1), resize shortest edge
    with the int(x + 0.5) size rounding. Input RGB uint8 [H, W, 3]."""
    from transformer_mm_explainability_tpu.ops import image as img_ops

    img = image_u8.astype(jnp.float32)[..., ::-1]  # RGB → BGR
    img = (img - jnp.asarray(pixel_mean, jnp.float32)) / jnp.asarray(
        pixel_std, jnp.float32)
    return img_ops.resize_shortest_edge(img, target_shortest, longest_cap,
                                        method="bilinear")
