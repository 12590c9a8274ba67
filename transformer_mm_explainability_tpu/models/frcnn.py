"""Faster R-CNN visual frontend (the LXMERT feature extractor, C10).

Equivalent of the reference's vendored detectron2 port
(lxmert/lxmert/src/modeling_frcnn.py: ResNet backbone :943, RPN +
AnchorGenerator :1352-1592, ROIPooler :1056, Res5ROIHeads :1251,
ROIOutputs NMS/decode :1137, GeneralizedRCNN :1660-1922) producing 36
ROI features (2048-d) + normalised boxes for LXMERT.

TPU-first design — every stage is static-shape:
  * anchors precomputed per feature-grid size;
  * proposal selection = top-K by objectness (padded, validity-masked);
  * NMS = fixed-iteration argmax-suppress loop (lax.fori_loop over the
    output budget) instead of data-dependent loops;
  * ROIAlign = bilinear gather (detectron2 v2 semantics, sampling
    ratio 2 on a regular sub-grid);
  * detection head keeps exactly ``max_detections`` boxes (the
    reference pads to 36, perturbation.py:55-57).

The caffe-style backbone (stride on the 1×1 convs) is models/resnet
with ``stride_in_1x1``; weights load from the HF
``unc-nlp/frcnn-vg-finetuned`` checkpoint via utils/convert.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from transformer_mm_explainability_tpu.models import resnet
from transformer_mm_explainability_tpu.utils import box_ops


@dataclasses.dataclass(frozen=True)
class FrcnnConfig:
    # backbone: ResNet-101 C4 (stages 1-3 used for features, res5 = head)
    stages: Tuple[int, ...] = (3, 4, 23, 3)
    stride_in_1x1: bool = True
    feat_stride: int = 16
    # anchors
    anchor_sizes: Tuple[float, ...] = (32, 64, 128, 256, 512)
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # RPN
    pre_nms_topk: int = 6000
    post_nms_topk: int = 300
    rpn_nms_thresh: float = 0.7
    # ROI heads
    pooler_resolution: int = 14
    sampling_ratio: int = 2
    num_classes: int = 1600
    num_attrs: int = 400
    score_thresh: float = 0.2
    detection_nms_thresh: float = 0.5
    max_detections: int = 36
    # box transform weights (detectron2 defaults for RPN / box head)
    rpn_box_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    box_weights: Tuple[float, ...] = (10.0, 10.0, 5.0, 5.0)


FRCNN_VG = FrcnnConfig()


# ---------------------------------------------------------------------------
# anchors & box transform
# ---------------------------------------------------------------------------

def anchor_grid(feat_h: int, feat_w: int, cfg: FrcnnConfig) -> jnp.ndarray:
    """[H*W*A, 4] xyxy anchors, detectron2 layout (cell-major, then
    anchor index; centred at stride/2 offsets... detectron2 uses
    (x+0.5)*stride shifts with centre 0 bases)."""
    bases = []
    for size in cfg.anchor_sizes:
        area = size * size
        for ratio in cfg.aspect_ratios:
            w = (area / ratio) ** 0.5
            h = w * ratio
            bases.append([-w / 2, -h / 2, w / 2, h / 2])
    bases = jnp.asarray(bases)                      # [A, 4]
    shifts_x = (jnp.arange(feat_w) + 0.5) * cfg.feat_stride
    shifts_y = (jnp.arange(feat_h) + 0.5) * cfg.feat_stride
    sx, sy = jnp.meshgrid(shifts_x, shifts_y)       # [H, W]
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    return (shifts + bases[None]).reshape(-1, 4)


def apply_deltas(boxes: jnp.ndarray, deltas: jnp.ndarray,
                 weights: Sequence[float],
                 scale_clamp: float = 4.135166556742356) -> jnp.ndarray:
    """Box2BoxTransform.apply_deltas (dx,dy,dw,dh on cxcywh)."""
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


def nms_fixed(boxes: jnp.ndarray, scores: jnp.ndarray,
              iou_thresh: float, max_out: int,
              valid: Optional[jnp.ndarray] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static-shape NMS: ``max_out`` iterations of argmax + suppress.
    Returns (indices [max_out], keep_valid [max_out])."""
    N = boxes.shape[0]
    s = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    iou, _ = box_ops.box_iou(boxes, boxes)

    def body(i, carry):
        s, idxs, ok = carry
        j = jnp.argmax(s)
        good = s[j] > -jnp.inf
        idxs = idxs.at[i].set(j)
        ok = ok.at[i].set(good)
        suppress = iou[j] > iou_thresh
        s = jnp.where(suppress, -jnp.inf, s)
        s = s.at[j].set(-jnp.inf)
        return s, idxs, ok

    _, idxs, ok = jax.lax.fori_loop(
        0, max_out, body,
        (s, jnp.zeros((max_out,), jnp.int32), jnp.zeros((max_out,), bool)))
    return idxs, ok


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray,
              output_size: int, spatial_scale: float,
              sampling_ratio: int = 2) -> jnp.ndarray:
    """ROIAlign v2 (aligned=True): [H, W, C] features × [K, 4] xyxy
    boxes → [K, out, out, C]. Bilinear sampling on a regular
    sampling_ratio × sampling_ratio sub-grid per bin, averaged."""
    H, W, C = features.shape
    sr = sampling_ratio

    def one_box(box):
        x0, y0, x1, y1 = box * spatial_scale
        # aligned=True: offset by -0.5 (continuous coordinates)
        bw = jnp.maximum(x1 - x0, 1e-6) / output_size
        bh = jnp.maximum(y1 - y0, 1e-6) / output_size
        # sample positions: for bin i, samples at (i + (k+0.5)/sr) * bin
        ii = jnp.arange(output_size)
        kk = (jnp.arange(sr) + 0.5) / sr
        ys = (y0 + (ii[:, None] + kk[None, :]) * bh).reshape(-1) - 0.5
        xs = (x0 + (ii[:, None] + kk[None, :]) * bw).reshape(-1) - 0.5

        def bilinear(y, x):
            y = jnp.clip(y, 0.0, H - 1.0)
            x = jnp.clip(x, 0.0, W - 1.0)
            y0i = jnp.floor(y).astype(jnp.int32)
            x0i = jnp.floor(x).astype(jnp.int32)
            y1i = jnp.minimum(y0i + 1, H - 1)
            x1i = jnp.minimum(x0i + 1, W - 1)
            ly, lx = y - y0i, x - x0i
            v = (features[y0i, x0i] * (1 - ly) * (1 - lx)
                 + features[y0i, x1i] * (1 - ly) * lx
                 + features[y1i, x0i] * ly * (1 - lx)
                 + features[y1i, x1i] * ly * lx)
            return v

        samples = jax.vmap(
            lambda y: jax.vmap(lambda x: bilinear(y, x))(xs)
        )(ys)  # [oy*sr, ox*sr, C]
        samples = samples.reshape(output_size, sr, output_size, sr, C)
        return samples.mean(axis=(1, 3))

    return jax.vmap(one_box)(boxes)


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
    return {
        "backbone": backbone,
        "rpn": {
            "conv": {"w": nrm(ks[1], (3, 3, C4, C4)), "b": zeros((C4,))},
            "objectness": {"w": nrm(ks[2], (1, 1, C4, A)), "b": zeros((A,))},
            "deltas": {"w": nrm(ks[3], (1, 1, C4, A * 4)),
                       "b": zeros((A * 4,))},
        },
        "cls_score": {"w": nrm(ks[4], (2048, cfg.num_classes + 1)),
                      "b": zeros((cfg.num_classes + 1,))},
        "bbox_pred": {"w": nrm(ks[5], (2048, 4)), "b": zeros((4,))},
        "attr_cls_emb": nrm(ks[6], (cfg.num_classes + 1, 256)),
        "attr_fc": {"w": nrm(ks[7], (2048 + 256, 512)), "b": zeros((512,))},
        "attr_score": {"w": nrm(ks[8], (512, cfg.num_attrs + 1)),
                       "b": zeros((cfg.num_attrs + 1,))},
    }


def _res4_features(params, images, cfg: FrcnnConfig):
    """Backbone through res4 (C4): stop before the last stage."""
    x = jax.nn.relu(resnet.frozen_bn(
        resnet.conv(images, params["backbone"]["conv1"]["w"], stride=2),
        params["backbone"]["bn1"]))
    x = resnet.max_pool_3x3_s2(x)
    for si, blocks in enumerate(params["backbone"]["layers"][:3]):
        stage_stride = 1 if si == 0 else 2
        for bi, bp in enumerate(blocks):
            x = resnet.bottleneck(x, bp, stride=stage_stride if bi == 0 else 1,
                                  stride_in_1x1=cfg.stride_in_1x1)
    return x


def _res5_head(params, rois, cfg: FrcnnConfig):
    """res5 stage on pooled features [K, P, P, 1024] → [K, 2048]."""
    x = rois
    for bi, bp in enumerate(params["backbone"]["layers"][3]):
        x = resnet.bottleneck(x, bp, stride=2 if bi == 0 else 1,
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

    # --- RPN ---------------------------------------------------------------
    rpn = params["rpn"]
    t = jax.nn.relu(resnet.conv(feats[None], rpn["conv"]["w"]) +
                    rpn["conv"]["b"])[0]
    obj = (resnet.conv(t[None], rpn["objectness"]["w"])
           + rpn["objectness"]["b"])[0].reshape(-1)        # [Hf*Wf*A]
    deltas = (resnet.conv(t[None], rpn["deltas"]["w"])
              + rpn["deltas"]["b"])[0].reshape(-1, 4)
    anchors = anchor_grid(Hf, Wf, cfg)
    proposals = clip_boxes(
        apply_deltas(anchors, deltas, cfg.rpn_box_weights), H, W)

    k_pre = min(cfg.pre_nms_topk, proposals.shape[0])
    top_scores, top_idx = jax.lax.top_k(obj, k_pre)
    top_boxes = proposals[top_idx]
    keep_idx, keep_ok = nms_fixed(top_boxes, top_scores,
                                  cfg.rpn_nms_thresh, cfg.post_nms_topk)
    rois = top_boxes[keep_idx]                             # [post_nms, 4]

    # --- ROI heads (res5) ----------------------------------------------------
    pooled = roi_align(feats, rois, cfg.pooler_resolution,
                       1.0 / cfg.feat_stride, cfg.sampling_ratio)
    feat_vec = _res5_head(params, pooled, cfg)             # [post_nms, 2048]
    scores = jax.nn.softmax(
        feat_vec @ params["cls_score"]["w"] + params["cls_score"]["b"], -1)
    box_deltas = feat_vec @ params["bbox_pred"]["w"] + params["bbox_pred"]["b"]
    boxes = clip_boxes(
        apply_deltas(rois, box_deltas, cfg.box_weights), H, W)

    # --- detection selection (class-agnostic single delta, VG style) --------
    cls_prob = scores[:, 1:]                    # drop background
    best_prob = cls_prob.max(-1)
    best_cls = cls_prob.argmax(-1)
    det_valid = keep_ok & (best_prob > cfg.score_thresh)
    det_idx, det_ok = nms_fixed(boxes, best_prob, cfg.detection_nms_thresh,
                                cfg.max_detections, valid=det_valid)
    # pad-to-max semantics of the reference (min=max=36): below-threshold
    # slots are filled by the highest-score remaining boxes
    fill_idx, _ = nms_fixed(boxes, best_prob, cfg.detection_nms_thresh,
                            cfg.max_detections, valid=keep_ok)
    final_idx = jnp.where(det_ok, det_idx, fill_idx)

    out_boxes = boxes[final_idx]
    norm = out_boxes / jnp.asarray([W, H, W, H], jnp.float32)
    obj_probs = best_prob[final_idx]
    obj_ids = best_cls[final_idx]
    roi_features = feat_vec[final_idx]

    # attribute head (modeling_frcnn ROIOutputs attr path)
    cls_emb = params["attr_cls_emb"][obj_ids + 1]
    ah = jax.nn.relu(
        jnp.concatenate([roi_features, cls_emb], -1)
        @ params["attr_fc"]["w"] + params["attr_fc"]["b"])
    attr_scores = jax.nn.softmax(
        ah @ params["attr_score"]["w"] + params["attr_score"]["b"], -1)
    return {
        "roi_features": roi_features,
        "boxes": out_boxes,
        "normalized_boxes": norm,
        "obj_ids": obj_ids,
        "obj_probs": obj_probs,
        "attr_ids": attr_scores[:, 1:].argmax(-1),
        "attr_probs": attr_scores[:, 1:].max(-1),
        # reference runs MIN_DETECTIONS == MAX_DETECTIONS == 36: every
        # slot is used (below-threshold slots backfilled above)
        "valid": jnp.ones_like(det_ok),
        "above_threshold": det_ok,
    }


def preprocess(image_u8: jnp.ndarray, target_shortest: int = 800,
               longest_cap: int = 1333,
               pixel_mean: Sequence[float] = (102.9801, 115.9465, 122.7717),
               ) -> jnp.ndarray:
    """detectron2-caffe preprocessing (processing_image.py:29-134):
    BGR channel order, mean subtraction (no std), resize shortest edge.
    Input RGB uint8 [H, W, 3]."""
    from transformer_mm_explainability_tpu.ops import image as img_ops

    img = image_u8.astype(jnp.float32)[..., ::-1]  # RGB → BGR
    img = img - jnp.asarray(pixel_mean, jnp.float32)
    return img_ops.resize_shortest_edge(img, target_shortest, longest_cap,
                                        method="bilinear")
