"""Visualization utilities (SURVEY C38) without cv2/captum.

  * JET colormap + heatmap overlay (the notebooks' show_cam_on_image),
  * per-token text heatmap as HTML (captum visualize_text equivalent),
  * box overlay rendering (SingleImageViz / save_image_vis equivalent)
    via PIL.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


def jet_colormap(x: np.ndarray) -> np.ndarray:
    """values in [0,1] → RGB in [0,1] (cv2 COLORMAP_JET equivalent)."""
    x = np.clip(x, 0.0, 1.0)
    four_x = 4.0 * x
    r = np.clip(np.minimum(four_x - 1.5, -four_x + 4.5), 0, 1)
    g = np.clip(np.minimum(four_x - 0.5, -four_x + 3.5), 0, 1)
    b = np.clip(np.minimum(four_x + 0.5, -four_x + 2.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def show_cam_on_image(image: np.ndarray, cam: np.ndarray) -> np.ndarray:
    """Overlay a [H, W] relevancy map on a [H, W, 3] image in [0,1]
    (ViT/CLIP notebooks' show_cam_on_image: heatmap + img, /max)."""
    heatmap = jet_colormap(cam)
    out = heatmap + image.astype(np.float32)
    return out / out.max()


def relevancy_figure(image: np.ndarray, relevancy: np.ndarray,
                     grid_hw: Tuple[int, int]) -> np.ndarray:
    """Patch relevancy → upsampled, normalised overlay (the notebooks'
    generate_visualization): reshape to the grid, bilinear to image
    size, min-max, JET overlay. Returns uint8 RGB."""
    from transformer_mm_explainability_tpu.ops.image import (
        min_max_normalize, upsample_relevancy)
    import jax.numpy as jnp

    H, W = image.shape[:2]
    up = np.asarray(upsample_relevancy(jnp.asarray(relevancy), grid_hw, (H, W)))
    up = np.asarray(min_max_normalize(jnp.asarray(up)))
    img = image.astype(np.float32)
    img = (img - img.min()) / max(img.max() - img.min(), 1e-9)
    return (show_cam_on_image(img, up) * 255).astype(np.uint8)


def text_heatmap_html(tokens: Sequence[str], scores: Sequence[float],
                      title: str = "") -> str:
    """Per-token heatmap (green-shaded spans, captum-style)."""
    scores = np.asarray(scores, np.float32)
    if scores.max() > scores.min():
        norm = (scores - scores.min()) / (scores.max() - scores.min())
    else:
        norm = np.zeros_like(scores)
    spans = "".join(
        f'<span style="background-color: rgba(0, 180, 0, {a:.2f}); '
        f'padding: 1px 2px; margin: 1px; border-radius: 2px;">{t}</span>'
        for t, a in zip(tokens, norm))
    head = f"<b>{title}</b><br>" if title else ""
    return f'<div style="font-family: monospace">{head}{spans}</div>'


def draw_boxes(image: np.ndarray, boxes_xyxy: np.ndarray,
               labels: Optional[List[str]] = None,
               scores: Optional[np.ndarray] = None,
               width: int = 2) -> np.ndarray:
    """Box overlay via PIL (visualizing_image.py SingleImageViz
    equivalent). image uint8 [H, W, 3], boxes in pixels."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(image.astype(np.uint8))
    draw = ImageDraw.Draw(img)
    palette = [(255, 64, 64), (64, 160, 255), (64, 220, 64),
               (255, 180, 40), (200, 90, 255), (255, 120, 200)]
    for i, box in enumerate(np.asarray(boxes_xyxy)):
        color = palette[i % len(palette)]
        draw.rectangle([float(box[0]), float(box[1]),
                        float(box[2]), float(box[3])],
                       outline=color, width=width)
        text = None
        if labels is not None:
            text = labels[i]
        if scores is not None:
            s = f"{float(scores[i]):.2f}"
            text = f"{text} {s}" if text else s
        if text:
            draw.text((float(box[0]) + 2, float(box[1]) + 2), text,
                      fill=color)
    return np.asarray(img)


def mask_overlay(image: np.ndarray, masks: np.ndarray,
                 alpha: float = 0.5) -> np.ndarray:
    """Instance-mask overlay: [K, H, W] binary masks tinted per
    instance (DETR panoptic-style display). Returns uint8."""
    out = image.astype(np.float32).copy()
    palette = np.asarray([(255, 64, 64), (64, 160, 255), (64, 220, 64),
                          (255, 180, 40), (200, 90, 255)], np.float32)
    for i, m in enumerate(np.asarray(masks)):
        color = palette[i % len(palette)]
        out = np.where(m[..., None] > 0.5,
                       (1 - alpha) * out + alpha * color, out)
    return np.clip(out, 0, 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 8, padding: int = 2,
              pad_value: float = 0.0) -> np.ndarray:
    """torchvision.utils.make_grid semantics on [N, H, W, C] numpy:
    row-major tiling with ``padding`` pixels between cells."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = min(nrow, n)
    nr = -(-n // ncol)
    H = nr * (h + padding) + padding
    W = ncol * (w + padding) + padding
    grid = np.full((H, W, c), pad_value, images.dtype)
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[y:y + h, x:x + w] = images[idx]
    return grid


def visualize_images(images, size=(224, 224), nrow: int = 8,
                     show: bool = False) -> np.ndarray:
    """mmf/utils/visualize.py:9-47: resize a list of images to a common
    size, tile into a grid; optionally draw with matplotlib.  Accepts
    HWC arrays or PIL images; returns the grid array."""
    assert size is not None or len(images) == 1, (
        "If size is not passed, only one image can be visualized")
    arrays = []
    for im in images:
        arr = np.asarray(im)
        if np.issubdtype(arr.dtype, np.integer):
            arr = arr.astype(np.float32) / 255.0
        arr = arr.astype(np.float32)
        if size is not None and arr.shape[:2] != tuple(size):
            import jax.numpy as jnp

            from transformer_mm_explainability_tpu.ops.image import resize
            arr = np.asarray(resize(jnp.asarray(arr), tuple(size)))
        arrays.append(arr)
    grid = make_grid(np.stack(arrays), nrow=nrow)
    if show:  # pragma: no cover - display path
        import matplotlib.pyplot as plt
        plt.axis("off")
        plt.imshow(grid)
    return grid


def load_scalar_logs(log_dirs, log_name: str = "scalars.jsonl"):
    """Read one or more ScalarLogger jsonl streams →
    {dir: {field: (steps, values)}} (the data layer of
    DETR/util/plot_utils.plot_logs:13-70 without pandas)."""
    import json as _json
    import os

    if isinstance(log_dirs, (str, os.PathLike)):
        log_dirs = [log_dirs]
    out = {}
    for d in log_dirs:
        path = os.path.join(str(d), log_name)
        series: dict = {}
        with open(path) as f:
            for line in f:
                rec = _json.loads(line)
                step = rec.get("step", 0)
                for k, v in rec.items():
                    if k in ("step", "time") or not isinstance(
                            v, (int, float)):
                        continue
                    series.setdefault(k, ([], []))
                    series[k][0].append(step)
                    series[k][1].append(float(v))
        out[str(d)] = series
    return out


def plot_logs(log_dirs, fields=("loss",), ewm_alpha: float = 0.0,
              log_name: str = "scalars.jsonl", show: bool = False):
    """plot_logs (DETR/util/plot_utils.py:13-70) over ScalarLogger
    streams: one subplot per field, one line per log dir, optional
    exponential smoothing.  Returns {dir: {field: smoothed values}}
    so callers can assert without a display."""
    data = load_scalar_logs(log_dirs, log_name)
    smoothed = {}
    for d, series in data.items():
        smoothed[d] = {}
        for field in fields:
            if field not in series:
                continue
            steps, vals = series[field]
            if ewm_alpha > 0:
                acc, out = None, []
                for v in vals:
                    acc = v if acc is None else (
                        ewm_alpha * acc + (1 - ewm_alpha) * v)
                    out.append(acc)
                vals = out
            smoothed[d][field] = (steps, vals)
    if show:  # pragma: no cover - display path
        import matplotlib.pyplot as plt
        n = len(fields)
        fig, axes = plt.subplots(1, n, figsize=(5 * n, 4))
        if n == 1:
            axes = [axes]
        for ax, field in zip(axes, fields):
            for d in smoothed:
                if field in smoothed[d]:
                    ax.plot(*smoothed[d][field], label=d)
            ax.set_title(field)
            ax.legend()
    return smoothed
