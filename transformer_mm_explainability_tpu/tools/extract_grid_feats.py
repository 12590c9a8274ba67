"""ResNet-152 pool5 grid-feature extraction (C29/C34 tooling).

Re-design of
``VisualBERT/tools/scripts/features/extract_resnet152_feat.py``: run
the TPU-native ResNet trunk (``models/resnet`` — through layer4, no
avgpool/fc, the same ``children()[:-2]`` cut the reference takes) over
an image folder and save one ``[1, H/32, W/32, 2048]`` NHWC ``.npy``
per image (the reference permutes NCHW→NHWC before saving, :112).

Protocol knobs match the reference: 448×448 resize, ImageNet
mean/std normalisation, ``image_id % total_group == group_id``
sharding for multi-worker runs (:99), ``.lock`` directories marking
in-flight writes — a finished ``.npy`` with no lock is skipped on
re-runs, while one left with a stale lock (crashed worker) is
regenerated (:105-119) — and grey-scale expansion to 3 channels
(:55-57).

TPU notes: images are batched host-side and the trunk is jitted once
for the fixed 448×448 shape — the MXU sees one large NHWC conv
workload per batch instead of the reference's per-image forwards.
"""

from __future__ import annotations

import argparse
import os
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

TARGET_IMAGE_SIZE = (448, 448)
CHANNEL_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
CHANNEL_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_image(img: np.ndarray) -> np.ndarray:
    """extract_resnet152_feat.py:19-25 + 52-57: resize to 448×448
    (PIL bilinear), scale to [0,1], normalise; HWC float32 out.
    Grey-scale inputs are expanded to 3 channels."""
    from PIL import Image

    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    pil = Image.fromarray(img.astype(np.uint8))
    pil = pil.resize(TARGET_IMAGE_SIZE[::-1], Image.BILINEAR)
    x = np.asarray(pil, np.float32) / 255.0
    return (x - CHANNEL_MEAN) / CHANNEL_STD


def get_image_id(image_name: str) -> int:
    """extract_resnet152_feat.py:66-68: trailing _<id> of the stem."""
    return int(image_name.split(".")[0].split("_")[-1])


def make_trunk(stages: Sequence[int] = (3, 8, 36, 3), seed: int = 0,
               params: Optional[Dict] = None):
    """Jitted NHWC ResNet trunk → [B, H/32, W/32, 2048] features.

    ``stages`` defaults to ResNet-152 (3,8,36,3); tests pass a tiny
    stage tuple.  ``params`` may come from
    ``utils/convert.resnet_from_state_dict`` for published weights.
    """
    import jax

    from transformer_mm_explainability_tpu.models import resnet as jresnet

    if params is None:
        params = jresnet.init_params(jax.random.PRNGKey(seed),
                                     stages=tuple(stages))
    fwd = jax.jit(jresnet.forward)

    def run(batch_hwc: np.ndarray) -> np.ndarray:
        return np.asarray(fwd(params, batch_hwc))

    return run


def extract_dataset_pool5(image_dir: str, save_dir: str,
                          total_group: int = 1, group_id: int = 0,
                          ext_filter: str = "jpg",
                          exclude: Sequence[str] = (),
                          trunk=None, batch_size: int = 8) -> List[str]:
    """extract_resnet152_feat.py:70-120: the extraction loop.  Returns
    the list of written feature paths."""
    from PIL import Image

    trunk = trunk or make_trunk()
    os.makedirs(save_dir, exist_ok=True)
    excluded = {e: 1 for e in exclude}
    # a .npy only counts as done when no stale .lock sits next to it —
    # a crashed worker leaves both, and its (possibly truncated) file
    # must be regenerated (the reference's done-set at :78-83 ignores
    # locks, making its own redo check at :105 unreachable — pinned)
    done = {os.path.basename(f)[:-len(".npy")]: 1
            for f in glob(os.path.join(save_dir, "*.npy"))
            if not os.path.exists(f + ".lock")}

    todo: List[Tuple[str, str]] = []
    for impath in sorted(glob(os.path.join(image_dir, "*." + ext_filter))):
        image_name = os.path.basename(impath)
        stem = os.path.splitext(image_name)[0]
        if stem in excluded or stem in done:
            continue
        if get_image_id(image_name) % total_group != group_id:
            continue
        save_path = os.path.join(save_dir, stem + ".npy")
        if (os.path.exists(save_path)
                and not os.path.exists(save_path + ".lock")):
            continue
        todo.append((impath, save_path))

    written: List[str] = []
    for i in range(0, len(todo), batch_size):
        chunk = todo[i:i + batch_size]
        locks = []
        batch, keep = [], []
        for impath, save_path in chunk:
            tmp_lock = save_path + ".lock"
            if not os.path.exists(tmp_lock):
                os.makedirs(tmp_lock)
            locks.append(tmp_lock)
            try:
                img = np.asarray(Image.open(impath).convert("RGB"))
                batch.append(preprocess_image(img))
                keep.append(save_path)
            except Exception:
                print("error for " + os.path.basename(impath))
        if batch:
            feats = trunk(np.stack(batch))  # [b, h, w, 2048]
            for j, save_path in enumerate(keep):
                np.save(save_path, feats[j:j + 1])
                written.append(save_path)
        for tmp_lock in locks:
            if os.path.isdir(tmp_lock):
                os.rmdir(tmp_lock)
    return written


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--total_group", type=int, default=1)
    parser.add_argument("--group_id", type=int, default=0)
    parser.add_argument("--data_dir", type=str, required=True)
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--image_ext", type=str, default="jpg")
    args = parser.parse_args(argv)
    extract_dataset_pool5(args.data_dir, args.out_dir, args.total_group,
                          args.group_id, args.image_ext)


if __name__ == "__main__":
    main()
