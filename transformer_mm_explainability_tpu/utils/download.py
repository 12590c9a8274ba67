"""Checkpoint/dataset zoo with checksum verification (C30).

The reference's DownloadableFile downloads + sha256-verifies the
published artifacts (mmf/utils/download.py:28-164; clip.load's
sha256-in-URL check, CLIP/clip/clip.py:75-103). This image has zero
egress, so the zoo resolves LOCAL paths first and only attempts
network when available; checksum verification always runs.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import urllib.request
from typing import Dict, Optional


@dataclasses.dataclass(frozen=True)
class ZooEntry:
    name: str
    url: str
    sha256: Optional[str] = None
    loader: str = ""          # utils.clip_loader function name
    notes: str = ""


# the five published checkpoint families the reference depends on
# (SURVEY §5 "checkpoint conversion fidelity")
ZOO: Dict[str, ZooEntry] = {
    "clip_vit_b32": ZooEntry(
        "clip_vit_b32",
        "https://openaipublic.azureedge.net/clip/models/"
        "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/"
        "ViT-B-32.pt",
        sha256="40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
        loader="load_clip"),
    "vit_base_patch16_224": ZooEntry(
        "vit_base_patch16_224",
        "https://github.com/rwightman/pytorch-image-models/releases/"
        "download/v0.1-vitjx/jx_vit_base_p16_224-80ecf9dd.pth",
        loader="load_timm_vit"),
    "detr_r50": ZooEntry(
        "detr_r50",
        "https://dl.fbaipublicfiles.com/detr/detr-r50-e632da11.pth",
        loader="load_detr"),
    "lxmert_vqa": ZooEntry(
        "lxmert_vqa",
        "https://huggingface.co/unc-nlp/lxmert-vqa-uncased/resolve/main/"
        "pytorch_model.bin",
        loader="load_lxmert_hf"),
    "visual_bert_vqa2": ZooEntry(
        "visual_bert_vqa2",
        "https://dl.fbaipublicfiles.com/mmf/data/models/visual_bert/"
        "visual_bert.finetuned.vqa2.from_coco_train.tar.gz",
        loader="",
        notes="MMF tarball; extract then convert via "
              "utils.convert.bert_encoder_from_state_dict"),
}


def sha256_of(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def resolve(name: str, cache_dir: str = "~/.cache/tmmx",
            local_path: Optional[str] = None,
            allow_download: bool = True) -> str:
    """Return a verified local path for a zoo entry.

    Order: explicit ``local_path`` → cache → download (when the
    environment has egress). Raises with a clear message otherwise.
    """
    entry = ZOO[name]
    cache_dir = os.path.expanduser(cache_dir)
    filename = os.path.basename(entry.url)
    candidates = [p for p in (local_path,
                              os.path.join(cache_dir, filename)) if p]
    for path in candidates:
        if os.path.exists(path):
            if entry.sha256 and sha256_of(path) != entry.sha256:
                raise IOError(
                    f"{path} exists but fails the sha256 check for "
                    f"{name}")
            return path
    if not allow_download:
        raise FileNotFoundError(
            f"{name}: not found locally; place the file at "
            f"{os.path.join(cache_dir, filename)} (url: {entry.url})")
    os.makedirs(cache_dir, exist_ok=True)
    target = os.path.join(cache_dir, filename)
    try:
        urllib.request.urlretrieve(entry.url, target)
    except Exception as e:
        raise IOError(
            f"{name}: download failed ({e}); this environment may have "
            f"no egress — fetch {entry.url} elsewhere and pass "
            f"local_path") from e
    if entry.sha256 and sha256_of(target) != entry.sha256:
        os.remove(target)
        raise IOError(f"{name}: downloaded file failed sha256 check")
    return target
