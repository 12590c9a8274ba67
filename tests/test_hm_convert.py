"""Hateful Memes zip converter (mmf_cli/hm_convert.py protocol)."""

import hashlib
import io
import json
import os
import tarfile
import zipfile

import numpy as np
import pytest

from transformer_mm_explainability_tpu.tools import hm_convert


def _make_zip(tmp_path, phase_two=True, tar_images=True):
    """Build a DrivenData-shaped zip: data/{*.jsonl, img/ or img.tar.gz}."""
    zpath = tmp_path / "hateful_memes.zip"
    jsonls = (hm_convert.JSONL_PHASE_TWO_FILES if phase_two
              else hm_convert.JSONL_PHASE_ONE_FILES)
    with zipfile.ZipFile(zpath, "w") as z:
        for name in jsonls:
            z.writestr(f"data/{name}",
                       json.dumps({"id": 1, "img": "img/1.png",
                                   "label": 0, "text": "hello"}) + "\n")
        if tar_images:
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w:gz") as tar:
                png = io.BytesIO(b"\x89PNG fake")
                info = tarfile.TarInfo("img/00001.png")
                info.size = len(png.getvalue())
                tar.addfile(info, png)
            z.writestr("data/img.tar.gz", buf.getvalue())
        else:
            z.writestr("data/img/00001.png", b"\x89PNG fake")
    return str(zpath)


def test_checksum_protocol(tmp_path):
    f = tmp_path / "blob.bin"
    f.write_bytes(b"x" * 100000)
    digest = hashlib.sha256(b"x" * 100000).hexdigest()
    hm_convert.checksum(str(f), [digest])  # matches → no raise
    with pytest.raises(AssertionError, match="Checksum"):
        hm_convert.checksum(str(f), ["0" * 64])


def test_convert_phase_two(tmp_path):
    zpath = _make_zip(tmp_path, phase_two=True)
    data_dir = tmp_path / "cache"
    base = hm_convert.convert(zpath, str(data_dir),
                              bypass_checksum=True)
    ann = os.path.join(base, "annotations")
    for name in hm_convert.JSONL_PHASE_TWO_FILES:
        assert os.path.exists(os.path.join(ann, name))
    # img.tar.gz moved up and extracted
    assert os.path.exists(os.path.join(base, "images", "img.tar.gz"))
    assert os.path.exists(os.path.join(base, "images", "img",
                                       "00001.png"))
    # the original zip is untouched (copy mode)
    assert os.path.exists(zpath)


def test_convert_phase_one_warns_and_plain_img_dir(tmp_path):
    zpath = _make_zip(tmp_path, phase_two=False, tar_images=False)
    data_dir = tmp_path / "cache"
    with pytest.warns(UserWarning, match="Phase 1"):
        base = hm_convert.convert(zpath, str(data_dir),
                                  bypass_checksum=True, move_dir=True)
    for name in hm_convert.JSONL_PHASE_ONE_FILES:
        assert os.path.exists(
            os.path.join(base, "annotations", name))
    assert os.path.exists(os.path.join(base, "images", "img",
                                       "00001.png"))
    # move mode consumes the source zip
    assert not os.path.exists(zpath)


def test_convert_checksum_gate(tmp_path, monkeypatch):
    zpath = _make_zip(tmp_path)
    # unknown digest → hard failure before any extraction
    with pytest.raises(AssertionError, match="Checksum"):
        hm_convert.convert(zpath, str(tmp_path / "c2"))
    # registering the digest lets it through
    with open(zpath, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()
    monkeypatch.setattr(hm_convert, "POSSIBLE_CHECKSUMS", [digest])
    hm_convert.convert(zpath, str(tmp_path / "c3"))


def test_assert_files_requires_images(tmp_path):
    d = tmp_path / "images"
    (d / "data").mkdir(parents=True)
    for name in hm_convert.JSONL_PHASE_TWO_FILES:
        (d / "data" / name).write_text("{}")
    with pytest.raises(AssertionError, match="img"):
        hm_convert.assert_files(str(d))
