"""Aux subsystems: COCO data, profiling, zoo, sweep launcher."""

import json
import os

import numpy as np
import pytest

from transformer_mm_explainability_tpu.data import coco
from transformer_mm_explainability_tpu.tools.sweep import Param, Sweep
from transformer_mm_explainability_tpu.utils import download, profiling


def make_coco_json(tmp_path):
    data = {
        "images": [
            {"id": 1, "height": 20, "width": 30, "file_name": "a.jpg"},
            {"id": 2, "height": 10, "width": 10, "file_name": "b.jpg"},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 3, "iscrowd": 0,
             "bbox": [5, 5, 10, 8],
             "segmentation": [[5, 5, 15, 5, 15, 13, 5, 13]]},
            {"id": 11, "image_id": 1, "category_id": 7, "iscrowd": 1,
             "bbox": [0, 0, 5, 5], "segmentation": [[0, 0, 5, 0, 5, 5]]},
            {"id": 12, "image_id": 2, "category_id": 3, "iscrowd": 0,
             "bbox": [2, 2, 4, 4],
             "segmentation": {"size": [10, 10],
                              "counts": [22, 4, 6, 4, 6, 4, 54]}},
        ],
        "categories": [{"id": 3, "name": "cat"}, {"id": 7, "name": "dog"}],
    }
    p = tmp_path / "instances.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_coco_targets(tmp_path):
    ds = coco.CocoDetection(make_coco_json(tmp_path))
    assert len(ds) == 2
    t = ds.target(1)
    # crowd annotation dropped
    assert t["labels"].tolist() == [3]
    np.testing.assert_allclose(t["boxes_xyxy"][0], [5, 5, 15, 13])
    # normalised cxcywh
    np.testing.assert_allclose(t["boxes"][0],
                               [10 / 30, 9 / 20, 10 / 30, 8 / 20], atol=1e-6)
    m = t["masks"][0]
    assert m.shape == (20, 30)
    assert m[6, 6] == 1 and m[0, 0] == 0


def test_uncompressed_rle(tmp_path):
    ds = coco.CocoDetection(make_coco_json(tmp_path))
    t = ds.target(2)
    m = t["masks"][0]
    assert m.shape == (10, 10)
    # counts [22,4,...]: first 22 zeros column-major → (2,2) is mask=1
    assert m[2, 2] == 1 and m[0, 0] == 0


def test_compressed_rle_roundtrip():
    """Encode a known mask with the COCO varint scheme and decode it."""
    # runs: 5 zeros, 3 ones, 4 zeros (h=4, w=3 → 12 px)
    # build the counts string by hand (small positive varints)
    def enc_varint(x, prev_delta_idx, runs):
        # mimic pycocotools: values after the 2nd are deltas
        more_chunks = []
        while True:
            c = x & 0x1F
            x >>= 5
            done = (x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10))
            if not done:
                c |= 0x20
            more_chunks.append(chr(c + 48))
            if done:
                break
        return "".join(more_chunks)

    runs = [5, 3, 4]
    s = ""
    for i, r in enumerate(runs):
        x = r - (runs[i - 2] if i > 2 else 0)
        s += enc_varint(x, i, runs)
    m = coco.decode_compressed_rle(s, 4, 3)
    flat = m.T.reshape(-1)
    np.testing.assert_array_equal(flat, [0] * 5 + [1] * 3 + [0] * 4)


def test_profiling_tools():
    import logging

    t = profiling.Timer()
    assert t.elapsed() >= 0
    # attach our own handler: caplog relies on propagation to the root
    # logger, but setup_logger() (run by any Trainer test earlier in
    # the session) sets tmmx.propagate = False
    records = []

    class _Capture(logging.Handler):
        def emit(self, record):
            records.append(record)

    lg = logging.getLogger("tmmx")
    handler = _Capture(level=logging.DEBUG)
    old_level = lg.level
    lg.addHandler(handler)
    lg.setLevel(logging.DEBUG)
    try:
        with profiling.profile_section("unit"):
            pass
    finally:
        lg.removeHandler(handler)
        lg.setLevel(old_level)
    assert any("unit:" in r.getMessage() for r in records)


def test_zoo_resolve_local(tmp_path):
    # torch.hub-style names embed sha256[:8]; a fake payload must fail
    f = tmp_path / "detr-r50-e632da11.pth"
    f.write_bytes(b"fake")
    with pytest.raises(IOError):
        download.resolve("detr_r50", cache_dir=str(tmp_path),
                         allow_download=False)
    # no digest available at all → resolves, but warns loudly
    g = tmp_path / "pytorch_model.bin"
    g.write_bytes(b"fake lxmert")
    with pytest.warns(UserWarning, match="WITHOUT integrity"):
        path = download.resolve("lxmert_vqa", cache_dir=str(tmp_path),
                                allow_download=False)
    assert path == str(g)
    with pytest.raises(FileNotFoundError):
        download.resolve("clip_vit_b32", cache_dir=str(tmp_path / "empty"),
                         allow_download=False)


def test_zoo_checksum(tmp_path):
    f = tmp_path / "ViT-B-32.pt"
    f.write_bytes(b"not the real clip weights")
    with pytest.raises(IOError):
        download.resolve("clip_vit_b32", cache_dir=str(tmp_path),
                         allow_download=False)


def test_sweep_grid_and_state(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sweep = Sweep("unit", "echo run", [Param("lr", [0.1, 0.2]),
                                       Param("seed", [1])],
                  sweep_root=str(tmp_path / "sweeps"))
    grid = sweep.grid()
    assert len(grid) == 2
    cmds = sweep.launch(backend="local", dry_run=True)
    assert len(cmds) == 2
    assert "lr=0.1" in cmds[0] and "seed=1" in cmds[0]
    assert sweep.state(grid[0]) == "pending"
    # slurm script emission
    scripts = sweep.launch(backend="slurm", dry_run=True)
    assert all(os.path.exists(s) for s in scripts)
    body = open(scripts[0]).read()
    assert "#SBATCH --requeue" in body and "srun" in body


def test_make_grid_and_visualize_images():
    """mmf/utils/visualize.py:9-47 + torchvision make_grid tiling."""
    from transformer_mm_explainability_tpu.utils.visualization import (
        make_grid, visualize_images)

    imgs = np.stack([np.full((4, 4, 3), i, np.float32)
                     for i in range(5)])
    grid = make_grid(imgs, nrow=2, padding=1)
    assert grid.shape == (3 * 5 + 1, 2 * 5 + 1, 3)
    assert grid[1, 1, 0] == 0 and grid[1, 6, 0] == 1
    assert grid[0, 0, 0] == 0.0  # padding

    out = visualize_images(
        [np.zeros((8, 6, 3), np.float32),
         np.full((4, 4, 3), 255, np.uint8)], size=(5, 5))
    assert out.shape[2] == 3 and out.max() <= 1.0


def test_eval_ground_truths_include_crowds(tmp_path):
    """Regression: target() drops crowds (training view, like the
    reference loader) but the evaluator-side GT must include them as
    ignore regions — otherwise predictions over crowd areas are
    scored as false positives."""
    ds = coco.CocoDetection(make_coco_json(tmp_path))
    target = ds.target(1)
    assert (target["iscrowd"] == 0).all()  # training view: no crowds
    gts = coco.eval_ground_truths(ds, 1)
    crowd_flags = sorted(g["iscrowd"] for g in gts)
    assert crowd_flags == [0, 1]           # eval view: crowd present
    crowd = [g for g in gts if g["iscrowd"]][0]
    assert crowd["category_id"] == 7


def test_sweep_failed_command_reports_failed(tmp_path):
    """Regression: tee at the end of the run pipeline masked the
    command's exit status — a failing command was recorded FINISHED."""
    from transformer_mm_explainability_tpu.tools.sweep import Param, Sweep

    ok = Sweep("ok", "true", [Param("x", [1])], sweep_root=str(tmp_path))
    ok.launch(backend="local")
    assert ok.state({"x": 1}) == "finished"

    bad = Sweep("bad", "false", [Param("x", [1])],
                sweep_root=str(tmp_path))
    bad.launch(backend="local")
    assert bad.state({"x": 1}) == "failed"

    # sbatch script keeps #SBATCH directives first, pipefail after
    scripts = Sweep("sl", "true", [Param("x", [1])],
                    sweep_root=str(tmp_path)).launch(
        backend="slurm", dry_run=True)
    lines = open(scripts[0]).read().splitlines()
    assert lines[0] == "#!/bin/bash"
    assert lines[1].startswith("#SBATCH")
    assert "set -o pipefail" in lines


def test_coco_panoptic_dataset(tmp_path):
    """CocoPanoptic (DETR/datasets/coco_panoptic.py): id-map PNG →
    per-segment masks/labels/boxes; masks_to_boxes parity vs torch."""
    import json as _json

    from PIL import Image

    from transformer_mm_explainability_tpu.data.coco import (
        CocoPanoptic, rgb2id)

    (tmp_path / "imgs").mkdir()
    (tmp_path / "anns").mkdir()
    # id map: segment 1 fills left half, segment 300 right-bottom cell
    id_map = np.zeros((4, 6), np.int64)
    id_map[:, :3] = 1
    id_map[3, 5] = 300
    rgb = np.stack([id_map % 256, (id_map // 256) % 256,
                    np.zeros_like(id_map)], -1).astype(np.uint8)
    Image.fromarray(rgb).save(tmp_path / "anns" / "0001.png")
    Image.fromarray(np.zeros((4, 6, 3), np.uint8)).save(
        tmp_path / "imgs" / "0001.jpg")
    ann = {
        "images": [{"id": 1, "file_name": "0001.png", "height": 4,
                    "width": 6}],
        "annotations": [{"image_id": 1, "file_name": "0001.png",
                         "segments_info": [
                             {"id": 1, "category_id": 7, "iscrowd": 0,
                              "area": 12},
                             {"id": 300, "category_id": 2, "iscrowd": 1,
                              "area": 1}]}],
    }
    af = tmp_path / "panoptic.json"
    af.write_text(_json.dumps(ann))
    ds = CocoPanoptic(str(tmp_path / "imgs"), str(tmp_path / "anns"),
                      str(af))
    assert len(ds) == 1
    assert ds.get_height_and_width(0) == (4, 6)
    t = ds.target(0)
    assert t["labels"].tolist() == [7, 2]
    assert t["masks"].shape == (2, 4, 6)
    assert t["masks"][0].sum() == 12 and t["masks"][1].sum() == 1
    np.testing.assert_allclose(t["boxes"][0], [0, 0, 2, 3])
    np.testing.assert_allclose(t["boxes"][1], [5, 3, 5, 3])
    assert t["iscrowd"].tolist() == [0, 1]
    assert rgb2id(rgb).max() == 300

    # masks_to_boxes: empty mask → zeros
    import jax.numpy as jnp

    from transformer_mm_explainability_tpu.utils.box_ops import (
        masks_to_boxes)

    empty = jnp.zeros((1, 4, 6))
    np.testing.assert_allclose(np.asarray(masks_to_boxes(empty)),
                               [[0, 0, 0, 0]])


def test_plot_logs_reads_scalar_streams(tmp_path):
    """plot_logs data layer (DETR/util/plot_utils.py semantics) over
    ScalarLogger jsonl streams."""
    from transformer_mm_explainability_tpu.utils.logger import (
        ScalarLogger)
    from transformer_mm_explainability_tpu.utils.visualization import (
        plot_logs)

    d = tmp_path / "run1"
    sl = ScalarLogger(str(d))
    for step, loss in enumerate([3.0, 2.0, 1.0]):
        sl.log(step, {"loss": loss, "acc": 1.0 - loss / 3})
    out = plot_logs(str(d), fields=("loss", "acc", "missing"))
    steps, vals = out[str(d)]["loss"]
    assert steps == [0, 1, 2] and vals == [3.0, 2.0, 1.0]
    assert "missing" not in out[str(d)]
    sm = plot_logs(str(d), fields=("loss",), ewm_alpha=0.5)
    assert sm[str(d)]["loss"][1][1] == pytest.approx(2.5)
