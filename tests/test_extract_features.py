"""Feature-extraction tool (BUTD extract_*_image.py equivalents):
FRCNN → object TSV → round-trip through both TSV readers."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from transformer_mm_explainability_tpu.models import frcnn  # noqa: E402
from transformer_mm_explainability_tpu.tools import extract_features as X  # noqa: E402
from transformer_mm_explainability_tpu.data.vqa import load_obj_tsv  # noqa: E402

TINY = frcnn.FrcnnConfig(
    stages=(1, 1, 1, 1),
    anchor_sizes=(32, 64),
    aspect_ratios=(1.0,),
    pre_nms_topk=50,
    post_nms_topk=12,
    pooler_resolution=4,
    num_classes=9,
    num_attrs=5,
    max_detections=6,
)


def test_extract_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    imgs = [(f"img{i}", (rs.rand(48, 64, 3) * 255).astype(np.uint8))
            for i in range(2)]
    out = tmp_path / "feats.tsv"
    n = X.extract_to_tsv(imgs, str(out), cfg=TINY, target_shortest=32)
    assert n == 2

    for use_native in (False, True):
        rows = load_obj_tsv(str(out), use_native=use_native)
        assert len(rows) == 2
        for (img_id, rgb), row in zip(imgs, rows):
            assert row["img_id"] == img_id
            assert row["img_h"] == rgb.shape[0]
            assert row["img_w"] == rgb.shape[1]
            nb = row["num_boxes"]
            assert 0 < nb <= TINY.max_detections
            assert row["features"].shape == (nb, 2048)
            assert row["boxes"].shape == (nb, 4)
            # boxes rescaled to ORIGINAL pixels
            assert float(row["boxes"][:, 2].max()) <= rgb.shape[1] + 1
            assert row["objects_id"].dtype == np.int64
            assert row["objects_conf"].shape == (nb,)


def test_encode_row_masks_invalid():
    out = {
        "valid": np.array([1, 1, 0], bool),
        "obj_ids": np.array([3, 4, 9]),
        "obj_probs": np.array([0.5, 0.25, 0.1], np.float32),
        "attr_ids": np.array([1, 2, 7]),
        "attr_probs": np.array([0.5, 0.25, 0.1], np.float32),
        "boxes": np.arange(12, dtype=np.float32).reshape(3, 4),
        "roi_features": np.ones((3, 8), np.float32),
    }
    row = X.encode_row("x", 10, 20, out)
    assert row["num_boxes"] == 2
    import base64
    ids = np.frombuffer(base64.b64decode(row["objects_id"]), np.int64)
    assert ids.tolist() == [3, 4]


def test_process_data_converters(tmp_path):
    """GQA/NLVR2 raw→task-json converters (process_data.py,
    process_dataset.py semantics)."""
    import json
    from transformer_mm_explainability_tpu.tools import process_data as PD

    raw = {"q1": {"imageId": "i7", "question": "what?", "answer": "cat"},
           "q2": {"imageId": "i8", "question": "where?"}}
    out = PD.convert_gqa_questions(raw)
    assert out[0] == {"question_id": "q1", "img_id": "i7",
                      "sent": "what?", "label": {"cat": 1.0}}
    assert "label" not in out[1]

    lines = [json.dumps({"identifier": "split-42-0-img", "label": "True",
                         "sentence": "two dogs"}),
             json.dumps({"identifier": "split-42-1-img", "label": "False",
                         "sentence": "a cat"})]
    out = PD.convert_nlvr2_lines(lines, "valid")
    assert out[0]["img0"] == "split-42-0-img0"
    assert out[0]["label"] == 1 and out[1]["label"] == 0
    assert out[1]["uid"] == "nlvr2_valid_1"

    # file-driven GQA path
    (tmp_path / "val_balanced_questions.json").write_text(json.dumps(raw))
    PD.gqa_main(str(tmp_path), str(tmp_path), splits=["valid"])
    data = json.loads((tmp_path / "valid.json").read_text())
    assert len(data) == 2
