"""GQA→VQA conversion + VisDial imdb builder tools."""

import json
import os

import numpy as np
import pytest


# --------------------------------------------------------------- visdial
def test_visdial_build_imdb(tmp_path):
    from transformer_mm_explainability_tpu.tools import visdial_imdb

    root = tmp_path / "COCO"
    (root / "train2014").mkdir(parents=True)
    (root / "val2014").mkdir()
    # ids parsed from the trailing 12 digits of the stem
    np.save(root / "train2014" / "COCO_train2014_000000000123.npy",
            np.zeros(1))
    np.save(root / "val2014" / "COCO_val2014_000000000456.npy",
            np.zeros(1))

    id2path = visdial_imdb.id_to_path_dict(str(root))
    assert id2path == {
        123: "train2014/COCO_train2014_000000000123.npy",
        456: "val2014/COCO_val2014_000000000456.npy"}

    data = {
        "questions": ["What color is it?", "Is the man tall?"],
        "answers": ["red", "yes"],
        "dialogs": [
            {"image_id": 123, "caption": "a man rides a horse",
             "dialog": [{"question": 0, "answer": 0}]},
            {"image_id": 456, "caption": "two birds",
             "dialog": [{"question": 1, "answer": 1}]},
        ],
    }
    imdb = visdial_imdb.build_imdb(data, str(root))
    assert imdb["questions"] == [["what", "color", "is", "it"],
                                 ["is", "the", "man", "tall"]]
    assert imdb["answers"] == [["red"], ["yes"]]
    d0 = imdb["dialogs"][0]
    assert d0["image_feature_path"].endswith("000000000123.npy")
    assert d0["caption"] == [["a", "man", "rides", "a", "horse"]]


# ------------------------------------------------------------------- gqa
def test_get_objects_semantic_parse():
    from transformer_mm_explainability_tpu.tools import gqa_to_vqa

    s = "select(12) relate(4,7) filter(color) query(name)"
    assert gqa_to_vqa.get_objects(s) == [12, 4, 7]
    assert gqa_to_vqa.get_objects("query(name)") == []


def test_get_imdb_format(tmp_path):
    from transformer_mm_explainability_tpu.tools import gqa_to_vqa

    qfile = tmp_path / "val_balanced_questions.json"
    qfile.write_text(json.dumps({
        "q1": {"imageId": "n100", "question": "What color is the sky?",
               "answer": "blue", "semanticStr": "select(3) query(color)",
               "types": {"structural": "query"}},
        "q2": {"imageId": "n101", "question": "Any clouds?"},
    }))
    imdb = gqa_to_vqa.get_imdb(str(qfile))
    assert imdb[0] == {"dataset_name": "gqa"}
    e = imdb[1]
    assert e["image_name"] == "n100jpg"  # reference quirk :52 (no dot)
    assert e["question_tokens"] == ["what", "color", "is", "the", "sky"]
    assert e["all_answers"] == ["blue"] * 10
    assert e["gt_object_ids"] == ([3],)
    assert "all_answers" not in imdb[2]  # test split: no answer


def test_merge_train(tmp_path):
    from transformer_mm_explainability_tpu.tools import gqa_to_vqa

    chunks = tmp_path / "questions" / "train_all_questions"
    chunks.mkdir(parents=True)
    (chunks / "part0.json").write_text(json.dumps({"a": {"q": 1}}))
    (chunks / "part1.json").write_text(json.dumps({"b": {"q": 2}}))
    out = gqa_to_vqa.merge_train(str(chunks))
    assert json.load(open(out)) == {"a": {"q": 1}, "b": {"q": 2}}
    assert os.path.dirname(out) == str(tmp_path / "questions")


def test_h5_extraction(tmp_path):
    h5py = pytest.importorskip("h5py")
    from transformer_mm_explainability_tpu.tools import gqa_to_vqa

    obj_dir = tmp_path / "objects"
    obj_dir.mkdir()
    rng = np.random.RandomState(0)
    boxes = rng.rand(2, 8, 4).astype(np.float32)
    feats = rng.rand(2, 8, 16).astype(np.float32)
    with h5py.File(obj_dir / "gqa_objects_0.h5", "w") as f:
        f["bboxes"] = boxes
        f["features"] = feats
    (obj_dir / "gqa_objects_info.json").write_text(json.dumps({
        "img7": {"file": 0, "idx": 1, "height": 10, "width": 20,
                 "objectsNum": 8}}))
    n = gqa_to_vqa.extract_bbox_feats(str(obj_dir), str(tmp_path / "o"),
                                      n_files=1)
    assert n == 1
    saved = np.load(tmp_path / "o" / "img7.npy",
                    allow_pickle=True).item()
    np.testing.assert_array_equal(saved["boxes"], boxes[1])
    assert saved["n_objects"] == 8 and saved["height"] == 10

    sp_dir = tmp_path / "spatial"
    sp_dir.mkdir()
    grid = rng.rand(1, 2048, 7, 7).astype(np.float32)
    with h5py.File(sp_dir / "gqa_spatial_0.h5", "w") as f:
        f["features"] = grid
    (sp_dir / "gqa_spatial_info.json").write_text(json.dumps({
        "img7": {"file": 0, "idx": 0}}))
    n = gqa_to_vqa.extract_spatial_feats(str(sp_dir),
                                         str(tmp_path / "s"), n_files=1)
    assert n == 1
    sgrid = np.load(tmp_path / "s" / "img7.npy")
    assert sgrid.shape == (1, 7, 7, 2048)
    # real CHW→HWC transpose, not the reference's buffer reshape
    # (:118 pinned): cell (h, w) must hold the channel vector
    np.testing.assert_array_equal(sgrid[0, 3, 5], grid[0, :, 3, 5])


def test_build_vocabularies(tmp_path):
    from transformer_mm_explainability_tpu.tools import gqa_to_vqa

    questions = {"q1": {"question": "What color is the sky?",
                        "answer": "Blue"},
                 "q2": {"question": "How many dogs?",
                        "answer": "two"}}
    vf, af = gqa_to_vqa.build_vocabularies([questions], str(tmp_path))
    vocab = open(vf).read().split()
    assert vocab[0] == "<unk>" and "sky" in vocab and vocab[1:] == sorted(
        vocab[1:])
    answers = open(af).read().split("\n")[:-1]
    assert answers[0] == "<unk>"
    # EvalAI normalization: lowercase, number words → digits
    assert "blue" in answers and "2" in answers and "two" not in answers
