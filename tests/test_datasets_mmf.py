"""MMF datasets layer (C29): databases, processors, builders.

Formats and semantics pinned against the reference sources:
annotation_database.py:10-101 (npy imdb header skip, answers aliasing),
feature_readers.py:140-192 (padded FRCNN npy + _info.npy merge),
processors.py:529-726 (VQA accuracy scores — cross-checked against an
independent transcription of the published VQA formula),
bert_processors.py:16-173, builders/vqa2/dataset.py:55-145."""

import json
import os

import numpy as np
import pytest

from transformer_mm_explainability_tpu.core.registry import registry
from transformer_mm_explainability_tpu.data import builders  # noqa: F401 (registers)
from transformer_mm_explainability_tpu.data import extra_builders  # noqa: F401 (registers textvqa & the builder-zoo tail; without it this module is import-order dependent)
from transformer_mm_explainability_tpu.data import databases, processors

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "what", "color",
         "is", "the", "dog", "cat", "red", "blue", "it", "'", "s", "a",
         "an", "##s", "true", "two", "dogs", "are", "sitting"]
VOCAB_D = {w: i for i, w in enumerate(VOCAB)}


# ---------------------------------------------------------------------------
# databases
# ---------------------------------------------------------------------------

def _write_features(tmp_path, name, n_boxes=7, dim=12, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n_boxes, dim).astype(np.float32)
    np.save(tmp_path / f"{name}.npy", feats)
    info = {"image_width": 640, "image_height": 480,
            "bbox": rng.rand(n_boxes, 4).astype(np.float32) * 400}
    np.save(tmp_path / f"{name}_info.npy", np.array(info, dtype=object))
    return feats, info


def test_padded_frcnn_reader(tmp_path):
    feats, info = _write_features(tmp_path, "img1", n_boxes=7, dim=12)
    reader = databases.PaddedFrcnnFeatureReader(max_loc=10)
    out, out_info = reader.read(str(tmp_path / "img1.npy"))
    assert out.shape == (10, 12)
    np.testing.assert_array_equal(out[:7], feats)
    np.testing.assert_array_equal(out[7:], 0)
    assert out_info["max_features"] == 7
    assert out_info["image_width"] == 640
    assert "features" not in out_info


def test_padded_reader_truncates(tmp_path):
    feats, _ = _write_features(tmp_path, "big", n_boxes=30, dim=8)
    reader = databases.PaddedFrcnnFeatureReader(max_loc=10)
    out, info = reader.read(str(tmp_path / "big.npy"))
    assert out.shape == (10, 8)
    np.testing.assert_array_equal(out, feats[:10])
    assert info["max_features"] == 30  # reference reports the raw count


def test_padded_reader_grid_features(tmp_path):
    rng = np.random.RandomState(1)
    grid = rng.randn(1, 7, 7, 16).astype(np.float32)
    np.save(tmp_path / "grid.npy", grid)
    reader = databases.PaddedFrcnnFeatureReader(max_loc=49)
    out, _ = reader.read(str(tmp_path / "grid.npy"))
    np.testing.assert_array_equal(out, grid.reshape(49, 16))


def test_annotation_db_formats(tmp_path):
    rows = [{"image_id": 7, "question": "what color is the dog",
             "question_id": 11, "feature_path": "img1.npy",
             "answers": ["red"] * 10}]
    # json {metadata, data}
    jpath = tmp_path / "a.json"
    jpath.write_text(json.dumps({"metadata": {"version": 2}, "data": rows}))
    db = databases.AnnotationDatabase(str(jpath))
    assert len(db) == 1 and db[0]["question_id"] == 11
    assert db.metadata["version"] == 2
    # jsonl
    lpath = tmp_path / "a.jsonl"
    lpath.write_text("\n".join(json.dumps(r) for r in rows))
    assert databases.AnnotationDatabase(str(lpath))[0]["image_id"] == 7
    # npy imdb with metadata header row (old layout → start_idx 1)
    npath = tmp_path / "imdb.npy"
    np.save(npath, np.array([{"dataset_name": "vqa2"}] + rows,
                            dtype=object))
    db = databases.AnnotationDatabase(str(npath))
    assert len(db) == 1 and db[0]["question"] == "what color is the dog"


def test_annotation_db_answer_aliases(tmp_path):
    rows = [{"image_id": 1, "valid_answers": ["red", "blue"]},
            {"image_id": 2, "all_answers": ["cat", "<copy>"]}]
    p = tmp_path / "b.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    db = databases.AnnotationDatabase(str(p))
    assert db[0]["answers"] == ["red", "blue"]
    # all_answers alias + trailing <copy> token stripped
    assert db[1]["answers"] == ["cat"]


def test_features_database_join(tmp_path):
    feats, _ = _write_features(tmp_path, "img1")
    rows = [{"image_id": 7, "feature_path": "img1.npy"}]
    apath = tmp_path / "a.jsonl"
    apath.write_text(json.dumps(rows[0]))
    adb = databases.AnnotationDatabase(str(apath))
    fdb = databases.FeaturesDatabase(str(tmp_path), annotation_db=adb,
                                     max_features=10)
    item = fdb[0]
    assert item["image_feature_0"].shape == (10, 12)
    assert item["image_info_0"]["max_features"] == 7
    # path fallback from image name when feature_path is missing
    out = fdb.get({"image_name": "img1.jpg"})
    np.testing.assert_array_equal(out["image_feature_0"],
                                  item["image_feature_0"])


# ---------------------------------------------------------------------------
# processors
# ---------------------------------------------------------------------------

def _vqa_accuracy_reference(answers, vocab_words, target):
    """Independent transcription of the published VQA soft-accuracy:
    acc(a) = mean over the 10 leave-one-out subsets of min(1, #a/3)."""
    n = len(answers)
    scores = {}
    for a in set(answers):
        accs = []
        for i in range(n):
            others = [answers[j] for j in range(n) if j != i]
            accs.append(min(1.0, others.count(a) / 3.0))
        scores[a] = sum(accs) / n
    out = np.zeros((len(vocab_words) + 1,), np.float32)  # +1 for <unk>
    for a, s in scores.items():
        if a in vocab_words:
            out[vocab_words.index(a) + 1] = s
    np.testing.assert_allclose(target, out, atol=1e-6)


def test_vqa_answer_processor_scores():
    words = ["red", "blue", "dog"]
    proc = registry.get("processor", "vqa_answer")(
        {"vocab": words, "preprocessor": "simple_word"})
    answers = ["red"] * 6 + ["blue"] * 3 + ["dog"]
    out = proc({"answers": answers})
    assert out["answers_indices"].shape == (10,)
    _vqa_accuracy_reference(answers, words, out["answers_scores"])
    # red appears 6 times -> every leave-one-out has >=5 matches -> 1.0
    assert out["answers_scores"][proc.word2idx("red")] == 1.0
    # unk answers never score
    out2 = proc({"answers": ["zebra"] * 10})
    assert out2["answers_scores"].sum() == 0.0


def test_vqa_answer_processor_increase_to_ten():
    proc = registry.get("processor", "vqa_answer")(
        {"vocab": ["red", "blue"], "preprocessor": "simple_word"})
    out = proc({"answers": ["red", "blue", "red"]})
    # cycled to 10: red,blue,red,red,blue,red,red,blue,red,red
    assert (out["answers_indices"] == proc.word2idx("red")).sum() == 7


def test_multi_hot_answer_processor():
    proc = registry.get("processor", "multi_hot_answer_from_vocab")(
        {"vocab": ["red", "blue"], "preprocessor": "simple_word"})
    out = proc({"answers": ["red", "zebra"]})
    scores = out["answers_scores"]
    assert scores[proc.word2idx("red")] == 1.0
    assert scores[proc.answer_vocab.UNK_INDEX] == 0.0
    assert scores[proc.word2idx("blue")] == 0.0


def test_simple_word_processor():
    proc = registry.get("processor", "simple_word")({})
    assert proc({"text": "DOG's,?"})["text"] == "dog 's"


def test_bert_tokenizer_processor():
    proc = registry.get("processor", "bert_tokenizer")(
        {"tokenizer_config": {"vocab": VOCAB_D}, "max_seq_length": 12})
    out = proc({"text": "what color is the dog"})
    ids = out["input_ids"]
    assert ids.shape == (12,)
    assert ids[0] == VOCAB_D["[CLS]"]
    assert list(ids[1:6]) == [VOCAB_D[w] for w in
                              ("what", "color", "is", "the", "dog")]
    assert ids[6] == VOCAB_D["[SEP]"]
    assert out["input_mask"].sum() == 7
    assert (out["lm_label_ids"] == -1).all()  # masking disabled
    assert (out["segment_ids"] == 0).all()


def test_bert_tokenizer_pair_and_truncation():
    proc = registry.get("processor", "bert_tokenizer")(
        {"tokenizer_config": {"vocab": VOCAB_D}, "max_seq_length": 10})
    out = proc({"text": "two dogs are sitting", "text_b": "it is true"})
    ids, seg = out["input_ids"], out["segment_ids"]
    n = int(out["input_mask"].sum())
    assert n == 10  # [CLS] a(4) [SEP] b(3) [SEP] exactly fills 10
    assert ids[0] == VOCAB_D["[CLS]"]
    sep_positions = [i for i in range(n) if ids[i] == VOCAB_D["[SEP]"]]
    assert len(sep_positions) == 2
    # segment 1 starts after the first [SEP]
    assert (seg[:sep_positions[0] + 1] == 0).all()
    assert (seg[sep_positions[0] + 1:n] == 1).all()
    # truncation pops from the longer side until the pair fits
    out2 = proc({"text": "two dogs are sitting sitting sitting",
                 "text_b": "it is true"})
    assert int(out2["input_mask"].sum()) == 10


def test_masked_token_processor_statistics():
    proc = registry.get("processor", "masked_token")(
        {"tokenizer_config": {"vocab": VOCAB_D}, "max_seq_length": 128,
         "mask_probability": 0.5, "seed": 3})
    text = " ".join(["dog"] * 100)
    out = proc({"text_a": text})
    labels = out["lm_label_ids"]
    masked = (labels != -1).sum()
    assert 30 < masked < 70  # ~50 of 100
    # masked positions keep the original id as label
    assert (labels[labels != -1] == VOCAB_D["dog"]).all()
    # ~80% of selected positions become [MASK]
    sel = out["input_ids"][np.asarray(labels != -1)]
    assert (sel == VOCAB_D["[MASK]"]).sum() > masked * 0.5


def test_transformer_bbox_processor():
    proc = registry.get("processor", "transformer_bbox")({})
    bbox = np.array([[10, 20, 110, 220]], np.float32)
    out = proc({"bbox": bbox, "image_width": 200, "image_height": 400})
    loc = out["bbox"]
    np.testing.assert_allclose(
        loc[0], [0.05, 0.05, 0.55, 0.55, (100 * 200) / (200 * 400)],
        atol=1e-6)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

def _vqa_config(tmp_path):
    _write_features(tmp_path, "img7")
    rows = [{"image_id": 7, "question": "what color is the dog",
             "question_id": 11, "feature_path": "img7.npy",
             "answers": ["red"] * 8 + ["blue"] * 2}]
    apath = tmp_path / "train.jsonl"
    apath.write_text(json.dumps(rows[0]))
    return {
        "annotations": str(apath),
        "features": str(tmp_path),
        "max_features": 10,
        "processors": {
            "text_processor": {"type": "bert_tokenizer",
                               "params": {"tokenizer_config":
                                          {"vocab": VOCAB_D},
                                          "max_seq_length": 16}},
            "answer_processor": {"type": "vqa_answer",
                                 "params": {"vocab": ["red", "blue"],
                                            "preprocessor":
                                            "simple_word"}},
        },
    }


def test_vqa2_builder_end_to_end(tmp_path):
    builder = registry.get("builder", "vqa2")()
    ds = builder.load(_vqa_config(tmp_path))
    assert len(ds) == 1
    s = ds[0]
    assert s["input_ids"][0] == VOCAB_D["[CLS]"]
    assert s["question_id"] == 11
    assert s["image_feature_0"].shape == (10, 12)
    assert s["targets"].shape == (3,)  # <unk> + 2 answers
    assert s["targets"].max() == 1.0   # 8x "red" → full credit


def test_vqa_style_builders_registered():
    for name in ("vqa2", "vqa2_train_val", "gqa", "okvqa", "vqacp_v2",
                 "vizwiz", "visual_genome", "textvqa", "nlvr2", "coco"):
        assert registry.get("builder", name) is not None


def test_nlvr2_builder(tmp_path):
    for i, slot in enumerate(("img0", "img1")):
        # deterministic distinct seeds (str hash is per-process random)
        _write_features(tmp_path, f"dev-0-0-{slot}", seed=11 + i)
    row = {"identifier": "dev-0-0-0", "sentence": "two dogs are sitting",
           "label": "True"}
    apath = tmp_path / "dev.jsonl"
    apath.write_text(json.dumps(row))
    cfg = {
        "annotations": str(apath), "features": str(tmp_path),
        "max_features": 10,
        "processors": {"text_processor": {
            "type": "bert_tokenizer",
            "params": {"tokenizer_config": {"vocab": VOCAB_D},
                       "max_seq_length": 16}}},
    }
    ds = registry.get("builder", "nlvr2")().load(cfg)
    s = ds[0]
    assert s["targets"] == 1
    assert s["img0"]["image_feature_0"].shape == (10, 12)
    assert not np.allclose(s["img0"]["image_feature_0"],
                           s["img1"]["image_feature_0"])


def test_coco_builder(tmp_path):
    _write_features(tmp_path, "COCO_cap1")
    # feature_path lacks "COCO" → rebuilt from image_path
    # (builders/coco/dataset.py:15-20)
    row = {"image_id": 3, "caption_id": 9,
           "caption_tokens": ["a", "dog"], "feature_path": "stale.npy",
           "image_path": "COCO_cap1.jpg"}
    apath = tmp_path / "cap.jsonl"
    apath.write_text(json.dumps(row))
    cfg = {
        "annotations": str(apath), "features": str(tmp_path),
        "max_features": 10,
        "processors": {"text_processor": {
            "type": "bert_tokenizer",
            "params": {"tokenizer_config": {"vocab": VOCAB_D},
                       "max_seq_length": 8}}},
    }
    ds = registry.get("builder", "coco")().load(cfg)
    s = ds[0]
    assert s["caption_id"] == 9 and s["caption_len"] == 2
    assert s["image_feature_0"].shape == (10, 12)


def test_lmdb_reader_gated(tmp_path):
    (tmp_path / "store.lmdb").mkdir()
    reader = databases.FeatureReader(str(tmp_path / "store.lmdb"),
                                     max_features=10)
    try:
        import lmdb  # noqa: F401
        pytest.skip("lmdb installed; gate not exercised")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="lmdb"):
        reader.read("anything_1.npy")


def test_image_database(tmp_path):
    from PIL import Image

    arr = (np.arange(12 * 10 * 3) % 255).astype(np.uint8).reshape(12, 10, 3)
    Image.fromarray(arr).save(tmp_path / "pic1.png")
    rows = [{"image_name": "pic1.jpg"}]  # wrong extension on purpose
    import json
    (tmp_path / "a.jsonl").write_text(json.dumps(rows[0]))
    adb = databases.AnnotationDatabase(str(tmp_path / "a.jsonl"))
    idb = databases.ImageDatabase(str(tmp_path), annotation_db=adb)
    out = idb[0]
    # extension probing found the .png despite the .jpg name
    np.testing.assert_array_equal(out["images"][0], arr)
    # transform applies
    idb.transform = lambda a: a.astype(np.float32) / 255.0
    assert out["images"][0].dtype == np.uint8
    assert idb[0]["images"][0].dtype == np.float32
    with pytest.raises(RuntimeError, match="Image not found"):
        idb.from_path("missing.jpg")


def test_image_database_nlvr2_identifier(tmp_path):
    from PIL import Image

    for s in ("id7-img0", "id7-img1"):
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(
            tmp_path / f"{s}.png")
    idb = databases.ImageDatabase(str(tmp_path))
    out = idb.get({"identifier": "id7", "left_url": "u", "right_url": "v"})
    assert len(out["images"]) == 2
