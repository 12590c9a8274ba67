"""Builder-zoo tail (C29 completion): one end-to-end test per builder
registered by data/extra_builders.py, on synthetic annotations +
features, through to collated batches.

Protocols pinned against the reference:
builders/textvqa/dataset.py:85-245, stvqa/dataset.py:10-21,
textcaps/dataset.py:6-39, ocrvqa/dataset.py:5-13,
visual_entailment/dataset.py:10-48, hateful_memes/dataset.py:16-123,
mmimdb/dataset.py:9-77, clevr/dataset.py:131-153,
conceptual_captions/dataset.py:7-35, vqa_hat/dataset.py:14-147."""

import json
import os

import numpy as np
import pytest

from transformer_mm_explainability_tpu.core.registry import registry
from transformer_mm_explainability_tpu.core.sample import collate
from transformer_mm_explainability_tpu.data import extra_builders  # noqa: F401
from transformer_mm_explainability_tpu.data import builders  # noqa: F401

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "what", "color",
         "is", "the", "dog", "sign", "says", "stop", "red", "blue",
         "a", "movie", "about", "space", "two", "dogs"]
VOCAB_D = {w: i for i, w in enumerate(VOCAB)}

BERT_TEXT = {"type": "bert_tokenizer",
             "params": {"tokenizer_config": {"vocab": VOCAB_D},
                        "max_seq_length": 16}}


def _write_features(tmp_path, name, n_boxes=7, dim=12, seed=0):
    rng = np.random.RandomState(seed)
    feats = rng.randn(n_boxes, dim).astype(np.float32)
    path = tmp_path / f"{name}.npy"
    path.parent.mkdir(parents=True, exist_ok=True)
    np.save(path, feats)
    info = {"image_width": 640, "image_height": 480,
            "bbox": rng.rand(n_boxes, 4).astype(np.float32) * 400}
    np.save(tmp_path / f"{name}_info.npy", np.array(info, dtype=object))
    return feats


def _write_fasttext_table(tmp_path, dim=4):
    words = ["stop", "sign", "go", "red"]
    lines = [" ".join([w] + [f"{0.1 * (i + 1):.2f}"] * dim)
             for i, w in enumerate(words)]
    path = tmp_path / "ft.txt"
    path.write_text("\n".join(lines))
    return str(path)


def _ocr_processors(tmp_path):
    return {
        "text_processor": BERT_TEXT,
        "answer_processor": {
            "type": "m4c_answer",
            "params": {"vocab": ["<pad>", "<s>", "</s>", "<unk>",
                                 "red", "stop"],
                       "preprocessor": {"type": "simple_word"},
                       "num_answers": 10, "max_length": 8,
                       "max_copy_steps": 4}},
        "copy_processor": {"type": "copy", "params": {"max_length": 100}},
        "context_processor": {
            "type": "fasttext",
            "params": {"model_file": _write_fasttext_table(tmp_path),
                       "max_length": 8}},
        "phoc_processor": {"type": "phoc", "params": {"max_length": 8}},
        "ocr_token_processor": {"type": "simple_word"},
    }


def _textvqa_row(feature_path="tv/img1.npy", image_path="tv/img1.jpg"):
    return {"question": "what says the sign", "question_id": 77,
            "image_id": 5, "feature_path": feature_path,
            "image_path": image_path,
            "obj_normalized_boxes": np.random.RandomState(0).rand(
                7, 4).astype(np.float32).tolist(),
            "ocr_tokens": ["STOP", "sign"],
            "ocr_normalized_boxes": [[0.1, 0.1, 0.4, 0.4],
                                     [0.5, 0.5, 0.9, 0.9]],
            "answers": ["stop"] * 10}


def _ocr_config(tmp_path, row, **extra):
    apath = tmp_path / "imdb.jsonl"
    apath.write_text(json.dumps(row))
    cfg = {"annotations": str(apath), "features": str(tmp_path),
           "max_features": 10, "use_ocr": True, "use_order_vectors": True,
           "processors": _ocr_processors(tmp_path)}
    cfg.update(extra)
    return cfg


def test_textvqa_builder_ocr_protocol(tmp_path):
    _write_features(tmp_path, "tv/img1")
    # feature_path lacks COCO → rebuilt from image_path
    row = _textvqa_row(feature_path="stale/and/wrong.npy")
    ds = registry.get("builder", "textvqa")().load(_ocr_config(tmp_path, row))
    s = ds[0]
    assert s["question_id"] == 77
    assert s["image_id"] == "5"          # int image ids → str
    assert s["image_feature_0"].shape == (10, 12)
    assert s["obj_bbox_coordinates"].shape == (100, 4)
    assert s["context_feature_0"].shape == (8, 4)      # fasttext dim 4
    assert s["context_feature_1"].shape == (8, 604)    # PHOC
    assert int(s["context_info_0"]["max_features"]) == 2
    # ocr_token_processor lowercases STOP → fasttext hit
    assert abs(s["context_feature_0"][0, 0] - 0.10) < 1e-6
    # m4c answer targets: [copy_steps, vocab + copy-space]
    assert s["targets"].shape == (4, 6 + 8)
    assert s["train_prev_inds"].shape == (4,)
    assert s["order_vectors"].shape == (8, 8)
    assert s["order_vectors"][:2].sum() == 2 and s["order_vectors"][2:].sum() == 0
    assert s["ocr_bbox_coordinates"].shape[1] == 4
    # image_info trimmed to max_features only (dataset.py:107-115)
    assert set(s["image_info_0"]) == {"max_features"}


def test_textvqa_use_ocr_false_blanks_context(tmp_path):
    _write_features(tmp_path, "tv/img1")
    cfg = _ocr_config(tmp_path, _textvqa_row(), use_ocr=False)
    s = registry.get("builder", "textvqa")().load(cfg)[0]
    assert "context_feature_0" not in s
    assert "order_vectors" not in s


def test_stvqa_prefixes_feature_path(tmp_path):
    _write_features(tmp_path, "train/img9")
    row = _textvqa_row(feature_path="img9.npy")
    ds = registry.get("builder", "stvqa")().load(_ocr_config(tmp_path, row))
    assert ds[0]["image_feature_0"].shape == (10, 12)
    # test split reads test_task3/
    _write_features(tmp_path, "test_task3/img9")
    ds = registry.get("builder", "stvqa")().load(
        _ocr_config(tmp_path, row), dataset_type="test")
    assert ds[0]["image_feature_0"].shape == (10, 12)


def test_textcaps_caption_protocol(tmp_path):
    _write_features(tmp_path, "tv/img1")
    row = _textvqa_row()
    del row["answers"], row["question"]
    row.update({"caption_id": 42, "caption_str": "stop sign",
                "reference_strs": ["stop sign", "a red stop sign"],
                "image_path": "tv/img1.jpg",
                "feature_path": "nope.npy", "question_str": "ignored"})
    cfg = _ocr_config(tmp_path, row)
    # textcaps uses the caption answer processor with num_answers: 1
    # (projects/m4c_captioner configs)
    cfg["processors"]["answer_processor"] = {
        "type": "m4c_caption",
        "params": {"vocab": ["<pad>", "<s>", "</s>", "<unk>",
                             "red", "stop"],
                   "preprocessor": {"type": "simple_word"},
                   "num_answers": 1, "max_length": 8,
                   "max_copy_steps": 4}}
    ds = registry.get("builder", "textcaps")().load(cfg)
    s = ds[0]
    assert s["question_id"] == 42          # caption_id becomes question_id
    assert s["caption_str"] == "stop sign"
    assert len(s["ref_strs"]) == 2
    assert "answers" not in s
    assert s["targets"].shape == (4, 14)   # caption scored as the answer
    assert s["targets"][0].max() == 1.0


def test_ocrvqa_no_path_rewrite(tmp_path):
    _write_features(tmp_path, "keepme")
    row = _textvqa_row(feature_path="keepme.npy",
                       image_path="elsewhere/img.jpg")
    ds = registry.get("builder", "ocrvqa")().load(_ocr_config(tmp_path, row))
    assert ds[0]["image_feature_0"].shape == (10, 12)


def test_vqa2_ocr_none_question_id(tmp_path):
    _write_features(tmp_path, "keepme")
    row = _textvqa_row(feature_path="keepme.npy")
    row["question_id"] = None
    ds = registry.get("builder", "vqa2_ocr")().load(_ocr_config(tmp_path, row))
    assert ds[0]["question_id"] == -1


def test_visual_entailment_builder(tmp_path):
    _write_features(tmp_path, "1000092795")
    row = {"Flikr30kID": "1000092795.jpg", "gold_label": "neutral",
           "sentence2": "two dogs"}
    apath = tmp_path / "ve.jsonl"
    apath.write_text(json.dumps(row))
    cfg = {"annotations": str(apath), "features": str(tmp_path),
           "max_features": 10,
           "processors": {"text_processor": BERT_TEXT}}
    s = registry.get("builder", "visual_entailment")().load(cfg)[0]
    assert s["targets"] == 1               # neutral → 1
    assert s["image_feature_0"].shape == (10, 12)
    assert s["input_ids"][0] == VOCAB_D["[CLS]"]


def _hm_rows():
    return [{"id": "3456", "img": "img/03456.png",
             "text": "a movie about space", "label": 1}]


def test_hateful_memes_features(tmp_path):
    _write_features(tmp_path, "03456")
    apath = tmp_path / "train.jsonl"
    apath.write_text(json.dumps(_hm_rows()[0]))
    cfg = {"annotations": str(apath), "features": str(tmp_path),
           "max_features": 10,
           "processors": {"text_processor": BERT_TEXT}}
    s = registry.get("builder", "hateful_memes")().load(cfg)[0]
    assert s["id"] == 3456 and s["targets"] == 1
    assert s["image_feature_0"].shape == (10, 12)


def test_hateful_memes_images_and_predictions(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    (tmp_path / "img").mkdir()
    PIL.new("RGB", (8, 6), (255, 0, 0)).save(tmp_path / "img/03456.png")
    apath = tmp_path / "train.jsonl"
    apath.write_text(json.dumps(_hm_rows()[0]))
    cfg = {"annotations": str(apath), "images": str(tmp_path),
           "processors": {"text_processor": BERT_TEXT}}
    ds = registry.get("builder", "hateful_memes")().load(cfg)
    s = ds[0]
    assert s["image"].shape == (6, 8, 3)
    preds = ds.format_for_prediction(
        {"id": [3456], "scores": np.array([[0.0, 2.0]])})
    assert preds[0]["label"] == 1 and preds[0]["proba"] > 0.8


def test_mmimdb_builder(tmp_path):
    _write_features(tmp_path, "m1")
    row = {"plot": ["a movie about space"], "genres": ["red", "blue"],
           "feature_path": "m1.npy"}
    apath = tmp_path / "mm.jsonl"
    apath.write_text(json.dumps(row))
    cfg = {"annotations": str(apath), "features": str(tmp_path),
           "max_features": 10,
           "processors": {
               "text_processor": BERT_TEXT,
               "answer_processor": {
                   "type": "multi_hot_answer_from_vocab",
                   "params": {"vocab": ["red", "blue", "dog"],
                              "preprocessor": "simple_word"}}}}
    s = registry.get("builder", "mmimdb")().load(cfg)[0]
    # multi-hot over <unk>+vocab, both genres on
    assert s["targets"].sum() == 2.0
    assert s["image_feature_0"].shape == (10, 12)


def test_clevr_builder(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    qdir = tmp_path / "questions"
    qdir.mkdir()
    (tmp_path / "images" / "train").mkdir(parents=True)
    PIL.new("RGB", (8, 6), (0, 128, 255)).save(
        tmp_path / "images/train/CLEVR_train_000000.png")
    (qdir / "CLEVR_train_questions.json").write_text(json.dumps(
        {"questions": [{"question": "what color is the dog?",
                        "answer": "red",
                        "image_filename": "CLEVR_train_000000.png"}]}))
    cfg = {"data_folder": str(tmp_path),
           "processors": {
               "text_processor": {
                   "type": "vocab",
                   "params": {"vocab": {"words": ["what", "color", "is",
                                                  "the", "dog"]},
                              "max_length": 10}},
               "answer_processor": {
                   "type": "vqa_answer",
                   "params": {"vocab": ["red", "blue"],
                              "preprocessor": "simple_word"}}}}
    ds = registry.get("builder", "clevr")().load(cfg)
    s = ds[0]
    assert s["image"].shape == (3, 6, 8)   # CHW in [0,1]
    assert s["image"].max() <= 1.0
    assert s["targets"].max() == 1.0
    assert s["text"].shape == (10,)


def test_visual_dialog_builder(tmp_path):
    _write_features(tmp_path, "901")
    blob = {"split": "train",
            "data": {"questions": ["what color is the dog"],
                     "answers": ["red"],
                     "dialogs": [{"image_id": 901,
                                  "dialog": [{"question": 0, "answer": 0}
                                             ] * 10}]}}
    apath = tmp_path / "visdial.json"
    apath.write_text(json.dumps(blob))
    cfg = {"annotations": str(apath), "features": str(tmp_path),
           "max_features": 10,
           "processors": {
               "text_processor": BERT_TEXT,
               "answer_processor": {
                   "type": "vqa_answer",
                   "params": {"vocab": ["red", "blue"],
                              "preprocessor": "simple_word"}}}}
    ds = registry.get("builder", "visual_dialog")().load(cfg)
    assert len(ds) == 10                   # 10 rounds per train dialog
    s = ds[3]
    assert s["dialog_id"] == 0 and s["round_id"] == 3
    assert s["image_feature_0"].shape == (10, 12)
    assert s["targets"].max() == 1.0


def test_conceptual_captions_builder(tmp_path):
    _write_features(tmp_path, "cc1")
    row = {"image_id": 4, "captions": ["a movie about space"],
           "feature_path": "cc1.npy"}
    apath = tmp_path / "cc.jsonl"
    apath.write_text(json.dumps(row))
    cfg = {"annotations": str(apath), "features": str(tmp_path),
           "max_features": 10,
           "processors": {"text_processor": BERT_TEXT}}
    s = registry.get("builder", "conceptual_captions")().load(cfg)[0]
    assert s["image_id"] == 4
    assert s["answers"].shape[0] == 1
    assert s["image_feature_0"].shape == (10, 12)


def test_vqa_hat_builder_image_fallback(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    PIL.new("RGB", (8, 6)).save(tmp_path / "hat7.jpg")
    row = {"question": "what color is the dog", "question_id": 12,
           "image_id": 7, "image_name": "hat7",
           "answers": ["red"] * 10}
    apath = tmp_path / "hat.jsonl"
    apath.write_text(json.dumps(row))
    cfg = {"annotations": str(apath), "images": str(tmp_path),
           "processors": {
               "text_processor": BERT_TEXT,
               "answer_processor": {
                   "type": "vqa_answer",
                   "params": {"vocab": ["red", "blue"],
                              "preprocessor": "simple_word"}}}}
    for name in ("vqa_hat", "vqa_hat_train_val", "vqa_hat_test"):
        s = registry.get("builder", name)().load(cfg)[0]
        assert s["image"].shape == (6, 8, 3)
        assert s["targets"].max() == 1.0
        assert s["question_id"] == 12


def test_collate_textvqa_batch(tmp_path):
    _write_features(tmp_path, "tv/img1")
    ds = registry.get("builder", "textvqa")().load(
        _ocr_config(tmp_path, _textvqa_row()))
    batch = collate([ds[0], ds[0]])
    assert batch["targets"].shape == (2, 4, 14)
    assert batch["context_feature_0"].shape == (2, 8, 4)
    assert batch["image_feature_0"].shape == (2, 10, 12)


def test_every_reference_builder_name_registered():
    """The full reference registry surface
    (grep register_builder over mmf/datasets/builders)."""
    ref_names = """clevr coco conceptual_captions gqa hateful_memes
      masked_coco masked_coco2017 masked_conceptual_captions
      masked_flickr30k masked_gqa masked_localized_narratives
      masked_mmimdb masked_q_vqa2 masked_sbu masked_visual_genome
      masked_vqa2 mmimdb nlvr2 ocrvqa okvqa stvqa textcaps textvqa
      visual_dialog visual_entailment visual_genome vizwiz vqa2
      vqa2_ocr vqa2_test vqa2_train_val vqa_hat vqa_hat_test
      vqa_hat_train_val vqacp_v2""".split()
    from transformer_mm_explainability_tpu.data import masked_datasets  # noqa: F401
    for name in ref_names:
        assert registry.get("builder", name) is not None, name
