"""Masked pretraining datasets (coco/vqa2/visual_genome protocols)."""

import json
import os

import numpy as np
import pytest

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "man",
         "rides", "horse", "dog", "runs", "what", "color", "is", "the",
         "cat", "sky", "blue", "red", "two", "birds"]
VOCAB_DICT = {w: i for i, w in enumerate(VOCAB)}


def _write_features(root, names, n=4, dim=8):
    rng = np.random.RandomState(0)
    for name in names:
        np.save(os.path.join(root, name + ".npy"),
                rng.rand(n, dim).astype(np.float32))
        np.save(os.path.join(root, name + "_info.npy"), {
            "image_height": 10, "image_width": 20, "num_boxes": n,
            "bbox": rng.rand(n, 4).astype(np.float32)})


def _processors(max_len=16, masks=True):
    p = {
        "masked_token_processor": {
            "type": "masked_token",
            "params": {"tokenizer_config": {"vocab": VOCAB_DICT},
                       "max_seq_length": max_len,
                       "mask_probability": 0.15, "seed": 3}},
    }
    if masks:
        p["masked_region_processor"] = {
            "type": "masked_region", "params": {"seed": 5}}
    return p


def test_masked_coco_two_sentence(tmp_path):
    from transformer_mm_explainability_tpu.data import masked_datasets

    ann = [{"image_id": i,
            "captions": ["a man rides a horse", "a man and a horse"],
            "feature_path": f"img_{i}.npy"} for i in range(4)]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    _write_features(str(tmp_path), [f"img_{i}" for i in range(4)])

    cfg = {"annotations": str(tmp_path / "ann.npy"),
           "features": str(tmp_path), "max_features": 4,
           "use_image_feature_masks": True,
           "processors": _processors(), "seed": 11,
           "two_sentence": True}
    ds = masked_datasets.MaskedCOCODataset("masked_coco", cfg, "train")
    assert len(ds) == 4
    seen_correct = set()
    for idx in range(4):
        s = ds[idx]
        assert s["input_ids"].shape == (16,)
        assert s["lm_label_ids"].shape == (16,)
        assert "image_labels" in s  # masked-region labels
        assert s["image_labels"].shape == (4,)
        # two-sentence mode always carries a second segment
        assert s["segment_ids"].max() == 1
        seen_correct.add(int(s["is_correct"]))
    # with the seeded rng both branches occur across 4 samples
    assert seen_correct <= {0, 1} and len(seen_correct) >= 1

    # deterministic replay: rebuilding the dataset repeats the draws
    a = [masked_datasets.MaskedCOCODataset("masked_coco", cfg,
                                           "train")[i]["input_ids"]
         for i in range(2)]
    b = [masked_datasets.MaskedCOCODataset("masked_coco", cfg,
                                           "train")[i]["input_ids"]
         for i in range(2)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_masked_coco_eval_no_pairing(tmp_path):
    from transformer_mm_explainability_tpu.data import masked_datasets

    ann = [{"image_id": 0, "captions": ["a man rides a horse"],
            "feature_path": "img_0.npy"}]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    _write_features(str(tmp_path), ["img_0"])
    cfg = {"annotations": str(tmp_path / "ann.npy"),
           "features": str(tmp_path), "max_features": 4,
           "processors": _processors(masks=False)}
    ds = masked_datasets.MaskedCOCODataset("masked_coco", cfg, "val")
    s = ds[0]
    # non-train: no second sentence, is_correct stays -1
    assert int(s["is_correct"]) == -1
    assert s["segment_ids"].max() == 0
    assert "image_labels" not in s


def test_masked_vqa2(tmp_path):
    from transformer_mm_explainability_tpu.data import masked_datasets
    from transformer_mm_explainability_tpu.core.registry import registry

    ann = [{"image_id": 1, "question_id": 9,
            "question_str": "what color is the sky",
            "question_tokens": ["what", "color", "is", "the", "sky"],
            "all_answers": ["blue"] * 10,
            "answers": ["blue"] * 10,
            "feature_path": "img_1.npy"}]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    _write_features(str(tmp_path), ["img_1"])

    procs = _processors()
    procs["text_processor"] = {
        "type": "bert_tokenizer",
        "params": {"tokenizer_config": {"vocab": VOCAB_DICT},
                   "max_seq_length": 16}}
    procs["answer_processor"] = {
        "type": "vqa_answer",
        "params": {"vocab": ["blue", "red"], "num_answers": 10,
                   "preprocessor": "simple_word"}}
    cfg = {"annotations": str(tmp_path / "ann.npy"),
           "features": str(tmp_path), "max_features": 4,
           "processors": procs, "add_answer": True}

    builder = registry.get("builder", "masked_vqa2")()
    ds = builder.load(cfg, "train")
    s = ds[0]
    assert int(s["is_correct"]) == -1
    # question + answer pair → both segments present
    assert s["segment_ids"].max() == 1
    assert "targets" in s  # add_answer=True


def test_masked_visual_genome(tmp_path):
    from transformer_mm_explainability_tpu.data import masked_datasets

    ann = [{"id": 77, "image_id": 2,
            "question": "what is the man riding",
            "answers": ["the horse?"],
            "feature_path": "img_2.npy"}]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    _write_features(str(tmp_path), ["img_2"])

    procs = _processors()
    procs["answer_processor"] = {
        "type": "vqa_answer",
        "params": {"vocab": ["horse", "dog"], "num_answers": 10,
                   "preprocessor": "simple_word"}}
    cfg = {"annotations": str(tmp_path / "ann.npy"),
           "features": str(tmp_path), "max_features": 4,
           "processors": procs}
    ds = masked_datasets.MaskedVisualGenomeDataset(
        "masked_visual_genome", cfg, "train")
    s = ds[0]
    # single segment (text_b None)
    assert s["segment_ids"].max() == 0
    # answer preprocessing strips articles/punctuation → "horse"
    assert "targets" in s
    assert float(np.asarray(s["targets"]).max()) > 0


def test_masked_builders_registered():
    import transformer_mm_explainability_tpu.zoo  # noqa: F401
    from transformer_mm_explainability_tpu.core.registry import registry

    for name in ("masked_coco", "masked_conceptual_captions",
                 "masked_vqa2", "masked_visual_genome"):
        assert registry.get("builder", name) is not None
