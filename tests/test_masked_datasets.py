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


def test_masked_q_vqa2(tmp_path):
    from transformer_mm_explainability_tpu.data import masked_datasets

    ann = [{"image_id": 1, "question_id": 9,
            "question_str": "what color is the sky",
            "question_tokens": ["what", "color", "is", "the", "sky"],
            "answers": ["blue"] * 10,
            "feature_path": "img_1.npy"}]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    _write_features(str(tmp_path), ["img_1"])

    q_words = ["what", "color", "is", "the", "sky", "<mask>"]
    procs = {
        "text_processor": {"type": "vocab",
                           "params": {"vocab": {"words": q_words},
                                      "max_length": 8}},
        "answer_processor": {"type": "vqa_answer",
                             "params": {"vocab": q_words,
                                        "num_answers": 10}},
    }
    cfg = {"annotations": str(tmp_path / "ann.npy"),
           "features": str(tmp_path), "max_features": 4,
           "processors": procs, "seed": 2}
    ds = masked_datasets.MaskedQVQA2Dataset("masked_q_vqa2", cfg,
                                            "train")
    s = ds[0]
    from transformer_mm_explainability_tpu.data.processors import Vocab

    text = np.asarray(s["text"])
    mask_id = ds.text_processor.vocab.get_stoi()["<mask>"]
    # exactly one real token replaced by <mask>
    assert int((text[:5] == mask_id).sum()) == 1
    # the masked word became the (full-score) answer target
    masked_pos = int(np.argmax(text[:5] == mask_id))
    word = ann[0]["question_tokens"][masked_pos]
    aidx = ds.answer_processor.word2idx(word)
    assert float(np.asarray(s["targets"])[aidx]) == 1.0


def test_masked_mmimdb_and_localized_narratives(tmp_path):
    from transformer_mm_explainability_tpu.data import masked_datasets

    # --- mmimdb: plot + random genre ---------------------------------
    ann = [{"image_id": 5, "plot": ["a man rides a horse"],
            "genres": ["western"], "feature_path": "img_5.npy"}]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    _write_features(str(tmp_path), ["img_5"])
    cfg = {"annotations": str(tmp_path / "ann.npy"),
           "features": str(tmp_path), "max_features": 4,
           "processors": _processors()}
    # needs a text_processor for the VQA2 base init? no — load_item
    # is fully overridden, text_processor unused
    cfg["processors"]["text_processor"] = {
        "type": "bert_tokenizer",
        "params": {"tokenizer_config": {"vocab": VOCAB_DICT},
                   "max_seq_length": 16}}
    ds = masked_datasets.MaskedMMImdbDataset("masked_mmimdb", cfg,
                                             "train")
    s = ds[0]
    assert int(s["is_correct"]) == -1
    assert s["segment_ids"].max() == 1  # plot [SEP] genre

    # --- localized narratives: whole caption, empty text_b ----------
    ann2 = [{"image_id": 6, "caption": "two birds",
             "feature_path": "img_6.npy"}]
    np.save(tmp_path / "ann2.npy", np.array(
        [{"metadata": True}] + ann2, dtype=object))
    _write_features(str(tmp_path), ["img_6"])
    cfg2 = {"annotations": str(tmp_path / "ann2.npy"),
            "features": str(tmp_path), "max_features": 4,
            "processors": _processors(masks=False)}
    ds2 = masked_datasets.MaskedLocalizedNarrativesDataset(
        "masked_localized_narratives", cfg2, "train")
    s2 = ds2[0]
    assert int(s2["is_correct"]) == 1  # True
    assert s2["segment_ids"].max() == 0  # no second segment
    assert s2["feature_path"] == "img_6.npy"
    # image_info_0's image_id renamed to feature_path
    assert "image_info_0" in s2


def test_masked_builders_registered():
    import transformer_mm_explainability_tpu.zoo  # noqa: F401
    from transformer_mm_explainability_tpu.core.registry import registry

    for name in ("masked_coco", "masked_conceptual_captions",
                 "masked_vqa2", "masked_visual_genome",
                 "masked_q_vqa2", "masked_mmimdb",
                 "masked_localized_narratives", "masked_flickr30k",
                 "masked_coco2017", "masked_gqa", "masked_sbu"):
        assert registry.get("builder", name) is not None
