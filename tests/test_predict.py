"""predict flow: dataset → VisualBERT scores → TestReporter files
(mmf_cli/predict.py surface)."""

import json
import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "what", "color", "is",
         "the", "sky", "cat"]


def _store(tmp_path, n=5):
    rng = np.random.RandomState(0)
    ann = [{"image_id": i, "question_id": 100 + i,
            "question_str": "what color is the sky",
            "question_tokens": ["what", "color", "is", "the", "sky"],
            "feature_path": f"img_{i}.npy"} for i in range(n)]
    np.save(tmp_path / "ann.npy", np.array(
        [{"metadata": True}] + ann, dtype=object))
    for i in range(n):
        np.save(tmp_path / f"img_{i}.npy",
                rng.rand(4, 2048).astype(np.float32))
        np.save(tmp_path / f"img_{i}_info.npy", {
            "image_height": 10, "image_width": 20, "num_boxes": 4,
            "bbox": rng.rand(4, 4).astype(np.float32)})
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB) + "\n")
    answers = tmp_path / "answers.txt"
    answers.write_text("".join(f"ans{i}\n" for i in range(3129)))
    return vocab_file, answers


def test_predict_cli_end_to_end(tmp_path):
    from transformer_mm_explainability_tpu import cli

    vocab_file, answers = _store(tmp_path)
    rc = cli.main([
        "predict", "--dataset", "vqa2",
        "--annotations", str(tmp_path / "ann.npy"),
        "--features", str(tmp_path),
        "--bert-vocab", str(vocab_file),
        "--label2ans", str(answers),
        "--report-folder", str(tmp_path / "reports"),
        "--batch-size", "2", "--max-samples", "5",
        "--max-seq-length", "16", "--max-features", "4",
    ])
    assert rc == 0
    files = os.listdir(tmp_path / "reports")
    assert len(files) == 1 and files[0].startswith("vqa2_")
    rows = json.load(open(tmp_path / "reports" / files[0]))
    assert len(rows) == 5
    assert sorted(r["question_id"] for r in rows) == list(
        range(100, 105))
    # label2ans mapping applied
    assert all(str(r["answer"]).startswith("ans") for r in rows)
    # deterministic model → identical duplicate questions agree
    assert len({r["answer"] for r in rows}) == 1


def test_predict_requires_vocab(tmp_path, capsys):
    from transformer_mm_explainability_tpu import cli

    _store(tmp_path)
    rc = cli.main([
        "predict", "--annotations", str(tmp_path / "ann.npy"),
        "--features", str(tmp_path)])
    assert rc == 2
    assert "bert-vocab" in capsys.readouterr().out
