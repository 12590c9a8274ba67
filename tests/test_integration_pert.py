"""Full-protocol integration test: VQA json + feature TSV + WordPiece
vocab → CLI perturbation run end-to-end (the reference's
``run.py trainer=mmf_pert`` surface with real file plumbing)."""

import base64
import json

import numpy as np
import pytest

from transformer_mm_explainability_tpu import cli


@pytest.fixture()
def vqa_files(tmp_path):
    rng = np.random.RandomState(0)
    # questions json (VQA schema)
    questions = [
        {"question_id": i, "img_id": f"COCO_val_{i % 2}",
         "sent": "what color is the dog?",
         "label": {"brown": 1.0, "black": 0.3}}
        for i in range(4)
    ]
    qp = tmp_path / "questions.json"
    qp.write_text(json.dumps(questions))

    # answer vocab
    ans2label = {"brown": 0, "black": 1, "yes": 2}
    (tmp_path / "ans2label.json").write_text(json.dumps(ans2label))
    (tmp_path / "label2ans.json").write_text(
        json.dumps(["brown", "black", "yes"]))

    # feature TSV (2 images, 5 boxes, 2048-d)
    rows = []
    for i in range(2):
        n = 5
        boxes = (rng.rand(n, 4) * 100).astype(np.float32)
        feats = rng.randn(n, 2048).astype(np.float32)
        oid = rng.randint(0, 10, n).astype(np.int64)
        conf = rng.rand(n).astype(np.float32)
        rows.append("\t".join([
            f"COCO_val_{i}", "480", "640",
            base64.b64encode(oid.tobytes()).decode(),
            base64.b64encode(conf.tobytes()).decode(),
            base64.b64encode(oid.tobytes()).decode(),
            base64.b64encode(conf.tobytes()).decode(),
            str(n),
            base64.b64encode(boxes.tobytes()).decode(),
            base64.b64encode(feats.tobytes()).decode(),
        ]))
    fp = tmp_path / "feats.tsv"
    fp.write_text("\n".join(rows) + "\n")

    # WordPiece vocab covering the question
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "what", "color", "is",
             "the", "dog", "?"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab) + "\n")
    return tmp_path


def test_cli_perturbation_with_files(vqa_files, capsys):
    rc = cli.main([
        "perturbation", "--model", "visual_bert",
        "--method", "ours_no_lrp", "--num-samples", "3",
        "--is-positive-pert", "false", "--is-text-pert", "false",
        "--questions", str(vqa_files / "questions.json"),
        "--features", str(vqa_files / "feats.tsv"),
        "--ans2label", str(vqa_files / "ans2label.json"),
        "--label2ans", str(vqa_files / "label2ans.json"),
        "--bert-vocab", str(vqa_files / "vocab.txt"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    result = json.loads([l for l in out.splitlines()
                         if l.startswith("{")][-1])
    assert result["num_samples"] == 3
    assert len(result["step_accuracies"]) == 9
    assert "auc" in result


def test_cli_perturbation_requires_vocab(vqa_files):
    rc = cli.main([
        "perturbation", "--questions", str(vqa_files / "questions.json"),
        "--features", str(vqa_files / "feats.tsv"),
        "--ans2label", str(vqa_files / "ans2label.json"),
        "--label2ans", str(vqa_files / "label2ans.json"),
        "--num-samples", "1",
    ])
    assert rc == 2
