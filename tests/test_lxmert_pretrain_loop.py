"""LXMERT pretraining loop (C36, lxmert/src/pretrain/
lxmert_pretrain.py): masking semantics + one end-to-end epoch on a
tiny config."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from transformer_mm_explainability_tpu.data import lxmert_pretrain_data as D
from transformer_mm_explainability_tpu.data.qa_answer_table import (
    AnswerTable)
from transformer_mm_explainability_tpu.data.tokenization import (
    BertTokenizer)
from transformer_mm_explainability_tpu.models import lxmert as lx
from transformer_mm_explainability_tpu.train import lxmert_pretrain_loop as P

VOCAB = {"[PAD]": 0, "[UNK]": 1, "[CLS]": 2, "[SEP]": 3, "[MASK]": 4,
         "a": 5, "man": 6, "standing": 7, "how": 8, "many": 9,
         "cats": 10, "who": 11, "is": 12, "it": 13, "someone": 14,
         "here": 15, "unused": 16}


def _tok():
    return BertTokenizer(vocab=VOCAB)


def test_random_word_rates_and_labels():
    rng = np.random.RandomState(0)
    ids = list(range(5, 16)) * 200
    masked, labels = P.random_word(ids, mask_id=4, vocab_size=17,
                                   rng=rng, word_mask_rate=0.15)
    n = len(ids)
    n_masked = sum(1 for l in labels if l != -1)
    assert 0.10 < n_masked / n < 0.20
    # labels carry ORIGINAL ids exactly where masked
    for orig, new, lab in zip(ids, masked, labels):
        if lab != -1:
            assert lab == orig
        else:
            assert new == orig
    n_mask_tok = sum(1 for m, l in zip(masked, labels)
                     if l != -1 and m == 4)
    assert n_mask_tok / max(n_masked, 1) > 0.6  # ~80% → [MASK]


def test_random_feat_masking():
    rng = np.random.RandomState(1)
    feats = np.ones((400, 8), np.float32)
    masked, mask = P.random_feat(feats, rng,
                                 lambda: np.full((8,), 7.0, np.float32),
                                 obj_mask_rate=0.15)
    frac = mask.mean()
    assert 0.10 < frac < 0.20
    zeroed = (masked.sum(-1) == 0).mean()
    assert zeroed > 0.08  # ~80% of the 15%
    assert (masked[mask == 0] == 1.0).all()  # unmasked untouched


def _dataset():
    entries = [{"ans": "man", "dsets": ["vqa"]},
               {"ans": "2", "dsets": ["vqa"]}]
    table = AnswerTable(entries=entries)
    raw = [
        {"img_id": "i1",
         "sentf": {"mscoco": ["a man standing"],
                   "vqa": ["who is it"]},
         "labelf": {"vqa": [{"the man": 0.9}]}},
        {"img_id": "i2",
         "sentf": {"vqa": ["how many cats"]},
         "labelf": {"vqa": [{"two": 1.0}]}},
    ]
    ds = D.LXMERTDataset("synthetic", answer_table=table, data=raw)
    rs = np.random.RandomState(2)
    img_data = [{
        "img_id": i, "img_h": 10, "img_w": 20, "num_boxes": 5,
        "features": rs.randn(5, 16).astype(np.float32),
        "boxes": np.abs(rs.rand(5, 4)).astype(np.float32) * [20, 10, 20, 10],
        "objects_id": rs.randint(0, 9, 5),
        "objects_conf": np.ones(5, np.float32),
        "attrs_id": rs.randint(0, 4, 5),
        "attrs_conf": np.ones(5, np.float32),
    } for i in ("i1", "i2")]
    for d in img_data:  # keep boxes within the image for the assert
        d["boxes"] = np.clip(d["boxes"], 0, [20, 10, 20, 10]).astype(
            np.float32)
    return D.LXMERTPretrainData(ds, img_data, task_matched=True, seed=3)


def test_convert_and_train_epoch():
    pd = _dataset()
    tok = _tok()
    rng = np.random.RandomState(4)
    feat = P.convert_example_to_features(pd[1], 12, tok, rng,
                                         pd.random_feat)
    assert feat["input_ids"].shape == (12,)
    assert feat["input_ids"][0] == VOCAB["[CLS]"]
    assert feat["feat_targets"].shape == (5, 16)
    assert feat["matched_label"] in (0, 1)

    cfg = lx.LxmertConfig(
        vocab_size=len(VOCAB), hidden_size=16, num_attention_heads=2,
        intermediate_size=24, max_position_embeddings=16,
        l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=16, visual_pos_dim=4, num_qa_labels=2)
    lines = []
    out = P.train(pd, tok, cfg,
                  P.PretrainConfig(epochs=2, batch_size=3,
                                   max_seq_length=12),
                  seed=0, printer=lines.append)
    assert len(out["history"]) == 2
    for means in out["history"]:
        assert all(np.isfinite(v) for v in means.values())
    assert any("Epoch" in ln for ln in lines)
