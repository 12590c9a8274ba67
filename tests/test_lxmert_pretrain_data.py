"""LXMERT pretraining data composition (C36,
lxmert/src/pretrain/lxmert_data.py) on synthetic sources."""

import numpy as np
import pytest

from transformer_mm_explainability_tpu.data import lxmert_pretrain_data as D
from transformer_mm_explainability_tpu.data.qa_answer_table import (
    AnswerTable)

ENTRIES = [{"ans": "man", "dsets": ["vqa"]},
           {"ans": "cat", "dsets": ["vqa", "gqa"]},
           {"ans": "2", "dsets": ["gqa"]}]


def _raw_data():
    return [
        {"img_id": "i1",
         "sentf": {"mscoco": ["a man standing", "someone here"],
                   "vqa": ["who is it?"]},
         "labelf": {"vqa": [{"the man": 0.9, "zebra": 0.3}]}},
        {"img_id": "i2",
         "sentf": {"vqa": ["how many cats?"]},
         "labelf": {"vqa": [{"two": 1.0}]}},
        {"img_id": "missing",
         "sentf": {"vqa": ["unused"]},
         "labelf": {"vqa": [{"cat": 1.0}]}},
    ]


def _img_data():
    rows = []
    for img_id in ("i1", "i2"):
        rows.append({
            "img_id": img_id, "img_h": 10, "img_w": 20, "num_boxes": 3,
            "features": np.ones((3, 8), np.float32),
            "boxes": np.array([[0, 0, 10, 5], [5, 2, 20, 10],
                               [1, 1, 2, 2]], np.float32),
            "objects_id": np.array([1, 2, 3]),
            "objects_conf": np.array([0.9, 0.8, 0.7], np.float32),
            "attrs_id": np.array([4, 5, 6]),
            "attrs_conf": np.array([0.6, 0.5, 0.4], np.float32),
        })
    return rows


def test_dataset_answer_remap():
    table = AnswerTable(entries=ENTRIES)
    ds = D.LXMERTDataset("synthetic", answer_table=table,
                         data=_raw_data())
    # "the man" → "man" (kept, renamed); "zebra" dropped; "two" → "2"
    assert ds.data[0]["labelf"]["vqa"][0] == {"man": 0.9}
    assert ds.data[1]["labelf"]["vqa"][0] == {"2": 1.0}


def test_pretrain_items_and_matched_swap():
    table = AnswerTable(entries=ENTRIES)
    ds = D.LXMERTDataset("synthetic", answer_table=table,
                         data=_raw_data())
    pd = D.LXMERTPretrainData(ds, _img_data(), task_matched=False,
                              seed=3)
    # img "missing" filtered; i1 contributes 3 sentences, i2 one
    assert len(pd) == 4
    item = pd[2]  # i1's vqa sentence (labeled)
    assert item["uid"] == "i1_vqa_000"
    assert item["is_matched"] == 1
    feats, boxes = item["visual_feats"]
    assert boxes.max() <= 1.0 + 1e-6 and boxes.min() >= 0.0
    assert item["label"] == {table.ans2id("man"): 0.9}
    assert pd[0]["label"] is None  # mscoco caption: unlabeled
    assert pd.random_feat().shape == (8,)

    # matched task: swapped sentences always come from another image
    pm = D.LXMERTPretrainData(ds, _img_data(), task_matched=True,
                              seed=0)
    swapped = [pm[i] for i in range(len(pm)) for _ in range(5)]
    for it in swapped:
        if it["is_matched"] == 0:
            owner = [d for d in pm.data if d["sent"] == it["sent"]]
            assert all(o["img_id"] != it["uid"].split("_")[0]
                       for o in owner)


def test_evaluator_scoring():
    table = AnswerTable(entries=ENTRIES)
    ds = D.LXMERTDataset("synthetic", answer_table=table,
                         data=_raw_data())
    ev = D.LXMERTEvaluator(ds)
    # labeled uids only: i1_vqa_000, i2_vqa_000, missing_vqa_000
    accu, dset2accu = ev.evaluate({
        "i1_vqa_000": "man",      # scores 0.9
        "i2_vqa_000": "7",        # wrong → 0
        "nonexistent": "cat",     # skipped
    })
    assert accu == pytest.approx(0.45)
    assert dset2accu["vqa"] == pytest.approx(0.45)
