"""LXMERT AnswerTable + QA-head surgery (C36,
lxmert/src/pretrain/qa_answer_table.py) — convert_ans parity vs the
reference class and row-copy semantics."""

import importlib.util
import json
import sys

import numpy as np
import pytest

from conftest import REFERENCE, requires_reference

from transformer_mm_explainability_tpu.data import qa_answer_table as QT

ENTRIES = [
    {"ans": "man", "dsets": ["vqa", "gqa"]},
    {"ans": "gray", "dsets": ["vqa"]},
    {"ans": "2", "dsets": ["gqa"]},
    {"ans": "cat", "dsets": ["visual7w"]},
]


@requires_reference
def test_convert_ans_parity(tmp_path, monkeypatch):
    (tmp_path / "data" / "lxmert").mkdir(parents=True)
    (tmp_path / "data" / "lxmert" / "all_ans.json").write_text(
        json.dumps(ENTRIES))
    monkeypatch.chdir(tmp_path)
    spec = importlib.util.spec_from_file_location(
        "ref_qa_table",
        str(REFERENCE / "lxmert/lxmert/src/pretrain/qa_answer_table.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_qa_table"] = mod
    try:
        spec.loader.exec_module(mod)
        ref = mod.AnswerTable()
        ours = QT.AnswerTable(entries=ENTRIES)
        for ans in ["A man.", "the woman", "Grey", "one", "an apple",
                    "THE CAT", "", "ten"]:
            assert ours.convert_ans(ans) == ref.convert_ans(ans), ans
        assert ours.num_answers == ref.num_answers
        assert ours.ans2id_map() == ref.ans2id_map()
        ref_d = mod.AnswerTable(dsets=["gqa"])
        ours_d = QT.AnswerTable(dsets=["gqa"], entries=ENTRIES)
        assert ours_d.all_answers() == ref_d.all_answers()
    finally:
        sys.modules.pop("ref_qa_table", None)


def test_qa_head_surgery():
    table = QT.AnswerTable(entries=ENTRIES)
    D = 4
    rs = np.random.RandomState(0)
    pw = rs.randn(table.num_answers, D).astype(np.float32)
    pb = rs.randn(table.num_answers).astype(np.float32)
    label2ans = {0: "the man",   # → man (loaded)
                 1: "zebra",     # unmatched → zeros
                 2: "two",       # → 2 (loaded)
                 3: "Grey"}      # → gray (loaded)
    w, b, loaded, unload = QT.load_lxmert_qa_head(pw, pb, table,
                                                  label2ans)
    assert (loaded, unload) == (3, 1)
    np.testing.assert_allclose(w[0], pw[table.ans2id("man")])
    np.testing.assert_allclose(w[2], pw[table.ans2id("2")])
    np.testing.assert_allclose(w[3], pw[table.ans2id("gray")])
    np.testing.assert_allclose(w[1], 0.0)
    np.testing.assert_allclose(b[1], 0.0)
    # list-form label2ans (qa_answer_table.py:127-128)
    w2, _, _, _ = QT.load_lxmert_qa_head(
        pw, pb, table, ["the man", "zebra", "two", "Grey"])
    np.testing.assert_allclose(w2, w)
