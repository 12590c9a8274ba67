"""MultiDatasetLoader (mmf/datasets/multi_dataset_loader.py) +
TestReporter (mmf/common/test_reporter.py) semantics."""

import json

import numpy as np
import pytest

from transformer_mm_explainability_tpu.core.test_reporter import (
    TestReporter)
from transformer_mm_explainability_tpu.data.multi_dataset import (
    MultiDatasetLoader)


def _loader(name, n, bs=2):
    def make():
        return iter([{"name": name, "i": i} for i in range(0, n, bs)])
    return make


def test_proportional_interleave_full_coverage():
    loaders = {"a": _loader("a", 8), "b": _loader("b", 4)}
    mdl = MultiDatasetLoader(loaders, lengths={"a": 80, "b": 40},
                             seed=3)
    batches = list(mdl)
    # proportional sampling: every batch of every dataset seen exactly
    # once per epoch
    assert len(batches) == 4 + 2
    names = [n for n, _ in batches]
    assert names.count("a") == 4 and names.count("b") == 2
    assert mdl.probabilities == pytest.approx([2 / 3, 1 / 3])
    # deterministic under the seed
    assert [n for n, _ in MultiDatasetLoader(
        loaders, lengths={"a": 80, "b": 40}, seed=3)] == names


def test_equal_sampling_reignites():
    loaders = {"small": _loader("small", 2), "big": _loader("big", 40)}
    mdl = MultiDatasetLoader(loaders, proportional_sampling=False,
                             seed=0)
    names = []
    for k, (name, _) in enumerate(mdl):
        names.append(name)
        if k >= 29:
            break
    # the small dataset keeps reappearing (reignited past its epoch)
    assert names.count("small") > 1


def test_single_dataset_passthrough():
    mdl = MultiDatasetLoader({"only": _loader("only", 4)})
    assert [b["i"] for b in mdl] == [0, 2]


def test_test_reporter_json_and_csv(tmp_path):
    def proc(report):
        scores = np.asarray(report["scores"])
        return [{"question_id": int(q), "answer": int(s.argmax())}
                for q, s in zip(report["id"], scores)]

    for fmt in ("json", "csv"):
        rep = TestReporter(["vqa2", "gqa"], str(tmp_path / fmt),
                           experiment_name="exp", file_format=fmt,
                           prediction_processor=proc,
                           clock=lambda: 0.0)
        assert rep.next_dataset()
        rep.add_to_report({"id": [1, 2],
                           "scores": np.array([[0.1, 0.9], [0.8, 0.2]])})
        assert rep.next_dataset()
        rep.add_to_report({"id": [3],
                           "scores": np.array([[0.4, 0.6]])})
        assert not rep.next_dataset()  # flushes the second dataset
        assert len(rep.written) == 2
        assert "vqa2_exp_test_" in rep.written[0]
        if fmt == "json":
            rows = json.loads(open(rep.written[0]).read())
            assert rows == [{"question_id": 1, "answer": 1},
                            {"question_id": 2, "answer": 0}]
        else:
            text = open(rep.written[1]).read().splitlines()
            assert text[0] == "question_id,answer"
            assert text[1] == "3,1"

    with pytest.raises(ValueError):
        TestReporter(["x"], str(tmp_path)).add_to_report({"id": []})


def test_empty_dataset_does_not_hang():
    """Regression: a zero-length dataset gets probability 0, never
    finishes, and used to spin _choose forever — it must be dropped."""
    mdl = MultiDatasetLoader({"a": _loader("a", 4), "b": _loader("b", 0)},
                             lengths={"a": 4, "b": 0}, seed=1)
    assert mdl.names == ["a"]
    assert len(list(mdl)) == 2
    with pytest.raises(AssertionError):
        MultiDatasetLoader({"b": _loader("b", 0)}, lengths={"b": 0})


def test_partial_lengths_dict():
    """Regression: a partial lengths dict crashed __init__ (filter used
    .get default 1, probabilities used direct indexing)."""
    mdl = MultiDatasetLoader({"a": _loader("a", 4), "b": _loader("b", 2)},
                             lengths={"a": 4}, seed=0)
    assert mdl.probabilities == pytest.approx([4 / 5, 1 / 5])
    names = [n for n, _ in mdl]
    assert sorted(set(names)) == ["a", "b"]
