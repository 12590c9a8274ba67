"""Smoke test for tools/bench_families.py (tiny CPU mode)."""

import json

from transformer_mm_explainability_tpu.tools import bench_families as bf


def test_tiny_benches_run(capsys):
    results = bf.run(["clip", "visual_bert"], tiny=True, iters=1)
    assert [r["family"] for r in results] == ["clip", "visual_bert_pert"]
    for r in results:
        assert r["ms_per_call"] > 0
        assert r["ms_per_unit"] <= r["ms_per_call"]
    # each family printed one parseable JSON line
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 2
    for ln in lines:
        assert json.loads(ln)["ms_per_call"] > 0


def test_tiny_detr_lxmert_frcnn():
    results = bf.run(["detr", "lxmert", "frcnn"], tiny=True, iters=1)
    assert [r["family"] for r in results] == ["detr", "lxmert", "frcnn"]
    assert results[0]["n"] == 2  # K queries batched into one fwd+bwd
    assert results[2]["unit"] == "image"
