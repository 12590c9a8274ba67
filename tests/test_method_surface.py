"""Every reference perturbation method name must be dispatchable from
both the runners and the CLI, for both models, down to a produced
per-step accuracy vector.

Reference surfaces:
  * LXMERT — 11 names (lxmert/lxmert/perturbation.py:217-240);
  * VisualBERT — 6 names
    (VisualBERT/mmf/trainers/core/evaluation_loop.py:82-87).
"""

import json

import numpy as np
import pytest

from transformer_mm_explainability_tpu import cli
from transformer_mm_explainability_tpu.harness import pert_runner

LXMERT_REFERENCE_NAMES = [
    # perturbation.py:217-240, verbatim
    "transformer_att", "attn_gradcam", "partial_lrp", "raw_attn",
    "rollout", "ours_with_lrp_no_normalization", "ours_no_lrp",
    "ours_no_lrp_no_norm", "ours_with_lrp", "ablation_no_self_in_10",
    "ablation_no_aggregation",
]
VISUALBERT_REFERENCE_NAMES = [
    # evaluation_loop.py:82-87, verbatim
    "transformer_attribution", "ours_no_lrp", "partial_lrp",
    "raw_attn", "attn_gradcam", "rollout",
]


def test_tables_cover_reference_names():
    assert set(LXMERT_REFERENCE_NAMES) == set(pert_runner.LXMERT_METHODS)
    assert set(VISUALBERT_REFERENCE_NAMES) == set(
        pert_runner.VISUALBERT_METHODS)
    # every CLI-advertised name resolves for at least one model
    for name in cli.METHODS:
        ok = False
        for table, aliases in (
            (pert_runner.LXMERT_METHODS, pert_runner._LXMERT_ALIASES),
            (pert_runner.VISUALBERT_METHODS + ("ours_with_lrp",),
             pert_runner._VISUALBERT_ALIASES),
        ):
            if aliases.get(name, name) in table:
                ok = True
        assert ok, f"CLI advertises undispatchable method {name}"


def _run_cli(model, method, extra=()):
    argv = ["perturbation", "--model", model, "--method", method,
            "--num-samples", "2", *extra]
    rc = cli.main(argv)
    return rc


@pytest.mark.parametrize("method", VISUALBERT_REFERENCE_NAMES)
def test_visualbert_cli_all_methods(method, capsys):
    assert _run_cli("visual_bert", method) == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert len(payload["step_accuracies"]) == 9
    assert np.isfinite(payload["step_accuracies"]).all()


@pytest.mark.parametrize("method", LXMERT_REFERENCE_NAMES)
def test_lxmert_cli_all_methods(method, capsys):
    assert _run_cli("lxmert", method) == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert len(payload["step_accuracies"]) == 9
    assert np.isfinite(payload["step_accuracies"]).all()


@pytest.mark.parametrize("model,method", [
    ("visual_bert", "transformer_attribution"),
    ("lxmert", "ours_with_lrp"),
])
def test_text_modality_dispatch(model, method, capsys):
    assert _run_cli(model, method, ["--is-text-pert", "true"]) == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(payload["step_accuracies"]) == 9


def test_unknown_method_rejected_politely(capsys):
    # an LXMERT-only ablation is not part of the VisualBERT surface
    rc = _run_cli("visual_bert", "ablation_no_self_in_10")
    assert rc == 2
    assert "valid" in capsys.readouterr().out
