"""The protocol-rehearsal runners (tools/protocol_rehearsal.py) must
assemble and execute end-to-end; tiny scale here, true scale on-chip
(PROTOCOL_r03.json is the recorded artifact)."""

import numpy as np
import pytest

from transformer_mm_explainability_tpu.tools import protocol_rehearsal as pr


@pytest.mark.slow
def test_visualbert_rehearsal_tiny(capsys):
    out = pr.rehearse_visualbert(
        num_samples=3, batch_size=3,
        sweeps=[{"positive": False, "text_pert": False}],
        printer=lambda *a: None)
    sweep = out["sweeps"][0]
    assert sweep["num_samples"] == 3
    assert len(sweep["step_accuracies"]) == 9
    assert np.isfinite(sweep["auc"])
    assert sweep["wall_s"] > 0


@pytest.mark.slow
def test_lxmert_rehearsal_tiny():
    out = pr.rehearse_lxmert(num_samples=2, image_hw=(128, 160),
                             text_len=8, printer=lambda *a: None)
    assert out["num_samples"] == 2
    assert len(out["step_accuracies"]) == 9
    assert np.isfinite(out["auc"])


@pytest.mark.slow
def test_detr_rehearsal_tiny(tmp_path):
    out = pr.rehearse_detr(num_images=2, confidence_threshold=0.005,
                           max_queries_per_pass=4, shortest=128,
                           source_hw=(96, 128), tmpdir=str(tmp_path),
                           printer=lambda *a: None)
    assert out["num_images"] == 2
    assert "AP" in out["stats"]
    assert np.isfinite(out["stats"]["AP"])


def test_prior_phases_merge(tmp_path):
    """Re-running one phase with --out must keep phases recorded by
    earlier invocations (the all-protocol run spans sessions)."""
    art = tmp_path / "proto.json"
    art.write_text(
        '{"artifact": "protocol_rehearsal", "visualbert": {"auc": 1.0},'
        ' "wall_s_total": 3.0, "junk": 7}')
    got = pr._prior_phases(str(art))
    # phases only, no junk; a pre-provenance phase gets tagged rather
    # than silently lacking the backend field forever (ADVICE r04)
    assert got == {"visualbert": {"auc": 1.0, "backend": "unknown",
                                  "devices": None}}

    # a phase that already carries provenance is passed through verbatim
    art.write_text(
        '{"artifact": "protocol_rehearsal",'
        ' "lxmert": {"auc": 0.5, "backend": "tpu", "devices": ["d0"]}}')
    got = pr._prior_phases(str(art))
    assert got["lxmert"]["backend"] == "tpu"

    art.write_text("not json at all")
    assert pr._prior_phases(str(art)) == {}
    assert pr._prior_phases(str(tmp_path / "missing.json")) == {}

    # a foreign JSON file must not be mistaken for a prior artifact
    art.write_text('{"visualbert": {"auc": 9.0}}')
    assert pr._prior_phases(str(art)) == {}


def test_wall_s_total_sums_merged_phases():
    """The artifact's total must sum ALL phases, not just the latest
    invocation's (PROTOCOL_r04.json shipped total=348 s beside a merged
    2853 s phase — VERDICT r04 weak #2)."""
    results = {
        "visualbert": {"wall_s_total": 2853.27},
        "lxmert": {"wall_s": 279.02},
        "detr": {"wall_s": 300.0, "datagen_s": 12.0},
    }
    assert pr._wall_s_total(results) == 3444.29
    assert pr._wall_s_total({"lxmert": {"wall_s": 5.0}}) == 5.0
    assert pr._wall_s_total({}) == 0.0


def test_phase_memory_records_hlo_estimate():
    """On backends with no allocator stats the phase memory record must
    still be non-null: XLA buffer-assignment totals per program."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((64, 64), jnp.float32)
    f(x)  # compile
    rec = pr._phase_memory({"prog": (f, (x,))})
    assert rec["hlo_programs"]["prog"]["argument_bytes"] == 64 * 64 * 4
    assert rec["peak_bytes_estimate"] > 0
    assert rec["hbm_budget_gb"] == 16.0


@pytest.mark.slow
def test_lxmert_rehearsal_resume(tmp_path):
    """The sidecar resume must skip already-recorded samples (the RNG
    stream is deterministic, so a relaunch replays the same protocol)."""
    import json as _json

    side = tmp_path / "resume.json"
    side.write_text(_json.dumps({
        "i": 1, "wall_s": 7.0, "accs_sum": [1.0] * 9,
        "per_sample_ms": [100.0], "compile_s": 2.0}))
    out = pr.rehearse_lxmert(num_samples=2, image_hw=(128, 160),
                             text_len=8, resume_path=str(side),
                             printer=lambda *a: None)
    assert out["resumed_at"] == 1
    assert out["num_samples"] == 2
    assert out["wall_s"] >= 7.0          # prior wall carried over
    # the prior phase's accumulated accuracies are included
    assert min(out["step_accuracies"]) >= 0.5
    assert not side.exists()             # cleaned up on completion
