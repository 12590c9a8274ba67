"""bench.py _run_attempts: the driver-facing contract is ONE JSON line
on stdout no matter what the chip does. Exercised here with subprocess
stubs (the wedged-chip path was also exercised in anger against a live
wedge — see ROUND2.md continuation 3)."""

import importlib.util
import json
import os
import subprocess
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "tmmx_bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


GOOD = json.dumps({"metric": "m", "value": 1.0, "unit": "u",
                   "vs_baseline": 1.0})


def _proc(rc, stdout):
    return subprocess.CompletedProcess(args=[], returncode=rc,
                                       stdout=stdout, stderr="")


def test_first_attempt_success_gets_no_cpu_note(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _proc(0, GOOD + "\n"))
    assert bench._run_attempts() == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert "note" not in rec


def test_cpu_note_keyed_on_plan_not_env(monkeypatch, capsys):
    # even with JAX_PLATFORMS=cpu exported (the documented CPU recipe),
    # a SUCCESSFUL attempt 0 must not be stamped as a TPU-fallback
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    bench = _load_bench()
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _proc(0, GOOD + "\n"))
    assert bench._run_attempts() == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert "note" not in rec


def test_fallback_plan_gets_note_and_last_json_line_wins(monkeypatch,
                                                         capsys):
    bench = _load_bench()
    calls = []

    def fake_run(*a, **k):
        calls.append(k)
        if len(calls) < 3:
            raise subprocess.TimeoutExpired(cmd="x", timeout=1)
        # stray brace-prefixed log lines before (and a non-dict after)
        # the real record must not break parsing; LAST metric line wins
        out = ('{"event": "compile-cache hit"}\n'
               "{not json at all\n"
               + json.dumps({"metric": "stale", "value": 0.0}) + "\n"
               + GOOD + "\n")
        return _proc(0, out)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._run_attempts() == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] == 1.0
    assert rec["note"].startswith("TPU unreachable")
    # the fallback child really dropped the plugin registration
    assert "PALLAS_AXON_POOL_IPS" not in calls[2]["env"]
    assert calls[2]["env"]["JAX_PLATFORMS"] == "cpu"


def test_tpu_success_refreshes_sidecar_fallback_reads_it(
        monkeypatch, capsys, tmp_path):
    # a TPU-run record (on_tpu=true) refreshes BENCH_LAST_TPU.json; a
    # later CPU fallback echoes THAT record, never a source-baked one
    bench = _load_bench()
    sidecar = tmp_path / "last_tpu.json"
    monkeypatch.setattr(bench, "_LAST_TPU_PATH", str(sidecar))
    tpu_rec = json.dumps({"metric": "m", "value": 1234.5, "unit": "u",
                          "vs_baseline": 9.9, "bf16_maps_per_sec": 1500.0,
                          "on_tpu": True})
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _proc(0, tpu_rec + "\n"))
    assert bench._run_attempts() == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert "on_tpu" not in out  # internal plumbing, not driver schema
    saved = json.loads(sidecar.read_text())
    assert saved["fp32_maps_per_sec"] == 1234.5
    assert saved["bf16_maps_per_sec"] == 1500.0

    def fallback_run(*a, **k):
        if fallback_run.calls < 2:
            fallback_run.calls += 1
            raise subprocess.TimeoutExpired(cmd="x", timeout=1)
        return _proc(0, GOOD + "\n")

    fallback_run.calls = 0
    monkeypatch.setattr(subprocess, "run", fallback_run)
    assert bench._run_attempts() == 0
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["last_tpu_measurement"]["fp32_maps_per_sec"] == 1234.5


def test_all_attempts_failed_still_emits_one_json_line(monkeypatch,
                                                       capsys):
    bench = _load_bench()
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _proc(1, "boom\n"))
    assert bench._run_attempts() == 1
    lines = [l for l in capsys.readouterr().out.splitlines() if l]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["value"] == 0.0 and "error" in rec


def test_no_rebaseline_on_flagged_regression(monkeypatch, tmp_path, capsys):
    """A run flagged `regression: true` must NOT rewrite the sidecar:
    re-baselining on the regressed median would make the same slowdown
    read as healthy from the next run onward."""
    bench = _load_bench()
    sidecar = tmp_path / "last.json"
    sidecar.write_text(json.dumps({"fp32_maps_per_sec": 900.0}))
    monkeypatch.setattr(bench, "_LAST_TPU_PATH", str(sidecar))

    regressed = json.dumps({"metric": "m", "value": 700.0, "unit": "u",
                            "vs_baseline": 5.6, "on_tpu": True,
                            "regression": True})
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _proc(0, regressed + "\n"))
    assert bench._run_attempts() == 0
    capsys.readouterr()
    assert json.loads(sidecar.read_text())["fp32_maps_per_sec"] == 900.0

    healthy = json.dumps({"metric": "m", "value": 910.0, "unit": "u",
                          "vs_baseline": 7.3, "on_tpu": True,
                          "regression": False})
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: _proc(0, healthy + "\n"))
    assert bench._run_attempts() == 0
    capsys.readouterr()
    assert json.loads(sidecar.read_text())["fp32_maps_per_sec"] == 910.0
