"""Run the full test suite as per-file pytest shards and record counts.

Why: two single-process full-suite runs crashed with SIGSEGV inside
XLA:CPU ``backend_compile_and_load`` while compiling the perturbation
programs of ``tests/test_method_surface.py`` — a file that passes in
isolation (21 passed / 269 s). The crash needs ~600 tests' worth of
in-process live executables to manifest; per-file processes cap that
state, so a sharded run both avoids the crash and still executes every
test. Output: one JSON artifact with per-file pass/fail/skip counts,
wall-clock, exit codes, and the totals — the recorded full-suite number
the round log cites.

Run:  python -m transformer_mm_explainability_tpu.tools.suite_shards \
          --out SUITE_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time


def parse_summary(out: str):
    """Extract (passed, failed, skipped, errors) from pytest's last
    summary line (e.g. '21 passed in 269.13s')."""
    counts = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    for line in reversed(out.splitlines()):
        if " in " in line and any(
                w in line for w in ("passed", "failed", "skipped", "error",
                                    "no tests ran")):
            for n, word in re.findall(r"(\d+) (\w+)", line):
                if word in ("passed", "failed", "skipped"):
                    counts[word] = int(n)
                elif word in ("error", "errors"):
                    counts["errors"] = int(n)
            return counts
    return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", default=None)
    ap.add_argument("--tests-dir", default="tests")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-file hard timeout (s)")
    ap.add_argument("--retries", type=int, default=1,
                    help="re-runs for a file that crashes (nonzero exit "
                         "with no pytest summary)")
    args = ap.parse_args(argv)

    files = sorted(f for f in os.listdir(args.tests_dir)
                   if f.startswith("test_") and f.endswith(".py"))
    shards = []
    totals = {"passed": 0, "failed": 0, "skipped": 0, "errors": 0}
    t_all = time.time()
    for i, fname in enumerate(files):
        path = os.path.join(args.tests_dir, fname)
        rec = {"file": fname}
        for attempt in range(args.retries + 1):
            t0 = time.time()
            try:
                proc = subprocess.run(
                    [sys.executable, "-m", "pytest", path, "-q",
                     "-p", "no:cacheprovider"],
                    capture_output=True, text=True, timeout=args.timeout)
                out = proc.stdout + proc.stderr
                rc = proc.returncode
            except subprocess.TimeoutExpired as e:
                out = ((e.stdout or b"").decode("utf8", "replace")
                       + (e.stderr or b"").decode("utf8", "replace"))
                rc = -9
            rec["wall_s"] = round(time.time() - t0, 1)
            rec["exit"] = rc
            counts = parse_summary(out)
            if counts is not None and rc in (0, 1):
                rec.update(counts)
                rec["crashed"] = False
                break
            # no summary (segfault/timeout mid-run): record and retry
            rec["crashed"] = True
            rec["tail"] = out[-500:]
            rec["attempt"] = attempt + 1
        shards.append(rec)
        for k in totals:
            totals[k] += rec.get(k, 0)
        status = ("CRASH" if rec.get("crashed") else
                  ("FAIL" if rec.get("failed") or rec.get("errors")
                   else "ok"))
        print(f"[{i + 1}/{len(files)}] {fname}: "
              f"{rec.get('passed', 0)} passed "
              f"({rec['wall_s']}s) {status}")
        sys.stdout.flush()
    result = {
        "artifact": "suite_shards",
        "files": len(files),
        "totals": totals,
        "wall_s_total": round(time.time() - t_all, 1),
        "all_green": all(not s.get("crashed") and not s.get("failed")
                         and not s.get("errors") for s in shards),
        "shards": shards,
    }
    print(json.dumps({k: result[k] for k in
                      ("files", "totals", "wall_s_total", "all_green")}))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    return 0 if result["all_green"] else 1


if __name__ == "__main__":
    sys.exit(main())
