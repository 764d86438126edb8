"""bench.py budget machinery: the headline must always land.

Round 4's driver run died at the wall-clock limit with no JSON emitted.
These tests pin the protocol-level guarantees without needing a TPU:
  - a tiny run emits at least one parseable JSON line with the headline
  - an exhausted budget skips optional rows but still emits
  - SIGTERM mid-run exits 0 after emitting whatever exists
"""

import json
import os
import signal
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_json(stdout: str):
    lines = [l for l in stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON line in output:\n{stdout[-2000:]}"
    return json.loads(lines[-1])


def test_tiny_bench_emits_headline_with_zero_budget():
    """Budget already exhausted at start: every optional row skips, the
    mandatory headline still lands, rc == 0."""
    proc = subprocess.run(
        [sys.executable, "bench.py", "--tiny", "--frames", "4", "--chain", "2",
         "--warmup-iters", "1", "--budget", "0"],
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _last_json(proc.stdout)
    assert out["metric"].startswith("fps_p50_")
    assert out["value"] > 0
    assert "skipped_rows" in out and "burst" in out["skipped_rows"]


def test_budget_phase_gate():
    import bench

    old = bench._BUDGET_S
    bench._RESULT.clear()
    try:
        bench._BUDGET_S = 0
        assert not bench.phase_ok("x", 10)
        assert bench._RESULT["skipped_rows"] == ["x"]
        bench._BUDGET_S = 10**9
        assert bench.phase_ok("y", 10)
    finally:
        bench._BUDGET_S = old
        bench._RESULT.clear()


def test_sigterm_emits_current_result():
    import bench

    bench._RESULT.clear()
    bench._RESULT.update({"metric": "fps_p50_test", "value": 1.0})
    with pytest.raises(SystemExit) as e:
        bench._on_term(signal.SIGTERM, None)
    assert e.value.code == 0
    bench._RESULT.clear()
    with pytest.raises(SystemExit) as e:
        bench._on_term(signal.SIGTERM, None)
    assert e.value.code == 124  # nothing to report yet
