"""Unit tests for the bench trend gate (pure logic, no Spark)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from bench_trend import MIN_SECONDS, compare  # noqa: E402


def test_regression_flagged():
    cmp = compare({"q": 1.0}, {"q": 1.6})
    assert "q" in cmp["regressed"] and cmp["regressed"]["q"]["ratio"] == 1.6


def test_improvement_and_steady():
    cmp = compare({"a": 3.0, "b": 1.0}, {"a": 1.0, "b": 1.2})
    assert "a" in cmp["improved"]
    assert "b" in cmp["steady"]


def test_noise_floor_exempts_tiny_queries():
    # 3x ratio but both runs under the noise floor: not a gate failure
    cmp = compare({"q": 0.05}, {"q": 0.15})
    assert not cmp["regressed"]
    assert MIN_SECONDS > 0.15


def test_added_and_removed_tracked():
    cmp = compare({"old": 1.0}, {"new": 1.0})
    assert cmp["added"] == ["new"] and cmp["removed"] == ["old"]


def test_methodology_mismatch_disarms_gate(tmp_path):
    """A repeats change makes ratios apples-to-oranges: the tool must report
    but NOT gate (exit 0) until both runs share a methodology."""
    import json
    import subprocess
    import sys as _sys
    from pathlib import Path

    base = tmp_path / "base.json"
    cur = tmp_path / "cur.json"
    base.write_text(json.dumps({"queries": {"q": 1.0}}))  # old: no repeats key
    cur.write_text(json.dumps({"queries": {"q": 3.0}, "repeats": 2}))  # 3x "regression"
    tool = Path(__file__).resolve().parents[1] / "tools" / "bench_trend.py"
    r = subprocess.run(
        [_sys.executable, str(tool), str(base), str(cur)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "METHODOLOGY CHANGED" in r.stdout

    # same methodology: the 3x regression gates (exit 1)
    base.write_text(json.dumps({"queries": {"q": 1.0}, "repeats": 2}))
    r2 = subprocess.run(
        [_sys.executable, str(tool), str(base), str(cur)],
        capture_output=True, text=True,
    )
    assert r2.returncode == 1
