"""Unit tests for bench.py's load gate (VERDICT r13 task 3): a family
whose control-window load samples show host contention must be marked
instead of recorded as a clean measurement (the r13 sweep ran at load
9-13 on 32 cpus and cost a 17-flag manual adjudication pass)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import LOAD_GATE_FACTOR, load_flagged_families  # noqa: E402


def _ctl(query, loads_mid=(), load_start=None, load_end=None):
    return {
        "query": query,
        "start_s": 0.2,
        "end_s": 0.2,
        "load_start": load_start,
        "load_end": load_end,
        "samples": [
            {"after_n": 10 * (i + 1), "sec": 0.2, "load": ld}
            for i, ld in enumerate(loads_mid)
        ],
    }


def test_high_mid_sweep_load_marks_family_invalid():
    # the r13 condition: 32 cpus, mid-sweep loads 12.2/13.1/9.3 -- all
    # above 32 * 0.25 = 8, so the family must be flagged
    controls = {
        "events": _ctl("ev_json_props_typed", loads_mid=(12.2, 13.1, 9.3),
                       load_start=1.0, load_end=1.0),
        "lineitem": _ctl("q6", loads_mid=(1.0, 1.2, 0.9),
                         load_start=1.0, load_end=1.0),
    }
    assert load_flagged_families(controls, cpus=32) == ["events"]


def test_high_endpoint_load_also_flags():
    controls = {
        "documents": _ctl("doc_rolling_hash", loads_mid=(1.0,),
                          load_start=20.0, load_end=1.0),
    }
    assert load_flagged_families(controls, cpus=32) == ["documents"]


def test_idle_sweep_flags_nothing():
    controls = {
        fam: _ctl("q", loads_mid=(1.0, 2.0), load_start=0.5, load_end=3.0)
        for fam in ("lineitem", "events", "documents", "embeddings")
    }
    assert load_flagged_families(controls, cpus=32) == []


def test_missing_loads_tolerated():
    # runs recorded by pre-r14 bench versions carry no load_start/load_end
    controls = {"lineitem": {"query": "q6", "samples": [{"sec": 0.2}]}}
    assert load_flagged_families(controls, cpus=32) == []


def test_threshold_is_quarter_of_cpus():
    assert LOAD_GATE_FACTOR == 0.25
    controls = {"lineitem": _ctl("q6", loads_mid=(8.01,))}
    assert load_flagged_families(controls, cpus=32) == ["lineitem"]
    controls = {"lineitem": _ctl("q6", loads_mid=(8.0,))}
    assert load_flagged_families(controls, cpus=32) == []
