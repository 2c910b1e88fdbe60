"""Unit tests for bench.py's contention gate (VERDICT r13 task 3): a
sweep window recorded under contention must be marked instead of recorded
as a clean measurement (the r13 sweep ran concurrently with another
workload and cost a 17-flag manual adjudication pass).

Design note (measured r14): a local[n] sweep's OWN executor threads push
the 1-minute load to 10-19 on a verifiably idle 32-cpu box, so raw
in-sweep load cannot be the per-family signal -- the per-family gate is
TIMING-based (mid-sweep single-shot control samples vs the family's own
min(start_s, end_s)); raw load is only used pre-sweep, before the Spark
session exists."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import (  # noqa: E402
    CONTROL_STALL_RATIO,
    LOAD_GATE_FACTOR,
    control_stalled_families,
)


def _ctl(query, start=0.2, end=0.2, sample_secs=()):
    return {
        "query": query,
        "start_s": start,
        "end_s": end,
        "samples": [
            {"after_n": 10 * (i + 1), "sec": s, "load": 12.0}
            for i, s in enumerate(sample_secs)
        ],
    }


def test_stalled_mid_sweep_sample_marks_family():
    # events control: endpoints 0.2s, one mid-sweep sample at 0.9s (4.5x)
    # -- the r12 failure mode (a stall starting and ending inside the
    # sweep, invisible to the endpoint pair)
    controls = {
        "events": _ctl("ev_json_props_typed", sample_secs=(0.21, 0.9, 0.22)),
        "lineitem": _ctl("q6", sample_secs=(0.19, 0.2, 0.21)),
    }
    assert control_stalled_families(controls) == ["events"]


def test_threshold_is_ratio_on_family_own_baseline():
    assert CONTROL_STALL_RATIO == 2.0
    # exactly 2x the min endpoint: not flagged; just above: flagged
    ok = {"lineitem": _ctl("q6", start=0.3, end=0.2, sample_secs=(0.4,))}
    assert control_stalled_families(ok) == []
    bad = {"lineitem": _ctl("q6", start=0.3, end=0.2, sample_secs=(0.41,))}
    assert control_stalled_families(bad) == ["lineitem"]


def test_high_load_samples_alone_do_not_flag():
    # in-sweep load 12-19 with steady control timings = the sweep's own
    # executor threads, NOT contention -- must not flag (measured r14)
    controls = {
        fam: _ctl("q", sample_secs=(0.2, 0.21, 0.2))
        for fam in ("lineitem", "events", "documents", "embeddings")
    }
    assert control_stalled_families(controls) == []


def test_rerun_samples_excluded_from_the_stall_scan():
    # the rerun pass appends a sample tagged after_n="rerun"; it must not
    # re-flag the family on a later evaluation
    ctl = _ctl("q6", sample_secs=(0.2,))
    ctl["samples"].append({"after_n": "rerun", "sec": 0.9, "load": 1.0})
    assert control_stalled_families({"lineitem": ctl}) == []


def test_missing_endpoints_tolerated():
    controls = {"lineitem": {"query": "q6", "start_s": None, "end_s": None,
                             "samples": [{"after_n": 10, "sec": 9.9}]}}
    assert control_stalled_families(controls) == []


def test_pre_sweep_threshold_is_quarter_of_cpus():
    assert LOAD_GATE_FACTOR == 0.25
