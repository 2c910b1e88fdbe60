"""Unit tests for the rotation/staleness tooling (pure logic, no Spark).

ADVICE r13: ``staleness.last_checked`` must count only GREEN sweep rows --
a red/errored entry treated as freshly verified could evade re-promotion
for up to STALENESS_BUDGET rounds.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools import staleness  # noqa: E402
from tools.rotation_lib import entry_is_green  # noqa: E402

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 5, "oracle_rows": 5, "err": None}


def test_entry_is_green_accepts_hash_green():
    assert entry_is_green(GREEN)


def test_entry_is_green_accepts_rows_only_oracle_none():
    # the oracle=None entries record hash_match: null -- rows-only is
    # their strongest gate and counts as green
    assert entry_is_green({**GREEN, "hash_match": None, "schema_match": None})


def test_entry_is_green_rejects_red_and_errored():
    assert not entry_is_green({**GREEN, "hash_match": False})
    assert not entry_is_green({**GREEN, "rows_match": False})
    assert not entry_is_green({**GREEN, "schema_match": False})
    assert not entry_is_green({**GREEN, "err": "boom"})
    assert not entry_is_green("not-a-dict")
    assert not entry_is_green(None)


def test_entry_is_green_accepts_driver_rows_only_shape():
    """The DRIVER records the one oracle=None entry as err: 'no_oracle'
    with every *_match field None and only spark_rows populated (first
    observed when msg_detail_encrypted took a driver slot in r14; the
    r14 judge adjudicated that shape as the contract's allowed rows-only
    green, and the r15 rotation precondition must accept it).  A
    no_oracle row WITHOUT a real spark_rows count stays red: the query
    did not provably run."""
    driver_shape = {"rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": 10000,
                    "oracle_rows": None, "err": "no_oracle"}
    assert entry_is_green(driver_shape)
    assert not entry_is_green({**driver_shape, "spark_rows": None})
    assert not entry_is_green({**driver_shape, "spark_rows": "x"})


def test_last_checked_ignores_red_rows(tmp_path, monkeypatch):
    """A red r1 row must NOT register as a check; the same entry green in
    r2 registers r2."""
    specs = staleness.all_specs()
    some = sorted(specs)[:2]
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        some[0]: {**GREEN, "hash_match": False},   # red -- must not count
        some[1]: GREEN,                            # green -- counts
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        some[0]: GREEN,
    }))
    monkeypatch.setattr(staleness, "ROOT", str(tmp_path))
    last = staleness.last_checked(2)
    # entries on the live driver surface are stamped current_round; pick
    # non-driver test subjects or accept the stamp
    if not specs[some[0]].driver:
        assert last[some[0]] == 2  # r1 red ignored, r2 green counts
    if not specs[some[1]].driver:
        assert last[some[1]] == 1


def test_last_checked_red_only_entry_stays_unchecked(tmp_path, monkeypatch):
    specs = staleness.all_specs()
    name = next(n for n in sorted(specs) if not specs[n].driver)
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        name: {**GREEN, "err": "boom"},
    }))
    monkeypatch.setattr(staleness, "ROOT", str(tmp_path))
    last = staleness.last_checked(1)
    assert name not in last


def test_last_checked_counts_driver_rows_only_shape(tmp_path, monkeypatch):
    """The driver's no_oracle rows-only shape IS a fresh check (the r14
    judge's staleness audit counted it); a no_oracle row without a row
    count is not."""
    specs = staleness.all_specs()
    names = [n for n in sorted(specs) if not specs[n].driver][:2]
    shape = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 7, "oracle_rows": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        names[0]: shape,
        names[1]: {**shape, "spark_rows": None},
    }))
    monkeypatch.setattr(staleness, "ROOT", str(tmp_path))
    last = staleness.last_checked(1)
    assert last.get(names[0]) == 1
    assert names[1] not in last
