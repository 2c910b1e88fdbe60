"""Regression tests for the local oracle mirror itself.

Round-2 lesson: ``ev_pivot_user_type_counts`` passed 78/78 locally but
failed the driver, because the mirror coerced int and float columns to
float64 before comparing while the driver's value hash is type-sensitive
(the oracle's ``SUM(CASE ...)`` is DuckDB HUGEINT).  These tests pin the
two detectors that now make that class of drift fail locally first.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from .oracle import check_oracle_types, compare_frames


def test_uncast_sum_case_oracle_is_rejected():
    """The exact round-2 failure: SUM(CASE ...) without a BIGINT cast."""
    con = duckdb.connect()
    try:
        rel = con.sql(
            "SELECT g, SUM(CASE WHEN v > 1 THEN 1 END) AS n "
            "FROM (VALUES (1, 1), (1, 2), (2, 3)) t(g, v) GROUP BY g"
        )
        assert str(rel.types[1]).upper() == "HUGEINT"  # the hazard exists
        with pytest.raises(AssertionError, match="HUGEINT"):
            check_oracle_types(rel, "uncast_sum_case")
    finally:
        con.close()


def test_cast_sum_case_oracle_is_accepted():
    con = duckdb.connect()
    try:
        rel = con.sql(
            "SELECT g, CAST(SUM(CASE WHEN v > 1 THEN 1 END) AS BIGINT) AS n "
            "FROM (VALUES (1, 1), (1, 2), (2, 3)) t(g, v) GROUP BY g"
        )
        check_oracle_types(rel, "cast_sum_case")
    finally:
        con.close()


def test_int_vs_float_drift_fails_even_when_values_equal():
    """Equal values, mismatched dtype kind: must fail (driver hash would)."""
    s = pd.DataFrame({"n": pd.array([1, 2, 3], dtype="int64")})
    o = pd.DataFrame({"n": pd.array([1.0, 2.0, 3.0], dtype="float64")})
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare_frames(s, o, "drift")
    # and symmetrically
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare_frames(o, s, "drift_rev")


def test_matching_float_columns_still_compare_exactly():
    s = pd.DataFrame({"x": [1.5, float("nan")]})
    o = pd.DataFrame({"x": [1.5, float("nan")]})
    compare_frames(s, o, "float_ok")
    o2 = pd.DataFrame({"x": [1.5, 2.0]})
    with pytest.raises(AssertionError, match="row count|mismatch"):
        compare_frames(s, o2, "float_bad")


def test_matching_int_columns_compare():
    s = pd.DataFrame({"n": pd.array([7, 8], dtype="int64")})
    o = pd.DataFrame({"n": pd.array([7, 8], dtype="int32")})
    compare_frames(s, o, "int_widths_ok")  # width differs, kind matches


def test_non_scalar_cells_are_rejected_like_the_driver():
    """Round-3 driver crash shape ('unhashable type: list'): an array-typed
    output column must fail the LOCAL mirror too, not get silently tupled.
    Same for map-typed (dict) cells."""
    s = pd.DataFrame({"g": ["a"], "q": [[1.0, 2.0]]})
    o = pd.DataFrame({"g": ["a"], "q": [[1.0, 2.0]]})
    with pytest.raises(AssertionError, match="non-scalar"):
        compare_frames(s, o, "array_cells")
    m = pd.DataFrame({"g": ["a"], "q": [{"k": 1}]})
    with pytest.raises(AssertionError, match="non-scalar"):
        compare_frames(m, m.copy(), "map_cells")


def test_binary_cells_still_normalize_and_compare():
    """Spark binary surfaces as bytearray (unhashable); the mirror converts
    to bytes and compares — the driver accepts these (mm_* queries)."""
    s = pd.DataFrame({"b": [bytearray(b"\x00\x01"), bytearray(b"\x02")]})
    o = pd.DataFrame({"b": [b"\x00\x01", b"\x02"]})
    compare_frames(s, o, "binary_ok")
