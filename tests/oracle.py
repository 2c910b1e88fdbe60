"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs a registered query's Spark builder and its DuckDB oracle SQL on the
same parquet tables and compares row count, column names/dtypes, and exact
values (order-insensitive).  Exact float equality is intentional: the
engine's numeric-parity conventions (functions/numeric.py, vectors.py) are
designed to make both engines produce bitwise-identical doubles, and this
harness is what enforces that before the driver ever sees a query.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from flink_kafka_consumer_cassandra_output_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by all columns,
    tz-aware datetimes normalized to naive UTC, index dropped."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.DatetimeTZDtype):
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if df[c].dtype == object:
            def _norm(v, c=c):
                if isinstance(v, (bytearray, memoryview)):
                    return bytes(v)  # Spark binary -> bytearray (unhashable)
                if isinstance(v, (list, np.ndarray, dict)):
                    # The driver's canonicalizer dies on exactly these
                    # ('unhashable type: list' — round 3's
                    # approx_quantiles_price array column).  The local
                    # mirror must fail where the driver fails, not paper
                    # over it by tupling.
                    raise AssertionError(
                        f"non-scalar cell in column {c!r} "
                        f"({type(v).__name__}): the driver's value hash "
                        "rejects array/map cells — project to scalar "
                        "columns before registering"
                    )
                return v
            df[c] = df[c].map(_norm)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    s, o = _canon(spark_pdf), _canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        s_float = np.issubdtype(sv.dtype, np.floating)
        o_float = np.issubdtype(ov.dtype, np.floating)
        s_int = np.issubdtype(sv.dtype, np.integer)
        o_int = np.issubdtype(ov.dtype, np.integer)
        if (s_int and o_float) or (s_float and o_int):
            # The driver's value hash is type-sensitive; an int-vs-float
            # drift that round-trips to equal float64 values here would
            # still fail the driver (round-2 lesson: ev_pivot oracle's
            # DuckDB HUGEINT).  Report whether the values would have
            # matched, but fail on the dtype mismatch itself.
            fv = ov.astype("float64") if o_float else sv.astype("float64")
            integral = bool(np.all(np.isnan(fv) | (fv == np.floor(fv))))
            raise AssertionError(
                f"{name}: column {c!r} dtype mismatch: spark={sv.dtype} "
                f"oracle={ov.dtype} (float side {'is' if integral else 'is NOT'} "
                "integral). The driver's hash is type-sensitive -- CAST the "
                "oracle column (usually AS BIGINT) or fix the Spark type."
            )
        if s_float or o_float:
            sv64 = sv.astype("float64")
            ov64 = ov.astype("float64")
            both_nan = pd.isna(sv64) & pd.isna(ov64)
            eq = (sv64 == ov64) | both_nan
        else:
            sn, on_ = pd.isna(s[c]), pd.isna(o[c])
            eq = (s[c].astype(object).to_numpy() == o[c].astype(object).to_numpy()) | (
                sn.to_numpy() & on_.to_numpy()
            )
        if not eq.all():
            bad = int(np.argmin(eq))
            raise AssertionError(
                f"{name}: column {c!r} mismatch at canonical row {bad}: "
                f"spark={s[c].iloc[bad]!r} oracle={o[c].iloc[bad]!r} "
                f"({int((~eq).sum())} rows differ)"
            )


def run_and_compare(spark, name: str, sf_dir: str) -> None:
    from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

    spec = all_specs()[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(sdf) > 0, f"{name}: no-oracle query returned zero rows"
        return
    con = duck_connection(sf_dir)
    try:
        rel = con.sql(spec.oracle)
        check_oracle_types(rel, name)
        odf = rel.fetchdf()
    finally:
        con.close()
    compare_frames(sdf, odf, name)


#: DuckDB result types with no Spark equivalent.  Pandas can mask these
#: (HUGEINT with NULLs and Spark's nullable bigint BOTH surface as float64,
#: which is exactly how ev_pivot passed 78/78 locally in round 2 and then
#: failed the driver's type-sensitive hash), so the check runs on the DuckDB
#: relation types BEFORE the pandas conversion.
_FORBIDDEN_ORACLE_TYPES = {"HUGEINT", "UHUGEINT"}


def check_oracle_types(rel, name: str) -> None:
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if str(t).upper() in _FORBIDDEN_ORACLE_TYPES
    ]
    assert not bad, (
        f"{name}: oracle produces DuckDB-only types with no Spark match "
        f"{bad}; wrap in CAST(... AS BIGINT) (DuckDB SUM over integers "
        "yields HUGEINT, and the driver's value hash is type-sensitive)"
    )
