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
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
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
        if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(ov.dtype, np.floating):
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
        odf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    compare_frames(sdf, odf, name)
