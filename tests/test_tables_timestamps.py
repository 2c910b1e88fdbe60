"""The fixture loader must yield TIMESTAMP_LTZ whatever parquet stores.

The driver regenerates /root/testdata between rounds, and the physical
timestamp encoding has changed under us twice already:

* rounds 1-5: ``ts`` was TIMESTAMP(NANOS) (Spark rejects the scan without
  ``spark.sql.legacy.parquet.nanosAsLong``) and the TPC-H dates were
  timestamp[ms] with isAdjustedToUTC=true;
* round 6: everything became timestamp[us] with isAdjustedToUTC=false,
  which Spark 4's default ``inferTimestampNTZ`` reads as TIMESTAMP_NTZ —
  silently changing the engine's type surface and breaking LTZ-only
  functions (``unix_micros``, ORC writes).

``sources.tables.load`` pins both confs per-load (the driver hands us an
externally-built session the engine never configured) so every downstream
plan sees the same LTZ-under-UTC semantics DuckDB's naive read matches.
These tests freeze that contract against BOTH historical encodings.
"""

from __future__ import annotations

import datetime
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.sources import tables

from .conftest import SF_DIR

UTC = datetime.timezone.utc
TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 7, 179575),
    datetime.datetime(2024, 6, 30, 23, 59, 59, 999999),
]


def _write_events(path, arrow_type, values):
    t = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array(values, arrow_type),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["a", "b"], pa.string()),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"], pa.string()),
        }
    )
    pq.write_table(t, path)


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("us"),  # round-6 fixture: NTZ inference hazard
        pa.timestamp("us", tz="UTC"),  # rounds 1-5 TPC-H date encoding
        pa.timestamp("ns"),  # rounds 1-5 events encoding (nanosAsLong path)
    ],
    ids=["us-naive", "us-utc", "ns-naive"],
)
def test_events_ts_always_ltz(spark, tmp_path, arrow_type):
    _write_events(str(tmp_path / "events.parquet"), arrow_type, TS)
    df = tables.load(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"{arrow_type} read as {df.schema['ts'].dataType}"
    )
    got = sorted(r.ts for r in df.select("ts").collect())
    want = sorted(t.replace(tzinfo=None) for t in TS)
    # session tz is UTC, so LTZ values collected in local naive form equal
    # the stored wall times exactly (us precision preserved)
    assert [g.replace(tzinfo=None) for g in got] == want


def test_loader_pins_confs_on_foreign_session(spark):
    """Simulate the driver's unpinned session: flip the confs to foreign
    values and check one load() restores the engine posture -- including
    the UTC session zone the LTZ==naive equivalence (and every timestamp
    literal in plans/) depends on."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        tables.load(spark, SF_DIR, "events")
        assert spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_real_fixture_timestamp_columns_are_ltz(spark):
    """Whatever encoding the current driver generation uses, the loaded
    timestamp columns must be LTZ (the r5-proven query surface assumes it)."""
    for name, col in (("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")):
        df = tables.load(spark, SF_DIR, name)
        assert isinstance(df.schema[col].dataType, T.TimestampType), (
            f"{name}.{col} is {df.schema[col].dataType}"
        )


def test_loader_survives_unset_timezone_conf(spark):
    """Regression (r11 verdict What's-wrong #1): on a session where
    spark.sql.session.timeZone was NEVER explicitly set, Spark validates the
    sentinel default passed to conf.get, so the old
    ``spark.conf.get(key, "")`` crashed with INVALID_CONF_VALUE.TIME_ZONE
    before _pin could compare.  conf.unset() reproduces the unset state
    in-process; load() must warn-and-override, not crash."""
    import warnings as _warnings

    spark.conf.unset("spark.sql.session.timeZone")
    try:
        # the resolved default (Etc/UTC) is wall-time-identical to the pin,
        # so the normalization must be SILENT -- no crash, no cry-wolf warn
        with _warnings.catch_warnings():
            _warnings.simplefilter("error", UserWarning)
            df = tables.load(spark, SF_DIR, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_entry_on_vanilla_foreign_session():
    """End-to-end form of the same regression: a genuinely unpinned
    ``SparkSession.builder.getOrCreate()`` session (fresh JVM, no engine
    confs) must run ``entry(spark)`` successfully -- the exact smoke the
    driver contract performs.  Subprocess because the suite's own session
    already carries the pinned confs."""
    import subprocess
    import sys

    code = r"""
import os, sys, warnings
sys.path.insert(0, os.environ["REPO"])
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "2g")
         .getOrCreate())
import __spark_entry__ as e
with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    df = e.entry(spark)
    n = df.count()
print("ENTRY_ROWS=%d" % n)
spark.stop()
"""
    env = dict(os.environ, REPO=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=600
    )
    assert out.returncode == 0, f"stderr tail: {out.stderr[-2000:]}"
    rows = [l for l in out.stdout.splitlines() if l.startswith("ENTRY_ROWS=")]
    assert rows, out.stdout[-2000:]
    assert int(rows[0].split("=")[1]) > 0
