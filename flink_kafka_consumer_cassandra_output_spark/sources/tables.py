"""Parquet fixture catalog.

The driver-generated tables (TESTDATA.md / FIXTURES.md part A) are the batch
stand-ins for the reference's single Kafka stream
(/root/reference/src/main/java/com/cansever/consumer/BackupMessageConsumer.java:36-39).
``spark.read.parquet`` gives the vectorized reader with predicate pushdown and
column pruning -- the scan posture every query in ``plans/`` relies on.
"""

from __future__ import annotations

import warnings
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet reader
#: rejects natively; read it as a long and truncate to microseconds (exactly
#: what DuckDB does when it casts the same column to its us timestamp).
_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"

#: The fixture parquet stores timestamps with isAdjustedToUTC=false; Spark 4
#: infers TIMESTAMP_NTZ for those unless told otherwise.  The engine pins the
#: legacy LTZ read: under the UTC session zone it is wall-time-identical to
#: DuckDB's naive read, and LTZ keeps the full timestamp function surface
#: (unix_micros, ORC writes) available.  Set per-load because the driver may
#: hand us an externally-built session without this conf.
_NTZ_CONF = "spark.sql.parquet.inferTimestampNTZ.enabled"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables whose queries do heavy per-row compute (AES, md5 minhash, vector
#: folds, Arrow batches).  At the test scales each is ONE parquet file ->
#: one scan partition -> the whole operator runs on one core; spreading them
#: across the default parallelism is a cheap shuffle of a small table that
#: unlocks every downstream narrow stage.  On a real cluster the same tables
#: arrive as many files/row-groups, the partition count already exceeds
#: defaultParallelism, and the spread is skipped -- so this is a no-op at
#: 100 TB, not a hidden scalability crutch.  Dimension tables are excluded:
#: they feed broadcasts, and a shuffle before a broadcast is pure waste.
_SPREAD_TABLES = frozenset({"events", "documents", "embeddings"})


#: (applicationId, sf_dir, table, cores) -> does this scan need the spread?
#: The answer is a pure function of the file layout and the session's scan
#: confs, so probe it ONCE per session: the probe itself
#: (``df.rdd.getNumPartitions()``) runs full query planning plus an
#: RDD conversion — a measured ~20-40 ms py4j/planning round-trip paid at
#: every builder invocation of a spread table (3 tables x 3 bench repeats
#: x ~150 queries) before memoization.
_SPREAD_PROBED: dict[tuple, bool] = {}


def _spread(spark: SparkSession, df: DataFrame, sf_dir: str, name: str) -> DataFrame:
    cores = spark.sparkContext.defaultParallelism
    key = (spark.sparkContext.applicationId, sf_dir, name, cores)
    need = _SPREAD_PROBED.get(key)
    if need is None:
        need = df.rdd.getNumPartitions() < cores
        # Evict other applications' entries (same hygiene as the session
        # memo): a long-lived process cycling many sessions must not grow
        # this without bound.
        stale = [k for k in _SPREAD_PROBED if k[0] != key[0]]
        for k in stale:
            del _SPREAD_PROBED[k]
        _SPREAD_PROBED[key] = need
    if need:
        return df.repartition(cores)
    return df


def _pin_timestamp_reads(spark: SparkSession) -> None:
    """Pin the scan-time timestamp semantics on any session we're handed.

    Both confs are runtime SQL confs, so setting them here (before the first
    parquet read) works even on an externally-built session.  They stay set —
    restoring mid-plan is not possible and the pinned semantics are what every
    query in ``plans/`` assumes.  Because the override is a session-global
    side effect that would silently shift timestamp semantics for any OTHER
    workload sharing the session, each conf flip on a foreign session emits a
    ``UserWarning`` naming the conf and both values (sessions built by
    ``session.build_session`` already carry the pinned values, so they never
    warn).
    """
    def _pin(key: str, want: str, default: str, equivalent: frozenset[str] = frozenset()) -> None:
        # Read WITHOUT the sentinel default: Spark validates the default
        # argument for some confs (spark.sql.session.timeZone rejects "" with
        # INVALID_CONF_VALUE.TIME_ZONE) even when the conf is unset, so
        # `spark.conf.get(key, "")` crashes on a vanilla unpinned session.
        # A no-default get returns the resolved session default (e.g.
        # "Etc/UTC") and the mismatch path warns+overrides as documented; if
        # even that read fails, treat it as a mismatch and pin.
        try:
            have = spark.conf.get(key)
        except Exception:
            have = default
        if have in equivalent:
            # semantically identical value (e.g. a vanilla session resolving
            # the zone to Etc/UTC): normalize silently -- warning here would
            # cry wolf on every driver-built session
            if have != want:
                spark.conf.set(key, want)
            return
        if have != want:
            warnings.warn(
                f"load() is overriding {key}={have!r} -> {want!r} on this "
                "SparkSession for the rest of its lifetime; every query in "
                "flink_kafka_consumer_cassandra_output_spark.plans assumes the pinned value. Build the "
                "session via flink_kafka_consumer_cassandra_output_spark.session.build_session to avoid "
                "the override.",
                UserWarning,
                stacklevel=3,
            )
            spark.conf.set(key, want)

    _pin(_NANOS_CONF, "true", "false")
    _pin(_NTZ_CONF, "false", "true")
    # The LTZ-read-equals-DuckDB-naive-read equivalence (and every
    # timestamp literal / year() / date_trunc in plans/) holds only under
    # the UTC session zone build_session pins; a foreign session in any
    # other zone would shift every date filter's boundary.
    _pin(
        "spark.sql.session.timeZone", "UTC", "",
        # wall-time-identical zone spellings: normalized without the warning
        equivalent=frozenset({"UTC", "Etc/UTC", "Z", "GMT", "Etc/GMT", "+00:00"}),
    )


def _ntz_to_ltz(df: DataFrame) -> DataFrame:
    """Safety net: cast any residual TIMESTAMP_NTZ column to LTZ.

    Only fires if the NTZ conf could not take effect (e.g. a cached reader
    schema from before ``_pin_timestamp_reads`` ran); the conf path is primary
    because a post-scan cast would defeat parquet filter pushdown on the
    column.
    """
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


#: Per-SESSION memo of loaded DataFrame HANDLES (lazy plans, no data),
#: keyed weakly by the SparkSession object so sibling sessions of one
#: application never share handles (a DataFrame is bound to its session
#: -- e.g. createOrReplaceTempView registers in the DF's own session)
#: and dead sessions evict themselves.  ``spark.read.parquet`` resolves
#: the file index and schema on the DRIVER at plan-construction time --
#: a measured ~40-100 ms py4j/footers round-trip paid at EVERY builder
#: invocation of every table before memoization (r17, guide section 1.2:
#: pure per-query plan-construction overhead, ~10 table references per
#: bench repeat).  Reusing the handle is safe because DataFrames are
#: immutable lazy plans; the one behavior change is that a caller
#: REWRITING the parquet files under an already-loaded (sf_dir, name) in
#: the SAME session would read the stale file listing -- no production
#: or test path does that (fixture dirs are immutable; test writers use
#: fresh tmp dirs), and the driver/bench contract reads a fixed SF dir.
_LOAD_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    # The conf pin runs on EVERY call, memo hit or miss: load()'s contract
    # is that one call restores the engine's timestamp posture on any
    # session it is handed (tests/test_tables_timestamps.py), and the
    # memoized plan was captured under the pinned confs.  Three conf reads
    # cost a few ms; the footer/file-index round-trip was the expense.
    _pin_timestamp_reads(spark)
    per_session = _LOAD_MEMO.setdefault(spark, {})
    key = (sf_dir, name)
    got = per_session.get(key)
    if got is not None:
        return got
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        # integer ns -> us floor division (no double round-trip: ns epochs
        # exceed double's 2^53 integer range; pmod keeps floor semantics
        # for pre-1970 instants, matching DuckDB's ns->us cast)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("(ts - pmod(ts, 1000)) DIV 1000")))
    df = _ntz_to_ltz(df)
    if name in _SPREAD_TABLES:
        df = _spread(spark, df, sf_dir, name)
    per_session[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


#: Per-session "views currently registered for this sf_dir" marker --
#: ``register_views`` re-ran 10 loads + 10 catalog calls per spark.sql
#: query repeat before memoization (r17; ~1.2-1.6 s of measured build
#: time per repeat on the SQL-surface queries).  Weakly keyed like
#: _LOAD_MEMO; the value is the LAST registered sf_dir, because temp
#: views are session-global and the last dir wins.
_VIEWS_REGISTERED: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql`` use.

    Idempotent per (session, sf_dir): repeat calls with the SAME dir are
    no-ops; a call with a DIFFERENT dir re-registers every view (temp
    views are session-global, so the last dir wins -- exactly the prior
    behavior, minus the redundant re-registration)."""
    if _VIEWS_REGISTERED.get(spark) == sf_dir:
        return
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    _VIEWS_REGISTERED[spark] = sf_dir
