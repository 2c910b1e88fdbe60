"""Event-time and JSON queries over the ``events`` fixture.

The reference's only streaming-runtime feature is checkpointing
(/root/reference/src/main/java/com/cansever/consumer/BackupMessageConsumer.java:34);
it has no windows, no watermarks, no JSON functions (SURVEY.md section 2
absent-category rows "streaming windows" and "JSON scalars").  These queries
provide the batch-checkable halves -- tumbling/sliding/session windows on
``ts`` and ``from_json`` with an explicit schema on ``props`` -- while
``streaming/pipeline.py`` runs the same window specs under Structured
Streaming with watermarks.

Window alignment note: Spark's ``F.window`` aligns buckets to the epoch; the
oracles replicate that with integer microsecond arithmetic (``epoch_us DIV
width``), never float seconds, so bucket edges are bit-exact.

Scale: every query shuffles once on its (bucket, key) pair with map-side
partial aggregation; session windows shuffle on user_id then sort within
partitions -- the same shape Structured Streaming's session-window state
operator uses, so the batch plan is an honest cost model for the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import numeric as N
from ..sources import tables
from .registry import register

#: Explicit schema for events.props (SURVEY.md:188 requires from_json with a
#: declared schema, not schema inference or single-key pulls).
PROPS_SCHEMA = T.StructType([T.StructField("k", T.LongType())])


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load(spark, sf_dir, "events")


@register(
    "ev_json_props_typed",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       event_type,
       value
FROM events
""",
    doc="from_json with an explicit StructType on events.props (JSON scalar "
        "surface); typed struct field access, not string re-parsing per key",
)
def ev_json_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), PROPS_SCHEMA)["k"].alias("prop_k"),
        "event_type",
        "value",
    )


@register(
    "ev_tumbling_hourly",
    oracle=f"""
SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS window_start,
       make_timestamp((epoch_us(ts) // 3600000000) * 3600000000 + 3600000000) AS window_end,
       event_type,
       COUNT(*) AS n_events,
       {N.dsum_expr('value')} AS sum_value
FROM events
GROUP BY 1, 2, 3
""",
    doc="tumbling 1-hour window aggregate (epoch-aligned, matching "
        "F.window's origin); decimal-exact value sums",
)
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = F.window("ts", "1 hour")
    return (
        ev.groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), N.dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "ev_sliding_hourly_30m",
    oracle=f"""
WITH assigned AS (
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS window_start, *
  FROM events
  UNION ALL
  SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000), *
  FROM events
)
SELECT window_start,
       window_start + INTERVAL 1 HOUR AS window_end,
       COUNT(*) AS n_events,
       {N.dsum_expr('value')} AS sum_value
FROM assigned
GROUP BY 1, 2
""",
    doc="sliding window (1h width, 30m slide): each event lands in exactly 2 "
        "overlapping buckets; the oracle materializes both bucket starts "
        "explicitly. Scale: Spark's window expand is a per-row flatMap (x2 "
        "rows), then one shuffle on the bucket",
    driver=False,  # ev_tumbling_hourly driver-checks F.window's epoch
    sibling="ev_tumbling_hourly",
    # alignment and ev_session_windows the gap semantics; the slide variant
    # (same operator, overlap factor 2) stays oracle-checked locally.
)
def ev_sliding_hourly_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        ev.groupBy(w)
        .agg(F.count(F.lit(1)).alias("n_events"), N.dsum("value", "sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "ev_session_windows",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 6 HOUR
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 6 HOUR AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
""",
    doc="session windows with a 6-hour inactivity gap via F.session_window; "
        "the oracle is the classic gaps-and-islands rewrite (lag -> running "
        "sum of session starts).  Spark session semantics: start = first "
        "event, end = last event + gap",
)
def ev_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy(F.session_window("ts", "6 hours"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


#: Pinned pivot values: deterministic column order, no discovery scan.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "ev_pivot_user_type_counts",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 END) AS BIGINT) AS view
FROM events
GROUP BY user_id
""",
    doc="pivot (wide aggregation) with pinned value list -- no extra pass to "
        "discover pivot values, single shuffle on user_id; missing combos are "
        "NULL on both engines (SUM over empty CASE).  Oracle SUMs are cast to "
        "BIGINT: DuckDB SUM yields HUGEINT, and the driver's value hash is "
        "type-sensitive even when values are identical",
    driver=False,  # ev_unpivot_roundtrip COMPOSES this pivot and its oracle
    sibling="ev_unpivot_roundtrip",
    # is the plain GROUP BY, so a wrong pivot cell cannot pass the driver's
    # roundtrip gate; the wide form itself stays oracle-checked locally.
)
def ev_pivot_user_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _ev(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )


@register(
    "ev_unpivot_roundtrip",
    oracle="""
SELECT user_id, event_type, COUNT(*) AS n
FROM events
GROUP BY user_id, event_type
""",
    doc="UNPIVOT (wide -> long): melting the pivoted per-user count matrix "
        "back to (user_id, event_type, n) rows must reproduce the plain "
        "GROUP BY exactly -- the oracle IS that group-by, so the gate checks "
        "the pivot/unpivot round-trip, not just the melt mechanics.  NULL "
        "cells (user never produced the type) are dropped on both sides",
)
def ev_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = ev_pivot_user_type_counts(spark, sf_dir)
    return wide.unpivot(
        ids=["user_id"],
        values=list(EVENT_TYPES),
        variableColumnName="event_type",
        valueColumnName="n",
    ).filter(F.col("n").isNotNull())
