"""Scaling probe for the event-analytics suite: ~linear in user count?

Usage: python tools/scale_probe_events.py <k>   (one fresh JVM per k;
       run k = 1 2 4 8 as separate invocations -- SCALING.md explains
       why a single-session sweep self-contaminates)

The sf0.1 events table (100k rows, 1.5k users) is replicated k times
with user_id AND event_id re-keyed into per-replica id spaces: each
replica is a disjoint user population with the fixture's exact per-user
event streams, so sessions, funnels, transition counts, and cohort sizes
all grow exactly k.  The probed code is the REGISTERED BUILDERS run
unchanged on the probe dir.  Every probed operator partitions by user_id
(window sort or session state) or buckets by event-time, so wall-clock
must grow ~k on fixed cores; superlinear growth would mean a window or
sessionization whose state leaks across users.

Probed queries:
  - ev_session_windows:        session_window state merge per user
  - ev_top_sessions_by_events: gaps-and-islands windows + global top-k
  - ev_event_transitions:      per-user LAG -> 25-group aggregate
  - ev_funnel_conversion:      one-scan chained running-min windows
  - ev_user_retention_cohorts: two aggregates + broadcast-back join
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "3"))
ID_SPACE = 100_000_000
QUERIES = (
    "ev_session_windows",
    "ev_top_sessions_by_events",
    "ev_event_transitions",
    "ev_funnel_conversion",
    "ev_user_retention_cohorts",
    # round 7 additions: bucketed range join, CMS heavy hitters (fixed-size
    # sketch, k x candidates), integer cross-correlation pattern match
    "ev_range_interval_join",
    "ev_heavy_hitters_cms",
    "ev_ts_pattern_match",
    # round 10 additions.  ev_cusum_changepoint partitions by event_type
    # (5 groups): replication grows the sequential per-group prefix scan
    # by k with parallelism capped at 5 -- the honest hot-group shape;
    # the others key on user_id or hour buckets and must stay ~linear.
    "ev_quota_flagging",
    "ev_burst_collapse",
    "ev_cusum_changepoint",
    "ev_sliding_distinct_users",
    "ev_debounce_exact",
    # late round-10: 168-slot seasonality (bounded key), cohort LTV
    # (user-keyed cohort map + bounded grid), CUSUM alarm (same
    # event_type-keyed hot-group shape as the changepoint)
    "ev_seasonality_profile",
    "ev_cohort_revenue_curve",
    "ev_cusum_alarm",
    # r18 addition: the segment-explode gap fill (OPTIMIZATION_r18.md §5)
    # partitions by user_id; replicated users carry the fixture's exact
    # observed-hour spans, so grid rows and wall time must grow ~k.
    "ev_hourly_gapfill",
)

# Optional subset, e.g. SPARK_GRAFT_PROBE_QUERIES=ev_debounce_exact,ev_acf_lags
_SUBSET = os.environ.get("SPARK_GRAFT_PROBE_QUERIES")
if _SUBSET:
    _requested = tuple(q for q in _SUBSET.split(",") if q)
    _unknown = sorted(set(_requested) - set(QUERIES))
    if _unknown or not _requested:
        raise ValueError(
            "SPARK_GRAFT_PROBE_QUERIES names not in this probe's QUERIES: "
            f"{_unknown or '(empty)'}; known: {sorted(QUERIES)}"
        )
    QUERIES = _requested


def build_probe_dir(spark: SparkSession, k: int) -> str:
    out = f"/tmp/sfprobe_events_k{k}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    (
        ev.crossJoin(F.broadcast(reps))
        .withColumn("user_id", F.col("rep") * ID_SPACE + F.col("user_id"))
        .withColumn("event_id", F.col("rep") * ID_SPACE + F.col("event_id"))
        .drop("rep")
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(os.path.join(out, "events.parquet"))
    )
    for name in TABLES:
        if name == "events":
            continue
        src = os.path.join(SF_DIR, f"{name}.parquet")
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return out


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    k = int(sys.argv[1])
    spark = local_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    probe_dir = build_probe_dir(spark, k)
    specs = all_specs()
    print("| k | events rows | query | result rows | seconds | sec/k |")
    print("|---|---|---|---|---|---|")
    ev_rows = spark.read.parquet(os.path.join(probe_dir, "events.parquet")).count()
    for name in QUERIES:
        # per-query untimed warm-up (codegen; see scale_probe_tpch.py)
        specs[name].builder(spark, probe_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.monotonic()
            specs[name].builder(spark, probe_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        rows = specs[name].builder(spark, probe_dir).count()
        print(f"| {k} | {ev_rows} | {name} | {rows} | {best:.2f} | {best / k:.2f} |")
    shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
