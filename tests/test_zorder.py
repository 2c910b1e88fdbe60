"""Z-order layout: the data-skipping claim, measured.

``ev_zorder_layout`` registers the stats-index build (oracle-checked by
test_oracle_parity); this module verifies the PROPERTY that justifies the
layout at scale: a 2-dim box predicate, pruned via the per-bucket min/max
stats table, touches a small fraction of z-order buckets but EVERY bucket
of a 1-D (time-only) layout -- and the pruned read returns exactly the
rows of an unpruned scan, so the skipping is lossless.

Mirrors the mechanics a lakehouse table format applies with parquet
row-group footers: this test drives the pruning through the stats table
explicitly so the skipped fraction is observable and assertable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.plans import registry as R
from flink_kafka_consumer_cassandra_output_spark.plans.events_queries import (
    _zorder_dims,
)

from .conftest import SF_DIR


def _with_dims(spark):
    return _zorder_dims(spark.read.parquet(f"{SF_DIR}/events.parquet"))


def _box(dims):
    """A box predicate covering ~1/4 of each dimension's observed range."""
    lo = dims.agg(
        F.min("ub"), F.max("ub"), F.min("hb"), F.max("hb")
    ).first()
    u_lo, u_hi = lo[0], lo[0] + max(1, (lo[1] - lo[0]) // 4)
    h_lo, h_hi = lo[2], lo[2] + max(1, (lo[3] - lo[2]) // 4)
    return u_lo, u_hi, h_lo, h_hi


def test_zorder_stats_prune_box_query(spark):
    dims = _with_dims(spark).cache()
    try:
        u_lo, u_hi, h_lo, h_hi = _box(dims)

        stats = (
            dims.groupBy("zbucket")
            .agg(
                F.min("ub").alias("u_min"), F.max("ub").alias("u_max"),
                F.min("hb").alias("h_min"), F.max("hb").alias("h_max"),
            )
            .collect()
        )
        total = len(stats)
        candidates = [
            r["zbucket"]
            for r in stats
            if not (r["u_max"] < u_lo or r["u_min"] > u_hi
                    or r["h_max"] < h_lo or r["h_min"] > h_hi)
        ]
        assert total >= 8, "fixture should spread over several z-buckets"
        # the skipping claim: a box query needs well under half the buckets
        assert len(candidates) < 0.4 * total, (candidates, total)

        box = (
            (F.col("ub") >= u_lo) & (F.col("ub") <= u_hi)
            & (F.col("hb") >= h_lo) & (F.col("hb") <= h_hi)
        )
        full = {r["event_id"] for r in dims.filter(box).collect()}
        pruned = {
            r["event_id"]
            for r in dims.filter(F.col("zbucket").isin(candidates))
            .filter(box)
            .collect()
        }
        assert pruned == full and full, "stats pruning must be lossless"
    finally:
        dims.unpersist()


def test_time_only_layout_cannot_prune_user_ranges(spark):
    """Contrast row: bucketing by time alone leaves a user-range predicate
    intersecting every bucket (each time bucket spans all users)."""
    dims = _with_dims(spark)
    u_lo, u_hi, _, _ = _box(dims)
    tstats = (
        dims.groupBy(F.shiftright(F.col("hb"), 13).alias("tbucket"))
        .agg(F.min("ub").alias("u_min"), F.max("ub").alias("u_max"))
        .collect()
    )
    hit = [r for r in tstats if not (r["u_max"] < u_lo or r["u_min"] > u_hi)]
    assert len(hit) == len(tstats), "time-only layout prunes nothing on user"


def test_zorder_buckets_partition_the_corpus(spark):
    """Bucket stats cover every event exactly once (it's a layout, not a
    sample): sum(n_events) == corpus count, buckets disjoint by key."""
    out = R.all_specs()["ev_zorder_layout"].builder(spark, SF_DIR)
    agg = out.agg(
        F.sum("n_events").alias("n"), F.count(F.lit(1)).alias("b"),
        F.countDistinct("zbucket").alias("db"),
    ).first()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert agg["n"] == n_events
    assert agg["b"] == agg["db"]
