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


def _file_ranges(out_dir):
    """Per-file (min,max) of user_id and ts_us from parquet FOOTERS only --
    pyarrow metadata reads, no data pages touched; this is what a
    lakehouse manifest stores per file."""
    import glob

    import pyarrow.parquet as pqt

    ranges = {}
    for path in glob.glob(f"{out_dir}/*.parquet"):
        md = pqt.ParquetFile(path).metadata
        cols = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name not in ("user_id", "ts_us"):
                    continue
                st = c.statistics
                lo, hi = cols.get(name, (st.min, st.max))
                cols[name] = (min(lo, st.min), max(hi, st.max))
        ranges[path] = cols
    return ranges


def _candidate_files(ranges, u_lo, u_hi, t_lo, t_hi):
    return [
        p
        for p, c in ranges.items()
        if not (
            c["user_id"][1] < u_lo or c["user_id"][0] > u_hi
            or c["ts_us"][1] < t_lo or c["ts_us"][0] > t_hi
        )
    ]


def test_zorder_file_layout_prunes_box_query(spark, tmp_path):
    """VERDICT r8 item 6: the z-ordered WRITE layout must let parquet
    footer stats plan strictly fewer files for a 2-dim box query than the
    time-ordered layout, and the pruned read must be lossless -- the
    file-level analog of test_detail_sink_partition_pruning."""
    from flink_kafka_consumer_cassandra_output_spark.plans.events_queries import (
        zorder_layout_write,
    )

    zdir, tdir = str(tmp_path / "zorder"), str(tmp_path / "timeonly")
    zorder_layout_write(spark, SF_DIR, zdir, n_files=16, key="zvalue")
    zorder_layout_write(spark, SF_DIR, tdir, n_files=16, key="ts_us")

    ev = spark.read.parquet(zdir)
    lo = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("ts_us"), F.max("ts_us")
    ).first()
    u_lo, u_hi = lo[0], lo[0] + max(1, (lo[1] - lo[0]) // 4)
    t_lo, t_hi = lo[2], lo[2] + max(1, (lo[3] - lo[2]) // 4)

    zr, tr = _file_ranges(zdir), _file_ranges(tdir)
    assert len(zr) >= 8 and len(tr) >= 8, (len(zr), len(tr))
    zc = _candidate_files(zr, u_lo, u_hi, t_lo, t_hi)
    tc = _candidate_files(tr, u_lo, u_hi, t_lo, t_hi)
    # time-only layout: the ts dimension prunes, the user dimension cannot
    # (every file spans all users); the z layout prunes on BOTH
    assert len(zc) < len(tc), (len(zc), len(tc), len(zr))
    assert len(zc) < 0.5 * len(zr), (len(zc), len(zr))

    box = (
        (F.col("user_id") >= u_lo) & (F.col("user_id") <= u_hi)
        & (F.col("ts_us") >= t_lo) & (F.col("ts_us") <= t_hi)
    )
    full = {r["event_id"] for r in ev.filter(box).collect()}
    pruned = {
        r["event_id"]
        for r in spark.read.parquet(*zc).filter(box).collect()
    }
    assert pruned == full and full, "file-level skipping must be lossless"
