"""Exact debounce: batch operator ground truth + stream==batch pin.

The defining counterexample (operators/debounce.py docstring): events at
t=0s, 40s, 80s with a 60s gap.  A lag-based filter keeps only t=0; exact
debounce keeps t=0 AND t=80.  The first test pins that distinction; the
second pins the stateful streaming twin to the batch operator row-for-row
across micro-batches.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.operators.debounce import debounce_exact
from flink_kafka_consumer_cassandra_output_spark.streaming import pipeline as sp
from flink_kafka_consumer_cassandra_output_spark.streaming.stateful import debounced_events

from .test_streaming import N_CHUNKS, _drop

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _ts(s: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_debounce_keeps_relative_to_last_kept(spark):
    """t=0,40,80: exact debounce keeps {0, 80}; lag-based would keep {0}."""
    rows = [
        (1, _ts(0), 7, "click"),
        (2, _ts(40), 7, "click"),
        (3, _ts(80), 7, "click"),
        # second key: exactly-60s and just-under gaps are NOT kept
        # (strict >, measured from the last KEPT event at t=0)
        (4, _ts(0), 8, "click"),
        (5, _ts(60), 8, "click"),
        (6, _ts(59.999999), 8, "click"),
        (7, _ts(121), 8, "click"),
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    kept = {
        r.event_id for r in debounce_exact(ev).collect()
    }
    assert kept == {1, 3, 4, 7}


def test_debounce_stream_matches_batch(spark, sf_dir, tmp_path):
    """The stateful streaming debouncer equals the batch applyInPandas
    operator row-for-row when micro-batches are time-ordered (the
    documented precondition)."""
    import duckdb

    con = duckdb.connect()
    try:
        tbl = con.execute(
            f"SELECT * FROM '{sf_dir}/events.parquet' ORDER BY ts, event_id"
        ).arrow()
    finally:
        con.close()
    chunks = [
        tbl.slice(i * (tbl.num_rows // N_CHUNKS + 1), tbl.num_rows // N_CHUNKS + 1)
        for i in range(N_CHUNKS)
    ]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    _drop(chunks, input_dir, 0, N_CHUNKS)

    ev = sp.stream_events(spark, str(input_dir), max_files_per_trigger=1)
    q = (
        debounced_events(ev)
        .writeStream.format("memory")
        .queryName("debounced")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_deb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = spark.sql(
        "SELECT user_id, event_type, ts, event_id FROM debounced "
        "ORDER BY user_id, event_type, ts, event_id"
    ).toPandas()

    from flink_kafka_consumer_cassandra_output_spark.sources import tables

    batch = (
        debounce_exact(tables.load(spark, sf_dir, "events"))
        .toPandas()
        .sort_values(["user_id", "event_type", "ts", "event_id"])
        .reset_index(drop=True)
    )
    assert len(streamed) == len(batch)
    for col in ["user_id", "event_type", "ts", "event_id"]:
        assert (streamed[col].to_numpy() == batch[col].to_numpy()).all(), col
    # cross-batch state is exercised: some key must have kept events in
    # more than one micro-batch (time-sliced chunks guarantee it at this sf)
    first_chunk_max_ts = pa.compute.max(chunks[0].column("ts")).as_py()
    assert (batch["ts"] > first_chunk_max_ts).any()

    # Close the loop to the driver-facing surface (r12 VERDICT task 5, the
    # ev_quota_flagging pattern): fingerprinting the STREAMED kept set per
    # event_type -- count, sum(event_id), and drops against the raw input
    # counts -- must reproduce the registered (driver-checked)
    # ev_debounce_exact output exactly, so the external DuckDB gate on that
    # query indirectly certifies this stateful streaming path.
    from flink_kafka_consumer_cassandra_output_spark.plans.registry import get as get_spec

    totals = (
        tbl.select(["event_type"])
        .to_pandas()["event_type"]
        .value_counts()
    )
    agg = (
        streamed.groupby("event_type")
        .agg(n_kept=("event_id", "size"), kept_id_sum=("event_id", "sum"))
        .reset_index()
    )
    agg["n_dropped"] = agg["event_type"].map(totals) - agg["n_kept"]
    agg = (
        agg[["event_type", "n_kept", "n_dropped", "kept_id_sum"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    reg = (
        get_spec("ev_debounce_exact").builder(spark, sf_dir)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert len(agg) == len(reg)
    for col in ["event_type", "n_kept", "n_dropped", "kept_id_sum"]:
        assert (agg[col].to_numpy() == reg[col].to_numpy()).all(), col


def test_debounce_stream_matches_batch_at_median_gap(spark, sf_dir, tmp_path):
    """Adversarial parameter set (r10 VERDICT item 7): debounce window =
    the fixture's MEDIAN inter-event gap per key, so roughly half the
    comparisons land on each side of the threshold and the strict->
    boundary is exercised constantly -- not just by the sparse 60s
    default.  Stream must still equal batch row-for-row."""
    import duckdb

    con = duckdb.connect()
    try:
        tbl = con.execute(
            f"SELECT * FROM '{sf_dir}/events.parquet' ORDER BY ts, event_id"
        ).arrow()
        med = con.execute(
            f"""
            SELECT CAST(MEDIAN(gap_us) AS BIGINT) FROM (
              SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap_us
              FROM '{sf_dir}/events.parquet'
            ) WHERE gap_us IS NOT NULL
            """
        ).fetchone()[0]
    finally:
        con.close()
    assert med and med > 0

    chunks = [
        tbl.slice(i * (tbl.num_rows // N_CHUNKS + 1), tbl.num_rows // N_CHUNKS + 1)
        for i in range(N_CHUNKS)
    ]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    _drop(chunks, input_dir, 0, N_CHUNKS)

    ev = sp.stream_events(spark, str(input_dir), max_files_per_trigger=1)
    q = (
        debounced_events(ev, gap_us=int(med))
        .writeStream.format("memory")
        .queryName("debounced_med")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp_deb_med"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = spark.sql(
        "SELECT user_id, event_type, ts, event_id FROM debounced_med "
        "ORDER BY user_id, event_type, ts, event_id"
    ).toPandas()

    from flink_kafka_consumer_cassandra_output_spark.sources import tables

    ev_b = tables.load(spark, sf_dir, "events")
    batch = (
        debounce_exact(ev_b, gap_us=int(med))
        .toPandas()
        .sort_values(["user_id", "event_type", "ts", "event_id"])
        .reset_index(drop=True)
    )
    n_events = tbl.num_rows
    # the median gap must actually drop events AND keep multi-keeps per
    # key, else this parameter set exercises nothing new
    assert 0 < len(batch) < n_events
    assert len(streamed) == len(batch)
    for col in ["user_id", "event_type", "ts", "event_id"]:
        assert (streamed[col].to_numpy() == batch[col].to_numpy()).all(), col


def test_debounce_stream_restart_preserves_state(spark, sf_dir, tmp_path):
    """Kill/restart for the applyInPandasWithState debouncer: the last-kept
    timestamp per key must survive in the state store, so a post-restart
    event inside the gap of a PRE-restart kept event is still suppressed.
    The union of both phases' kept sets must equal the batch operator's
    output exactly — no loss, no dupes, no boundary re-emission."""
    import duckdb

    con = duckdb.connect()
    try:
        tbl = con.execute(
            f"SELECT * FROM '{sf_dir}/events.parquet' ORDER BY ts, event_id"
        ).arrow()
    finally:
        con.close()
    chunks = [
        tbl.slice(i * (tbl.num_rows // N_CHUNKS + 1), tbl.num_rows // N_CHUNKS + 1)
        for i in range(N_CHUNKS)
    ]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    cp = tmp_path / "cp_deb_restart"

    # the memory sink refuses checkpoint recovery; foreachBatch -> parquet
    # supports it (batch ids tracked in the checkpoint, idempotent append)
    out = tmp_path / "kept"

    def _phase(phase_dir):
        dest = str(out / phase_dir)

        def write_batch(df, batch_id):
            df.write.mode("append").parquet(dest)

        ev = sp.stream_events(spark, str(input_dir), max_files_per_trigger=1)
        q = (
            debounced_events(ev)
            .writeStream.foreachBatch(write_batch)
            .outputMode("update")
            .option("checkpointLocation", str(cp))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(dest).select(
            "user_id", "event_type", "ts", "event_id"
        ).toPandas()

    # phase 1: first half of the stream, then the query DIES
    _drop(chunks, input_dir, 0, 2)
    kept1 = _phase("phase1")

    # phase 2: rest arrives; a NEW query restarts from the checkpoint
    _drop(chunks, input_dir, 2, N_CHUNKS)
    kept2 = _phase("phase2")

    from flink_kafka_consumer_cassandra_output_spark.sources import tables

    batch = debounce_exact(tables.load(spark, sf_dir, "events")).toPandas()
    key = lambda df: {  # noqa: E731
        (r.user_id, r.event_type, r.ts, r.event_id) for r in df.itertuples()
    }
    union = key(kept1) | key(kept2)
    assert not (key(kept1) & key(kept2)), "restart re-emitted kept events"
    assert union == key(batch)
    assert len(kept2), "phase 2 emitted nothing; restart path untested"
