"""applyInPandasWithState: the custom stateful operator must converge to
the batch ground truth across multiple micro-batches, carrying state
between them."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.sources import tables
from flink_kafka_consumer_cassandra_output_spark.streaming import pipeline as sp
from flink_kafka_consumer_cassandra_output_spark.streaming.stateful import running_user_counts

from .test_streaming import N_CHUNKS, _drop


def test_running_counts_match_batch(spark, sf_dir, tmp_path):
    import duckdb

    con = duckdb.connect()
    try:
        tbl = con.execute(
            f"SELECT * FROM '{sf_dir}/events.parquet' ORDER BY ts, event_id"
        ).arrow()
    finally:
        con.close()
    chunks = [tbl.slice(i * (tbl.num_rows // N_CHUNKS + 1), tbl.num_rows // N_CHUNKS + 1) for i in range(N_CHUNKS)]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    _drop(chunks, input_dir, 0, N_CHUNKS)

    # one file per micro-batch => state must carry across 4 batches
    ev = sp.stream_events(spark, str(input_dir), max_files_per_trigger=1)
    q = (
        running_user_counts(ev)
        .writeStream.format("memory")
        .queryName("running_counts")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    emitted = spark.sql("SELECT * FROM running_counts").toPandas()
    # multiple batches => more emissions than final users
    final = emitted.sort_values("n_events").groupby("user_id").last()

    batch = (
        tables.load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
            F.max("ts").alias("last_ts"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    for uid, row in batch.iterrows():
        got = final.loc[uid]
        assert got.n_events == row.n_events, f"user {uid} count"
        assert got.sum_value_cents == row.sum_value_cents, f"user {uid} sum"
        assert got.last_ts == row.last_ts, f"user {uid} last_ts"
    # state really carried across batches: some user must appear in >1 batch
    assert len(emitted) > len(final)
