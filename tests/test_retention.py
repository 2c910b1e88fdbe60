"""Storage-level retention (O18): dropping expired month partitions removes
exactly the old directories, survivors read back intact."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.operators import message_pipeline as mp
from flink_kafka_consumer_cassandra_output_spark.operators import retention


def _multi_month_msgs(spark):
    """Synthetic messages spanning three months (the events fixture covers
    only 2024-01, so boundary behavior needs constructed input)."""
    rows = []
    for i, ms in enumerate(
        [1700000000000] * 3      # 2023-11
        + [1703000000000] * 2    # 2023-12
        + [1705000000000] * 4    # 2024-01
    ):
        rows.append((f"m{i}", f"user{i % 2}", "peer@chat.local", ms,
                     f'<message type="T"><body>b{i}</body></message>'))
    df = spark.createDataFrame(
        rows, "msg_id string, username string, jid string, sent_time_ms long, stanza string"
    )
    return df.withColumn("sent_ts", F.timestamp_millis("sent_time_ms"))


def test_drop_expired_partitions(spark, tmp_path):
    msgs = _multi_month_msgs(spark)
    mp.write_dual_sink(msgs, str(tmp_path))
    table = tmp_path / "message_history"
    assert retention.list_month_partitions(table) == ["202311M", "202312M", "202401M"]

    dropped = retention.drop_expired_partitions(table, keep_from="202312M")
    assert dropped == ["202311M"]
    assert retention.list_month_partitions(table) == ["202312M", "202401M"]

    # survivors intact and complete
    kept = spark.read.parquet(str(table))
    assert kept.count() == 6
    months = {r.date_partition for r in kept.select("date_partition").distinct().collect()}
    assert months == {"202312M", "202401M"}

    # idempotent: nothing further to drop at the same cutoff
    assert retention.drop_expired_partitions(table, keep_from="202312M") == []
