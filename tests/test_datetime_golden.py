"""O5/O6 known-answer vectors (SURVEY.md section 5 case 2, FIXTURES.md B.4):
the reference's date_partition for fixed epochs, month and year boundaries,
UTC-pinned (documented divergence from Joda's JVM-default-zone behavior)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.functions import datetime_fns as DT

#: (epoch_ms, expected date_partition under UTC)
GOLDEN = [
    (1471000000000, "201608M"),  # 2016-08-12T11:06:40Z — the B.4 vector
    (1471000000123, "201608M"),  # sub-second component ignored by the month key
    (0, "197001M"),              # the epoch itself
    (946684799999, "199912M"),   # 1999-12-31T23:59:59.999Z — millennium edge
    (946684800000, "200001M"),   # one ms later
    (1704067199999, "202312M"),  # year boundary, end side
    (1704067200000, "202401M"),  # year boundary, start side
]


def test_date_partition_golden(spark):
    df = spark.createDataFrame([(ms,) for ms, _ in GOLDEN], "ms long")
    got = {
        r.ms: r.dp
        for r in df.select(
            "ms", DT.date_partition_from_epoch_ms(F.col("ms")).alias("dp")
        ).collect()
    }
    for ms, expect in GOLDEN:
        assert got[ms] == expect, f"{ms}: {got[ms]} != {expect}"


def test_epoch_ms_to_timestamp_millis_precision(spark):
    df = spark.createDataFrame([(1471000000123,)], "ms long")
    row = df.select(
        DT.epoch_ms_to_timestamp(F.col("ms")).alias("ts"),
        F.unix_millis(DT.epoch_ms_to_timestamp(F.col("ms"))).alias("back"),
    ).first()
    assert row.back == 1471000000123  # ms precision survives the round-trip
    assert row.ts.isoformat().startswith("2016-08-12T11:06:40.123")
