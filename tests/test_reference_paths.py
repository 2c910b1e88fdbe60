"""Tests for reference paths that round 1 left unexecuted (VERDICT.md
"What's missing" items 5/6/10): the dual-sink writer round-trip, the Avro
decode path (probed, skip-with-reason if the jar is absent), the config
loader, and the multimodal decode stub contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark import config
from flink_kafka_consumer_cassandra_output_spark.operators import message_pipeline as mp
from flink_kafka_consumer_cassandra_output_spark.operators import multimodal as mm
from flink_kafka_consumer_cassandra_output_spark.sources import avro


def test_write_dual_sink_roundtrip(spark, sf_dir, tmp_path):
    """O12/O13: the writer actually writes; reading back reproduces the
    in-memory detail/summary exactly (CassandraOutputFormat.java:87-95)."""
    msgs = mp.messages_from_events(spark, sf_dir)
    mp.write_dual_sink(msgs, str(tmp_path))

    detail = spark.read.parquet(f"{tmp_path}/message_history")
    assert detail.count() == msgs.count()
    # month partitioning materialized as directories (partition pruning path)
    parts = [p.name for p in (tmp_path / "message_history").iterdir() if p.is_dir()]
    assert parts and all(p.startswith("date_partition=") for p in parts)
    # ciphertext is Java-parity unchunked base64
    assert detail.filter(F.col("stanza").rlike("[\r\n]")).count() == 0

    summary = spark.read.parquet(f"{tmp_path}/message_history_summary")
    got = {(r.username, r.jid, r.date_partition) for r in summary.collect()}
    expect = {
        (r.username, r.jid, r.date_partition)
        for r in mp.summary_distinct(msgs).collect()
    }
    assert got == expect
    assert summary.count() == len(got)  # distinct => no dupes on disk


def test_avro_roundtrip_or_recorded_skip(spark):
    """O2/O3: to_avro -> from_avro round-trip with the reference schema
    (AvroDeserializationSchema.java:34-50).  If the spark-avro jar is absent
    the skip records the probe result instead of silently passing."""
    if not avro.avro_available():
        pytest.skip("spark-avro python bindings absent (probe: import failed)")
    from pyspark.sql.avro.functions import to_avro

    rows = [
        ("m1", "alice", "bob@chat.local", 1471000000000, "<message type=\"T\"><body>hi</body></message>"),
        ("m2", "carol", "dan@chat.local", 1704067200123, "<message type=\"P\"><body>pic</body></message>"),
    ]
    df = spark.createDataFrame(rows, avro.MESSAGE_SCHEMA)
    try:
        packed = df.select(to_avro(F.struct(*df.columns)).alias("value"))
        decoded = packed.select(avro.decode_message(F.col("value")).alias("m")).select("m.*")
        got = [tuple(r) for r in decoded.collect()]
    except Exception as e:  # jar genuinely missing (python bindings alone lie)
        pytest.skip(f"spark-avro jar not usable at runtime: {type(e).__name__}")
    assert got == rows


def test_read_properties_and_kafka_prefix(tmp_path):
    """O19: properties parse + kafka.message.backup. prefix strip
    (BackupMessageConsumer.java:66-87, conf/message-consumer.properties:1-12)."""
    f = tmp_path / "consumer.properties"
    f.write_text(
        "# comment\n"
        "! also comment\n"
        "\n"
        "job.name = backup-job\n"
        "kafka.message.backup.bootstrap.servers=localhost:9092\n"
        "kafka.message.backup.group.id=backup\n"
        "record.ttl=86400\n"
        "no-equals-line\n"
    )
    props = config.read_properties(f)
    assert props["job.name"] == "backup-job"
    assert props["record.ttl"] == "86400"
    assert "no-equals-line" not in props
    kafka = config.filter_kafka_properties(props)
    assert kafka == {"bootstrap.servers": "localhost:9092", "group.id": "backup"}
    # non-prefixed keys never leak into the client config
    assert "job.name" not in kafka


def test_detail_sink_partition_pruning(spark, sf_dir, tmp_path):
    """The month-partitioned detail table must prune at the directory level:
    a date_partition predicate reaches the scan as a partition filter, and
    the plan reads one partition, not the table (the design goal of the
    reference's partition key, CassandraOutputFormat.java:106)."""
    msgs = mp.messages_from_events(spark, sf_dir)
    mp.write_dual_sink(msgs, str(tmp_path))
    month = spark.read.parquet(f"{tmp_path}/message_history").select(
        "date_partition"
    ).first().date_partition

    q = spark.read.parquet(f"{tmp_path}/message_history").filter(
        F.col("date_partition") == month
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(date_partition" in plan, plan[:500]
    assert q.count() > 0


def test_multimodal_decode_is_stubbed():
    """The codec decode must refuse loudly, not fake pixels."""
    with pytest.raises(NotImplementedError, match="codec"):
        mm.decode_media(b"\x89PNG", "image/png")
