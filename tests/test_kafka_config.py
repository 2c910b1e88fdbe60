"""O1/O19 unit tests: Kafka option assembly from prefix-filtered properties
(BackupMessageConsumer.java:36-39,77-87 semantics, no broker needed)."""

from __future__ import annotations

from flink_kafka_consumer_cassandra_output_spark import config
from flink_kafka_consumer_cassandra_output_spark.sources import kafka


def test_kafka_options_from_reference_style_properties(tmp_path):
    f = tmp_path / "consumer.properties"
    f.write_text(
        "kafka.message.backup.bootstrap.servers=broker1:9092,broker2:9092\n"
        "kafka.message.backup.group.id=message-backup\n"
        "kafka.message.backup.zookeeper.connect=zk:2181\n"
        "kafka.message.backup.max.poll.records=500\n"
        "topic.name=message_backup\n"
    )
    props = config.read_properties(f)
    client = config.filter_kafka_properties(props)
    opts = kafka.kafka_options(
        bootstrap_servers=client["bootstrap.servers"],
        topic=props["topic.name"],
        client_props=client,
    )
    assert opts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert opts["subscribe"] == "message_backup"
    assert opts["startingOffsets"] == "earliest"
    # client props forwarded under Spark's kafka.* namespace
    assert opts["kafka.max.poll.records"] == "500"
    assert opts["kafka.group.id"] == "message-backup"
    # zookeeper is a Kafka-0.8ism; never forwarded to the Spark source
    assert not any("zookeeper" in k for k in opts)
    # bootstrap carried exactly once (explicitly, not doubled by passthrough)
    assert sum(1 for k in opts if k.endswith("bootstrap.servers")) == 1


def test_kafka_reader_builders_compose(spark):
    """Builders must produce plans without contacting any broker: streaming
    reader construction is lazy, so option assembly is fully checkable.
    Skips with a recorded reason when the kafka connector jar is absent
    (this container ships no spark-sql-kafka)."""
    import pytest

    try:
        df = kafka.read_stream(
            spark, bootstrap_servers="localhost:9092", topic="t", client_props={}
        )
    except Exception as e:
        pytest.skip(f"kafka connector jar absent: {type(e).__name__}")
    assert df.isStreaming
    cols = set(df.columns)
    assert {"key", "value", "topic", "partition", "offset"} <= cols
