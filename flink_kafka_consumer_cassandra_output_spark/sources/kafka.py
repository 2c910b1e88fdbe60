"""Kafka source builders (reference operator O1).

The reference subscribes one ``FlinkKafkaConsumer082`` to a single topic with
a consumer group and checkpointed offsets
(/root/reference/src/main/java/com/cansever/consumer/BackupMessageConsumer.java:36-39,
config at conf/message-consumer.properties:1-4).  Spark twin: the
``kafka`` DataSource in streaming (``readStream``) or batch (``read``) mode;
offsets live in the Structured Streaming checkpoint (O17) rather than the
consumer group, giving replayable exactly-once instead of the reference's
at-most-once sink behavior (SURVEY.md O14).

The ``kafka.``-prefixed passthrough mirrors the reference's prefix-filtered
property namespacing (O19, BackupMessageConsumer.java:77-87).

This container has no Kafka broker and may lack the kafka connector jar, so
these builders are exercised by unit tests only up to option assembly; the
file-source streaming twin in ``streaming/pipeline.py`` covers the runtime
path end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def kafka_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    client_props: dict[str, str] | None = None,
) -> dict[str, str]:
    """Assemble the option map for Spark's kafka source.  Client properties
    (already prefix-stripped by ``config.filter_kafka_properties``) are
    forwarded under Spark's ``kafka.`` option namespace."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    for k, v in (client_props or {}).items():
        if k in ("bootstrap.servers", "zookeeper.connect"):
            continue  # carried explicitly / not a Spark-kafka option
        opts[f"kafka.{k}"] = v
    return opts


def read_stream(spark: SparkSession, **kw) -> DataFrame:
    """Streaming scan: unbounded DataFrame of (key, value, topic, partition,
    offset, timestamp, ...) -- parallelism follows Kafka partitions exactly
    as the reference's source parallelism did."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(**kw).items():
        reader = reader.option(k, v)
    return reader.load()


def read_batch(spark: SparkSession, **kw) -> DataFrame:
    """Batch scan of a bounded offset range (backfill / reprocessing)."""
    reader = spark.read.format("kafka")
    for k, v in kafka_options(**kw).items():
        reader = reader.option(k, v)
    return reader.load()
