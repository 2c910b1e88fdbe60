"""Storage-level retention (O18): dropping expired month partitions removes
exactly the old directories, survivors read back intact — for batch-written
tables AND streaming file-sink tables (whose ``_spark_metadata`` commit log
must be purged of the dropped files, or every later read fails)."""

from __future__ import annotations

import datetime as dt
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.operators import message_pipeline as mp
from flink_kafka_consumer_cassandra_output_spark.operators import retention
from flink_kafka_consumer_cassandra_output_spark.streaming import pipeline as sp


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


def _events_chunk(path, ms_list, start_id):
    tbl = pa.table(
        {
            "event_id": pa.array(range(start_id, start_id + len(ms_list)), pa.int64()),
            "ts": pa.array(
                [dt.datetime.utcfromtimestamp(ms / 1000) for ms in ms_list],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([1] * len(ms_list), pa.int64()),
            "event_type": pa.array(["click"] * len(ms_list)),
            "value": pa.array([1.0] * len(ms_list)),
            "props": pa.array(['{"k": 1}'] * len(ms_list)),
        }
    )
    pq.write_table(tbl, path)


def test_compact_partitions(spark, tmp_path):
    """Small-file compaction: per-partition rewrite halves... collapses the
    file count, preserves every row exactly, and skips partitions already
    compact."""
    msgs = _multi_month_msgs(spark).repartition(4)  # force multiple files
    mp.write_dual_sink(msgs, str(tmp_path))
    table = tmp_path / "message_history"

    def files_in(key):
        return [p for p in (table / f"date_partition={key}").iterdir() if p.suffix == ".parquet"]

    before_rows = sorted(
        (r.message_id, r.date_partition) for r in spark.read.parquet(str(table)).collect()
    )
    assert len(files_in("202401M")) > 1  # the problem exists

    compacted = retention.compact_partitions(spark, table, target_files=1)
    assert "202401M" in compacted
    assert len(files_in("202401M")) == 1
    after_rows = sorted(
        (r.message_id, r.date_partition) for r in spark.read.parquet(str(table)).collect()
    )
    assert after_rows == before_rows  # no loss, no dupes, values intact

    # second pass: everything already compact -> no-op
    assert retention.compact_partitions(spark, table, target_files=1) == {}


def test_compact_repairs_interrupted_swap(spark, tmp_path):
    """Simulate a crash between the two swap renames (partition dir absent,
    hidden .old backup + stale .compacting staging present): the next run
    must restore the data before compacting."""
    msgs = _multi_month_msgs(spark).repartition(4)
    mp.write_dual_sink(msgs, str(tmp_path))
    table = tmp_path / "message_history"
    before = sorted(r.message_id for r in spark.read.parquet(str(table)).collect())

    pdir = table / "date_partition=202401M"
    pdir.rename(table / ".date_partition=202401M.old")  # crash mid-swap
    (table / ".date_partition=202401M.compacting").mkdir()

    compacted = retention.compact_partitions(spark, table, target_files=1)
    assert "202401M" in compacted  # repaired, then compacted
    after = sorted(r.message_id for r in spark.read.parquet(str(table)).collect())
    assert after == before
    assert not list(table.glob(".date_partition=*"))  # no hidden leftovers


def test_compact_refuses_streaming_sink_table(spark, tmp_path):
    input_dir = tmp_path / "in"
    out = tmp_path / "detail"
    input_dir.mkdir()
    _events_chunk(input_dir / "a.parquet", [1705000000000] * 4, 0)
    sp.run_detail_stream(spark, str(input_dir), str(out), str(tmp_path / "cp")).awaitTermination()
    with pytest.raises(ValueError, match="_spark_metadata"):
        retention.compact_partitions(spark, out)


def test_drop_expired_partitions_streaming_sink(spark, tmp_path):
    """Retention on a STREAMING file-sink table: readers trust the
    _spark_metadata commit log, so the drop must purge it too."""
    input_dir = tmp_path / "in"
    out = tmp_path / "detail"
    cp = tmp_path / "cp"
    input_dir.mkdir()
    _events_chunk(input_dir / "a.parquet", [1700000000000] * 3, 0)   # 2023-11
    _events_chunk(input_dir / "b.parquet", [1705000000000] * 4, 10)  # 2024-01
    sp.run_detail_stream(spark, str(input_dir), str(out), str(cp)).awaitTermination()
    assert retention.list_month_partitions(out) == ["202311M", "202401M"]

    # prove the hazard this operator exists to prevent: deleting the
    # directory WITHOUT purging the commit log breaks every later read.
    # (A fresh stream run, not a copytree: the commit log stores ABSOLUTE
    # paths, so a copied table would still read the original's files.)
    broken = tmp_path / "broken"
    sp.run_detail_stream(spark, str(input_dir), str(broken), str(tmp_path / "cp2")).awaitTermination()
    shutil.rmtree(broken / "date_partition=202311M")
    with pytest.raises(Exception, match="does not exist|FileNotFound|FAILED_READ_FILE"):
        spark.read.parquet(str(broken)).count()

    # the real operator: directory drop + metadata purge => consistent reads
    dropped = retention.drop_expired_partitions(out, keep_from="202401M")
    assert dropped == ["202311M"]
    kept = spark.read.parquet(str(out))
    assert kept.count() == 4
    assert {r.date_partition for r in kept.select("date_partition").distinct().collect()} == {
        "202401M"
    }

    # the stream keeps running against the retained table: new data lands
    # and reads stay consistent (commit log intact for surviving batches)
    _events_chunk(input_dir / "c.parquet", [1706000000000] * 2, 20)  # 2024-01 later
    sp.run_detail_stream(spark, str(input_dir), str(out), str(cp)).awaitTermination()
    assert spark.read.parquet(str(out)).count() == 6
