"""Date/time scalar functions (reference operators O5, O6, O18).

- O5 epoch-ms -> timestamp: the reference does ``new Date(msg.getSentTime())``
  (/root/reference/src/main/java/com/cansever/consumer/CassandraOutputFormat.java:103).
- O6 month partition key: Joda ``yyyyMM`` print of the epoch plus a literal
  ``"M"`` suffix, e.g. ``201608M`` (CassandraOutputFormat.java:56,106).  The
  Joda formatter used the JVM default timezone; this engine pins UTC
  (session timezone) -- a documented divergence (SURVEY.md section 5 case 2).
- O18 TTL/retention: the reference appends ``USING TTL n`` to the Cassandra
  INSERT (BackupMessageConsumer.java:46-51, CassandraOutputFormat.java:86-90);
  the analytical analog is a retention predicate on event time.

All pure Column expressions -- JVM-side, codegen-fused, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Suffix appended to the month bucket (CassandraOutputFormat.java:106).
DATE_PARTITION_SUFFIX = "M"


def epoch_ms_to_timestamp(ms: Column) -> Column:
    """O5: epoch milliseconds -> timestamp (CassandraOutputFormat.java:103)."""
    return F.timestamp_millis(ms.cast("long"))


def date_partition_from_ts(ts: Column) -> Column:
    """O6: month bucket string ``yyyyMM || 'M'`` from a timestamp column."""
    return F.concat(F.date_format(ts, "yyyyMM"), F.lit(DATE_PARTITION_SUFFIX))


def date_partition_from_epoch_ms(ms: Column) -> Column:
    """O6 exactly as the reference computes it: from the raw epoch-ms long."""
    return date_partition_from_ts(epoch_ms_to_timestamp(ms))


def retention_predicate(ts: Column, cutoff_ts: str) -> Column:
    """O18: keep rows newer than the retention cutoff (TTL analog).

    On a partitioned table this prunes whole ``date_partition`` directories
    at scan time; at 100 TB that is the difference between reading one month
    and reading everything.
    """
    return ts >= F.lit(cutoff_ts).cast("timestamp")
