"""Storage-level retention: drop expired month partitions (O18's other half).

The reference expires detail rows server-side with ``USING TTL n`` on the
Cassandra INSERT (/root/reference/src/main/java/com/cansever/consumer/
BackupMessageConsumer.java:46-51; CassandraOutputFormat.java:86-90).  The
engine's analytical analog has two layers:

- **read-time**: ``functions.datetime_fns.retention_predicate`` — a
  partition-pruning filter (the ``msg_retention`` query);
- **storage-time** (this module): physically drop ``date_partition=``
  directories older than the cutoff, the parquet equivalent of TTL expiry /
  ``ALTER TABLE DROP PARTITION``.

Deleting whole month directories is O(#partitions) metadata work and never
rewrites surviving data — the reason the reference chose a month partition
key in the first place (CassandraOutputFormat.java:106), and the only
retention strategy that stays cheap at 100 TB.
"""

from __future__ import annotations

import shutil
from pathlib import Path

#: Partition directory prefix written by write_dual_sink / the detail stream.
_PREFIX = "date_partition="


def list_month_partitions(table_dir: str | Path) -> list[str]:
    """The ``yyyyMMM`` month keys present in a partitioned detail table."""
    root = Path(table_dir)
    return sorted(
        p.name[len(_PREFIX):]
        for p in root.iterdir()
        if p.is_dir() and p.name.startswith(_PREFIX)
    )


def drop_expired_partitions(table_dir: str | Path, keep_from: str) -> list[str]:
    """Drop every month partition strictly older than ``keep_from``
    (a ``yyyyMMM`` key, e.g. ``"202401M"``).  Returns the dropped keys.

    Month keys are zero-padded ``yyyyMM`` + ``'M'``, so lexicographic
    comparison IS chronological comparison — the same property the
    reference's summary ``min(date_partition)`` relies on.
    """
    dropped = []
    for key in list_month_partitions(table_dir):
        if key < keep_from:
            shutil.rmtree(Path(table_dir) / f"{_PREFIX}{key}")
            dropped.append(key)
    return dropped
