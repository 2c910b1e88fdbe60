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

Streaming-sink safety: a table written by a Structured Streaming file sink
(the detail stream) carries a ``_spark_metadata`` commit log, and readers
trust THAT log, not the directory listing — deleting partition directories
alone leaves the log referencing dead files and every subsequent read fails
with FileNotFoundException (reproduced in tests/test_retention.py).
:func:`drop_expired_partitions` therefore purges the dropped files from
every commit-log entry (and removes the Hadoop ``.crc`` sidecars that would
otherwise fail checksum verification on the rewritten log).  The purge is
O(log size), not O(data).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

#: Partition directory prefix written by write_dual_sink / the detail stream.
_PREFIX = "date_partition="

#: Structured Streaming file-sink commit log directory.
_METADATA_DIR = "_spark_metadata"


def _purge_metadata_log(table_dir: Path, dropped_keys: list[str]) -> int:
    """Rewrite every ``_spark_metadata`` log file, removing entries whose
    path lies in a dropped partition.  Returns the number of entries purged.

    Log format (FileStreamSinkLog): a version header line (``v1``) followed
    by one JSON ``SinkFileStatus`` per line with a ``path`` field; compacted
    snapshots use the same line format under ``<batch>.compact`` names.
    """
    meta = table_dir / _METADATA_DIR
    if not meta.is_dir() or not dropped_keys:
        return 0
    needles = [f"/{_PREFIX}{key}/" for key in dropped_keys]
    purged = 0
    for log_file in meta.iterdir():
        if not log_file.is_file() or log_file.name.startswith("."):
            continue  # skip .crc sidecars and hidden temp files
        lines = log_file.read_text().splitlines()
        kept, removed = [], 0
        for line in lines:
            if line.startswith("{"):
                path = json.loads(line).get("path", "")
                if any(n in path for n in needles):
                    removed += 1
                    continue
            kept.append(line)
        if removed:
            tmp = log_file.with_name(log_file.name + ".tmp")
            tmp.write_text("\n".join(kept) + "\n")
            tmp.replace(log_file)
            # the Hadoop local-FS checksum sidecar is now stale; a reader
            # would fail checksum verification, so it must go with the edit
            crc = log_file.with_name(f".{log_file.name}.crc")
            if crc.exists():
                crc.unlink()
            purged += removed
    return purged


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

    Works on both batch-written tables and streaming file-sink tables:
    when a ``_spark_metadata`` commit log is present, the dropped files are
    purged from it so subsequent reads stay consistent (see module doc).
    """
    dropped = []
    for key in list_month_partitions(table_dir):
        if key < keep_from:
            shutil.rmtree(Path(table_dir) / f"{_PREFIX}{key}")
            dropped.append(key)
    _purge_metadata_log(Path(table_dir), dropped)
    return dropped


def compact_partitions(
    spark,
    table_dir: str | Path,
    target_files: int = 1,
    min_files: int = 2,
) -> dict[str, int]:
    """Rewrite each month partition's many small files into ``target_files``.

    The small-file problem is the operational twin of retention: every
    streaming micro-batch and every append lands new files, and at 100 TB a
    month partition accumulates thousands of them, each costing a task, a
    footer read, and an open per scan.  Compaction is a per-partition
    rewrite -- read the partition, ``repartition(target_files)``, write,
    atomic directory swap -- so it parallelizes per partition, touches no
    other partition, and a crash mid-partition leaves either the old or the
    new directory, never a mix.

    Partitions already at or below ``min_files`` files are skipped (the
    rewrite would be pure cost).  Returns {month_key: files_before} for the
    partitions compacted.

    Batch tables only: a streaming file sink's ``_spark_metadata`` log pins
    the ORIGINAL file names, and rewriting data files would orphan the log
    (readers trust it -- same failure mode drop_expired_partitions handles
    for deletes), so compacting a streaming-sink table raises instead of
    corrupting it silently.
    """
    root = Path(table_dir)
    if (root / _METADATA_DIR).is_dir():
        raise ValueError(
            f"{table_dir} is a streaming file-sink table (_spark_metadata "
            "present); compaction would orphan the commit log. Stop the "
            "stream and remove the log first, or compact downstream copies."
        )
    compacted: dict[str, int] = {}
    for key in list_month_partitions(root):
        pdir = root / f"{_PREFIX}{key}"
        files = [p for p in pdir.iterdir() if p.suffix == ".parquet"]
        if len(files) <= min_files:
            continue
        df = spark.read.parquet(str(pdir))
        tmp = root / f".{_PREFIX}{key}.compacting"
        df.repartition(target_files).write.mode("overwrite").parquet(str(tmp))
        old = root / f".{_PREFIX}{key}.old"
        pdir.rename(old)
        tmp.rename(pdir)
        shutil.rmtree(old)
        compacted[key] = len(files)
    return compacted
