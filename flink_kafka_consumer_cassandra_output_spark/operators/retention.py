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
            # unlink the Hadoop checksum sidecar BEFORE installing the new
            # content: a missing .crc is tolerated, but a stale one (crash
            # after replace, before unlink) fails checksum verification on
            # every subsequent open of the commit log
            crc = log_file.with_name(f".{log_file.name}.crc")
            if crc.exists():
                crc.unlink()
            tmp.replace(log_file)
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
    For a streaming table the owning stream must be STOPPED first: a
    concurrently running sink compacts its log from in-memory state and
    would resurrect the purged entries (the same stop-the-stream
    requirement :func:`compact_partitions` enforces).

    Crash-safe ordering: the commit log is purged BEFORE any directory is
    deleted.  A crash after the purge merely leaks data files that a
    re-run removes (the directories still exist, so the keys are
    recomputed); the reverse order would leave a log referencing deleted
    files with no way for a re-run to discover which keys to repair.
    """
    root = Path(table_dir)
    dropped = [k for k in list_month_partitions(root) if k < keep_from]
    _purge_metadata_log(root, dropped)
    for key in dropped:
        shutil.rmtree(root / f"{_PREFIX}{key}")
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
    rewrite -- read the partition, ``repartition(target_files)``, write to
    a hidden staging dir, swap -- so it parallelizes per partition and
    touches no other partition.

    Crash recovery, honestly stated: POSIX cannot atomically replace a
    non-empty directory, so the swap is two renames with a window where
    the partition is momentarily absent.  Instead of pretending otherwise,
    every run begins by REPAIRING interrupted swaps from the hidden
    staging/backup dirs (old backup present + partition missing -> restore
    the backup; stale staging -> discard), so a crash at any point is
    healed by re-running -- never silent data loss, at worst a leaked
    hidden directory until the next run.

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
    _repair_interrupted_compactions(root)
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
        pdir.rename(old)   # crash here: repaired by restoring `old`
        tmp.rename(pdir)   # crash here: `old` backup still exists, removed below
        shutil.rmtree(old)
        compacted[key] = len(files)
    return compacted


def _repair_interrupted_compactions(root: Path) -> None:
    """Heal the table after a crash mid-swap (see compact_partitions doc)."""
    for old in root.glob(f".{_PREFIX}*.old"):
        pdir = root / old.name[1:-len(".old")]
        if pdir.exists():
            shutil.rmtree(old)   # swap completed; backup is redundant
        else:
            old.rename(pdir)     # swap died between the renames; restore
    for tmp in root.glob(f".{_PREFIX}*.compacting"):
        shutil.rmtree(tmp)       # staging from an unfinished attempt
