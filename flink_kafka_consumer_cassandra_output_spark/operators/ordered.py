"""Distributed total-order prefix machinery.

Cumulative aggregates over a TOTAL order (ABC cumulative revenue share,
tercile ranks) are classically written as a single unpartitioned window --
which Spark executes by moving every row to ONE task (`WindowExec: No
Partition Defined` warning): fine on a laptop, a guaranteed straggler at
100 TB.  The scalable decomposition (the ``doc_weighted_sample`` pattern,
round 8) is:

1. ``repartitionByRange`` on the order key -- partition p holds a
   contiguous slice of the total order, slices ascending with partition id;
2. per-partition window aggregates (each task sees only its slice);
3. a TINY one-row-per-partition partial-aggregate table, prefix-summed with
   a single window over ``nparts`` rows (constant-size, not data-bound) and
   broadcast-joined back as each slice's offset.

Exactness: the decomposition is bit-identical to the global-window form
whenever the windowed aggregate is associative over exact values --
integer counts/ranks, exact DECIMAL sums -- because the set of rows
preceding a given row in the total order is exactly (earlier partitions) +
(earlier rows in this partition) regardless of where the sampled range
boundaries land.  Do NOT use this for double-typed running sums whose
value must match a specific fold order.

``range_ordered_parts`` handles the two sharp edges of the pattern:

- the input is ``materialize``d first, so ``repartitionByRange``'s
  boundary-sampling pass reads a cheap checkpointed frame instead of
  re-running the upstream aggregation;
- the pid-labelled frame is ``materialize``d AGAIN after
  ``spark_partition_id()`` is attached.  This second checkpoint is a
  CORRECTNESS requirement, not an optimization: the partial-sum subtree
  and the offset-join subtree each evaluate their input, and nothing
  guarantees the two evaluations of a range exchange agree -- the
  boundary sampler re-runs per evaluation, and AQE's partition coalescing
  can merge the shuffle output differently per query plan, silently
  changing what ``spark_partition_id()`` returns.  Found live by
  ``tools/scale_probe_ordered.py`` at k=2: tercile buckets flipped for
  the 45 rows adjacent to partition boundaries because the offsets table
  described a different partitioning than the rows carried.  Pinning the
  labels once makes every consumer read the same (row, pid) assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize


def range_ordered_parts(df: DataFrame, *order_cols, nparts: int | None = None) -> DataFrame:
    """Range-partition ``df`` by the total order ``order_cols`` and attach
    the partition id as ``pid`` (ascending with the order).  See module
    docstring for the prefix-aggregate recipe built on top."""
    if nparts is None:
        nparts = max(2, df.sparkSession.sparkContext.defaultParallelism)
    labelled = materialize(df).repartitionByRange(nparts, *order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
    # second checkpoint pins the (row, pid) assignment for ALL consumers --
    # see module docstring, "CORRECTNESS requirement"
    return materialize(labelled)
