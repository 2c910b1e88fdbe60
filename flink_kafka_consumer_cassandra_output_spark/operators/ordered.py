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
  boundary-sampling pass and every downstream consumer (the partial-sum
  subtree AND the offset join subtree) read the cheap checkpointed frame
  instead of re-running the upstream aggregation;
- ``spark_partition_id()`` is attached inside the same plan, so the pid
  labelling and the partial sums can never disagree about boundaries.
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
    return materialize(df).repartitionByRange(nparts, *order_cols).withColumn(
        "pid", F.spark_partition_id()
    )
