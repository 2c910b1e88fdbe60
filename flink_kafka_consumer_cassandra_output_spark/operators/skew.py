"""Skew mitigation: salted two-phase aggregation.

Not in the reference (single shuffle-free stream); part of the engine's
scale toolkit.  A heavily-skewed group key (one username producing most
messages — the realistic hot key in the reference's domain) concentrates a
shuffle partition on one task.  AQE skew-join splitting is enabled
session-wide (session.py); for aggregations, salting splits each hot group
into ``n_salts`` subgroups, aggregates partials in parallel, then combines.
Exact for any commutative-associative aggregate (count/sum/min/max).

At 100 TB: phase 1 shuffles on (key, salt) — cardinality x n_salts, each
partition bounded by |group|/n_salts; phase 2 shuffles n_salts rows per
group, negligible.  The cost is one extra (tiny) shuffle; the win is no
straggler task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """Exact per-key row counts via salted two-phase aggregation.

    Equivalent to ``df.groupBy(keys).count()`` (asserted by
    tests/test_salting.py) but immune to a single hot key dominating one
    shuffle partition.  The salt is a deterministic hash of a unique-ish
    projection of the row spread over ``n_salts`` buckets (any spread works
    — correctness never depends on the salt distribution).
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial_n"))
    )
    return (
        partial.groupBy(*keys)
        .agg(F.sum("_partial_n").cast("long").alias("n"))
    )
