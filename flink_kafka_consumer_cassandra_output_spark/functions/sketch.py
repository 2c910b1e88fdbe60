"""Count-min sketch primitives shared by the batch query and its
streaming twin.

A CMS is a D x W integer grid: row j counts every value in bucket
``h_j(value)``; a point estimate is ``min_j grid[j][h_j(v)]`` and can
only OVER-estimate (collisions add, never subtract).  Two properties
make it the canonical 100 TB sketch:

- the build is a map-side-combinable groupBy on (row, bucket) whose
  result is D*W integers regardless of input size;
- sketches are ADDITIVE: cell-wise sum of per-partition (or per-batch)
  sketches equals the sketch of the union, so streaming maintenance is
  just appending per-batch deltas and summing at read time.

Bucket hashing is md5-salted and identical in Spark and DuckDB
(``'0x' || substr(md5(...))`` twin of ``F.conv(F.substring(F.md5``),
so the sketch itself is oracle-checkable cell for cell.

No reference citation: the reference has no sketches (SURVEY.md §2
absent-category "aggregations"); this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash rows / buckets per row.  W intentionally below the fixture's
#: user_id cardinality so collisions (and the over-estimate property)
#: are visible in test output.
CMS_D = 4
CMS_W = 32


def cms_bucket(j: int, value: Column) -> Column:
    """Row-j bucket of ``value`` (BIGINT in [0, CMS_W))."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), value.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % CMS_W
    )


def cms_bucket_sql(j: int, value_sql: str) -> str:
    """DuckDB twin of :func:`cms_bucket`."""
    return (
        f"CAST('0x' || substr(md5('cms{j}:' || CAST({value_sql} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {CMS_W}"
    )


def cms_row_buckets(value: Column) -> Column:
    """array<struct<row_id,bucket>> of the value's CMS_D (row, bucket)
    coordinates -- explode it to fan one input row into D sketch updates."""
    return F.array(
        *[
            F.struct(F.lit(j).alias("row_id"), cms_bucket(j, value).alias("bucket"))
            for j in range(CMS_D)
        ]
    )


def cms_build(df: DataFrame, value: Column) -> DataFrame:
    """The D x W sketch of ``value`` over ``df``: (row_id, bucket, cnt)
    rows, absent cells meaning zero.  One explode + one combinable
    groupBy; output is at most CMS_D * CMS_W rows."""
    return (
        df.select(F.explode(cms_row_buckets(value)).alias("rb"))
        .select("rb.row_id", "rb.bucket")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(candidates: DataFrame, value: Column, sketch: DataFrame) -> DataFrame:
    """min-over-rows point estimates for every candidate row.

    ``candidates`` keeps all its columns; the result adds
    ``cms_estimate``.  The sketch side is broadcast (<= D*W rows)."""
    probes = candidates.withColumn("rb", F.explode(cms_row_buckets(value))).select(
        *candidates.columns, F.col("rb.row_id").alias("row_id"),
        F.col("rb.bucket").alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_id", "bucket"])
        .groupBy(*candidates.columns)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


# --------------------------------------------------------------------------
# Bloom filter (membership sketch)
# --------------------------------------------------------------------------

#: Bloom geometry for the decontamination filter.  Sized for the FIXTURE's
#: largest needle set (sf0.1: ~50 needle docs x ~120 distinct 6-grams x K
#: insertions ~ 12k of 64k bits -> ~17% fill, ~3% per-probe FP) so the
#: filter neither saturates nor trivializes: false positives OCCUR and the
#: certificate query shows them, while recall stays exactly 1 (Bloom's
#: no-false-negative guarantee).  At real scale M grows with the needle
#: set -- the filter is bits, so even 10^9 needles at 10 bits each
#: broadcast in ~1 GB.
BLOOM_M = 65536
BLOOM_K = 2


def bloom_bit(j: int, value: Column) -> Column:
    """Hash-j bit position of ``value`` (BIGINT in [0, BLOOM_M)); same
    md5-substring recipe as the CMS buckets, so DuckDB replicates it."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{j}:"), value.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def bloom_bit_sql(j: int, value_sql: str) -> str:
    """DuckDB twin of :func:`bloom_bit`."""
    return (
        f"CAST('0x' || substr(md5('bloom{j}:' || CAST({value_sql} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {BLOOM_M}"
    )


# --------------------------------------------------------------------------
# HyperLogLog (the missing member of the mergeable-summary family:
# CMS = frequencies, Bloom = membership, MinHash = similarity, HLL =
# cardinality)
# --------------------------------------------------------------------------

#: 64 registers (6 index bits off a 60-bit md5 prefix; the remaining 54
#: bits feed the leading-zero scan).  m=64 keeps the register table small
#: enough to print in test output while leaving the estimator honest
#: (alpha_64 is the standard bias constant for m=64).
HLL_M = 64
HLL_W_BITS = 54
HLL_ALPHA = 0.709

#: Linear-counting correction values 64*ln(64/V) for V=1..64, materialized
#: as LITERALS shared by the Spark builder and the DuckDB oracle -- ln never
#: executes on either engine at query time, so the small-range correction is
#: bit-exact cross-engine without a libm crossing.
import math as _math

HLL_LC_TABLE = {v: float(HLL_M) * _math.log(HLL_M / v) for v in range(1, HLL_M + 1)}


def hll_hash(value: Column) -> Column:
    """60-bit md5-prefix hash of ``value`` (nonnegative BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("hll:"), value.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")


def hll_hash_sql(value_sql: str) -> str:
    return (
        f"CAST('0x' || substr(md5('hll:' || CAST({value_sql} AS VARCHAR)), 1, 15) "
        f"AS BIGINT)"
    )


def hll_reg(value: Column) -> Column:
    """Register index in [0, HLL_M)."""
    return hll_hash(value) % HLL_M


def hll_rho(value: Column) -> Column:
    """Leading-zero rank of the remaining HLL_W_BITS bits: position of the
    leftmost 1-bit counting from 1; all-zero word -> HLL_W_BITS + 1.
    Integer-only via the binary-string length (bin() exists verbatim in
    both engines), never a float log2.  The word extraction is a bit
    shift, never float division: the 60-bit hash exceeds a double's 53-bit
    mantissa, so ``/`` then cast would corrupt low bits."""
    w = F.shiftright(hll_hash(value), 6)
    return F.when(w == 0, F.lit(HLL_W_BITS + 1)).otherwise(
        F.lit(HLL_W_BITS + 1) - F.length(F.bin(w))
    )


def hll_reg_sql(value_sql: str) -> str:
    return f"({hll_hash_sql(value_sql)} % {HLL_M})"


def hll_rho_sql(value_sql: str) -> str:
    w = f"({hll_hash_sql(value_sql)} >> 6)"
    return (
        f"(CASE WHEN {w} = 0 THEN {HLL_W_BITS + 1} "
        f"ELSE {HLL_W_BITS + 1} - length(bin({w})) END)"
    )
