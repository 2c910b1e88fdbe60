"""Cross-engine-deterministic numeric aggregation helpers.

Floating-point SUM/AVG are order-dependent; Spark's partial aggregation and
DuckDB's vectorized execution add in different orders, so a raw
``sum(double)`` differs in the last bits between engines -- enough to break
an exact value-hash comparison, and enough to make repeated Spark runs
disagree with themselves under AQE.

The fixture money columns are 2-decimal-clean doubles (verified: every value
round-trips ``double -> DECIMAL(18,2) -> double`` exactly at sf0.01/sf0.1),
so casting to DECIMAL(18,2) is lossless and the decimal arithmetic is exact
-- identical regardless of addition order, in Spark and DuckDB alike.  The
pattern, applied on BOTH sides of every oracle-checked aggregate:

    Spark : F.sum(col.cast("decimal(18,2)")).cast("double")
    DuckDB: CAST(SUM(CAST(col AS DECIMAL(18,2))) AS DOUBLE)

This is also the *right* semantics for money at 100 TB scale: decimal sums
don't accumulate float error across a thousand partial aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact sum of a 2-dp money column, as double."""
    return F.sum(dec2(col)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count average (deterministic double division)."""
    return (F.sum(dec2(col)).cast("double") / F.count(F.lit(1))).alias(alias)


def dsum_expr(col_sql: str) -> str:
    """DuckDB-side twin of :func:`dsum` (embed in oracle SQL)."""
    return f"CAST(SUM(CAST({col_sql} AS DECIMAL(18,2))) AS DOUBLE)"


def davg_expr(col_sql: str) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"(CAST(SUM(CAST({col_sql} AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))"


def dec_mul(a: Column | str, b: Column | str) -> Column:
    """Exact product of two 2-dp columns (DECIMAL multiply, scale 4)."""
    return dec2(a) * dec2(b)


def revenue_col() -> Column:
    """TPC-H style ``l_extendedprice * (1 - l_discount)`` with exact decimal
    arithmetic; sum then cast to double for the final result."""
    return dec2("l_extendedprice") * (F.lit(1).cast(DEC) - dec2("l_discount"))


REVENUE_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"


def drevenue(alias: str) -> Column:
    return F.sum(revenue_col()).cast("double").alias(alias)


def drevenue_expr() -> str:
    return f"CAST(SUM({REVENUE_SQL}) AS DOUBLE)"
