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

r17 execution note (the SEMANTICS above are unchanged): Spark executes
``sum(DECIMAL)`` through the non-codegen-friendly Decimal128 path, measured
~4x slower than long arithmetic on the q1 aggregate shape.  Since every
value is scale-clean, the same exact rational can be carried as integer
"cents" in a LONG and summed with plain long addition.  A single long sum
of cents would overflow int64 around 1e12 rows of 1e7-cent values, so the
per-row cents value v is split into ``lo = pmod(v, 2^20)`` and
``hi = v >> 20`` (an exact decomposition, negatives included: shiftright
is arithmetic shift = floor division, pmod is non-negative), each summed
as a long, and recombined as ``(sum(hi)*2^20 + sum(lo)) / 10^scale`` in
DECIMAL(38,0) arithmetic -- exact to ~9e12 rows PER GROUP even at the
1e-6 charge scale (hi <= 1.1e5/row, lo < 2^20/row), ~15x headroom over a
100 TB lineitem's 6e11 rows.  The final decimal division keeps >= scale
fractional digits (Spark's division-scale floor is 6), so it is exact,
and the cast to double is the same correctly-rounded conversion of the
same rational number the decimal path produced: bit-identical output,
pinned per value by tests/test_numeric_cents.py and end-to-end by the
DuckDB parity suite (the *_expr DuckDB twins below are untouched).

Cents extraction ``floor(x * 10^s + 0.5)`` is exact for scale-clean
doubles: x is the nearest double to an s-dp decimal, so x*10^s sits within
~1e-9 of an integer -- far from the .5 tie that could split floor and the
decimal cast's HALF_UP.  Verified per row over every fixture money column
(same generator at every SF) by tests/test_numeric_cents.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"

#: split point for the two-long cents sum (see module docstring)
_SHIFT = 20
_SPLIT = 1 << _SHIFT


def dec2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def cents(col: Column | str, scale: int = 2) -> Column:
    """Exact long ``col * 10^scale`` of a scale-clean double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * (10 ** scale) + F.lit(0.5))


def csum_double(v: Column, scale: int, alias: str | None = None) -> Column:
    """Split-sum of a long cents column, reassembled to the exact double.

    ``v`` must be integer units of 10^-scale; scale <= 6 keeps the decimal
    reassembly division exact (Spark's minimum division result scale).
    """
    if scale > 6:
        raise ValueError("csum_double reassembly is exact only for scale <= 6")
    lo = F.sum(F.pmod(v, F.lit(_SPLIT)))
    hi = F.sum(F.shiftright(v, _SHIFT))
    total = hi.cast("decimal(38,0)") * F.lit(_SPLIT) + lo
    out = (total / F.lit(10 ** scale)).cast("double")
    return out.alias(alias) if alias else out


def csum3_double(v: Column, scale: int, alias: str | None = None) -> Column:
    """Three-long split-sum for PRODUCTS of money cents (r18): a 2-dp x
    2-dp product in 1e-4 units reaches ~1.3e14 per row (price^2), whose
    ``v >> 20`` component (~1.2e8/row) would overflow a single long hi
    sum near 8e10 rows per group -- BELOW a 100 TB lineitem's rows per
    return flag.  Splitting into ``top = v >> 40``,
    ``mid = pmod(v >> 20, 2^20)``, ``lo = pmod(v, 2^20)`` keeps every
    per-row component <= ~2^20 (top <= ~110 for price^2), restoring the
    ~9e12-rows-per-group budget of :func:`csum_double`.  The
    decomposition is exact for negatives too (arithmetic shift = floor
    division, pmod non-negative, applied twice), the DECIMAL(38,0)
    reassembly holds ~7e25 with 12 digits to spare, and the final
    division/cast is the same correctly-rounded conversion of the same
    rational the decimal-sum path produces: bit-identical output
    (pinned by tests/test_numeric_cents.py).
    """
    if scale > 6:
        raise ValueError("csum3_double reassembly is exact only for scale <= 6")
    lo = F.sum(F.pmod(v, F.lit(_SPLIT)))
    mid = F.sum(F.pmod(F.shiftright(v, _SHIFT), F.lit(_SPLIT)))
    top = F.sum(F.shiftright(v, 2 * _SHIFT))
    total = (
        top.cast("decimal(38,0)") * F.lit(_SPLIT) + mid
    ) * F.lit(_SPLIT) + lo
    out = (total / F.lit(10 ** scale)).cast("double")
    return out.alias(alias) if alias else out


def dsum(col: Column | str, alias: str) -> Column:
    """Order-insensitive exact sum of a 2-dp money column, as double."""
    return csum_double(cents(col), 2, alias)


def davg(col: Column | str, alias: str) -> Column:
    """Exact-sum / count average (deterministic double division)."""
    return (csum_double(cents(col), 2) / F.count(F.lit(1))).alias(alias)


def dsum_over(col: Column | str, w) -> Column:
    """Windowed :func:`dsum`: exact 2-dp running/frame sum as double.

    Both long sums share ``w``'s window spec, so Catalyst plans ONE
    WindowExec (one shuffle+sort) with two cheap long accumulators in
    place of the decimal accumulator.  Frame sums are bounded by the
    partition, far below the split-sum overflow budget.
    """
    v = cents(col)
    lo = F.sum(F.pmod(v, F.lit(_SPLIT))).over(w)
    hi = F.sum(F.shiftright(v, _SHIFT)).over(w)
    return ((hi.cast("decimal(38,0)") * F.lit(_SPLIT) + lo) / F.lit(100)).cast(
        "double"
    )


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


def revenue_cents4() -> Column:
    """``l_extendedprice * (1 - l_discount)`` as exact long 1e-4 units."""
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


def drevenue(alias: str) -> Column:
    return csum_double(revenue_cents4(), 4, alias)


def drevenue_expr() -> str:
    return f"CAST(SUM({REVENUE_SQL}) AS DOUBLE)"
