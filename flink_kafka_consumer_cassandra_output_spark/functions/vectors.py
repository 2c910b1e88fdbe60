"""Vector math over ``array<float>`` embedding columns (north-star ops).

No Python UDFs: dot products and norms are sequential left-folds with
``F.aggregate`` over ``F.zip_with`` products -- whole-stage codegen'd, and
(verified empirically) bitwise-identical to DuckDB's ``list_reduce`` fold,
which is what lets similarity-search queries be oracle-checked exactly.

Scale posture: cosine top-k is a cross join; the brute-force form is the
correctness baseline, and ``operators/similarity.py`` layers the bucketed
(IVF-style) variant for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """NULL (not an ANSI DIVIDE_BY_ZERO error) when either norm is zero:
    a zero vector has no direction, and under the session's ANSI mode an
    unguarded division would abort the whole job on one degenerate row
    (caught by tests/test_degenerate_embeddings.py)."""
    denom = norm(a) * norm(b)
    return F.when(denom != F.lit(0.0), dot(a, b) / denom)


# ---- Spark-SQL string twins (same expression, one parse) ------------------
#
# Column-by-Column construction of these folds costs ~40-60 py4j round-trips
# each (every F.lit / lambda / operator is a socket round-trip to the JVM,
# ~0.2-0.3 ms apiece -- profiled r17: plan CONSTRUCTION was ~40% of the bench
# sweep).  The string forms below parse to the IDENTICAL Catalyst tree
# (ArrayAggregate over ZipWith with the same lambda variable names, casts and
# literals) in a single F.expr round-trip.  Oracle hashes are unaffected:
# same expression, same bits.  tests/test_vectors_expr_twins.py pins the
# Column/string forms equal on real data.

def dot_expr(a: str, b: str) -> str:
    """Spark-SQL string form of :func:`dot` over two array-typed SQL
    expressions (column names or sub-expressions)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))), 0.0D, "
        f"(acc, x) -> (acc + x))"
    )


def norm_expr(a: str) -> str:
    return f"sqrt({dot_expr(a, a)})"


def cosine_expr(a: str, b: str) -> str:
    """String form of :func:`cosine` (same zero-norm NULL guard)."""
    denom = f"({norm_expr(a)} * {norm_expr(b)})"
    return f"(CASE WHEN {denom} != 0.0D THEN ({dot_expr(a, b)} / {denom}) END)"


def cosine_with_norms(a: str, b: str, na: str, nb: str) -> Column:
    """:func:`cosine_s` with PRE-COMPUTED norm columns (r18, optimization
    guide section 1.2 "per-task work"): ``cosine_expr`` inlines THREE
    64-element folds per row -- dot(a,b), norm(a), norm(b) -- and under a
    fan-out join (IVF assign probes 16 centroids per vector, top-k probes
    every query against every candidate) each side's norm fold re-runs
    once per CANDIDATE row.  Computing ``norm_s(side)`` once per input row
    before the join and carrying the 8-byte double through it leaves one
    fold per candidate instead of three.  Bit-identical by construction:
    the norm is the same expression over the same input array, the
    product/guard/division are the same operations in the same order, so
    not a single emitted value moves (pinned by
    tests/test_vectors_expr_twins.py and the full oracle-parity suite).
    ``na``/``nb`` must be ``norm_s(a)`` / ``norm_s(b)`` of the SAME array
    expressions -- the caller's contract."""
    return F.expr(
        f"(CASE WHEN ({na} * {nb}) != 0.0D THEN "
        f"({dot_expr(a, b)} / ({na} * {nb})) END)"
    )


def dot_s(a: str, b: str) -> Column:
    return F.expr(dot_expr(a, b))


def norm_s(a: str) -> Column:
    return F.expr(norm_expr(a))


def cosine_s(a: str, b: str) -> Column:
    return F.expr(cosine_expr(a, b))


def array_lit(values) -> str:
    """A Spark-SQL double-array literal with exact round-trip: repr() of a
    Python float is the shortest digit string that parses back to the same
    IEEE double, and Spark's SQL parser reads the D-suffixed literal with
    Double.parseDouble -- so the planned literal is bit-identical to the
    F.lit() it replaces."""
    return "array(" + ", ".join(f"{float(v)!r}D" for v in values) + ")"


# ---- DuckDB oracle twins (same fold order => same bits) -------------------

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    # CASE mirrors cosine()'s zero-norm guard (DuckDB would yield inf,
    # not an error, but the twins must stay expression-for-expression)
    denom = f"({norm_sql(a)} * {norm_sql(b)})"
    return (
        f"(CASE WHEN {denom} <> 0.0 THEN ({dot_sql(a, b)} / {denom}) END)"
    )
