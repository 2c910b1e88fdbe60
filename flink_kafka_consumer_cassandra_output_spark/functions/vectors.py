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
