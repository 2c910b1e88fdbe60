"""Query registry: the single source of truth behind ``__spark_entry__.py``.

Every implemented operator/query registers a builder
``(spark, sf_dir) -> DataFrame`` plus, when ANSI-SQL-expressible, a DuckDB
oracle SQL string over the same parquet tables.  The driver's correctness
gate runs both sides and compares row count + schema + order-insensitive
value hash, so every registration here is a verified-equivalence claim.

Determinism contract for oracle-checked queries (enforced by tests):
- column names and dtypes match exactly between builder output and oracle;
- float aggregates use the decimal-exact helpers in ``functions/numeric.py``;
- vector math uses the sequential folds in ``functions/vectors.py``;
- any LIMIT/top-k has a total-order tiebreak on a unique key.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}

#: Query modules loaded lazily so importing the package stays cheap.
_QUERY_MODULES = (
    "reference_queries",
    "tpch_queries",
    "events_queries",
    "northstar_queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None => rows-only check (non-SQL op)
    doc: str = ""


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    for mod in _QUERY_MODULES:
        importlib.import_module(f"{__package__}.{mod}")


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def get(name: str) -> QuerySpec:
    _load_all()
    return _REGISTRY[name]
