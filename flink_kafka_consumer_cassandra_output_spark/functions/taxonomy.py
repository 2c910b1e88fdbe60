"""Message-type taxonomy (reference operator O22).

The reference ships an 18-value enum mapping message categories to 1-2 char
codes (/root/reference/src/main/java/com/cansever/consumer/message/MessageType.java:7-24)
-- dead code there (never referenced), but part of the declared surface, so
the engine exposes it as a first-class classification function.  Codes are
kept verbatim, including the PHOTO/IMAGE -> "P" and CAPS_MEME/CAPS -> "M"
aliases.

Two implementations, same semantics:

- :func:`classify` -- a ``CASE WHEN`` chain (whole-stage codegen, zero
  shuffle; the right choice in the hot path at 100 TB), and
- :func:`lookup_df` -- an 18-row dimension DataFrame for broadcast joins
  (the right choice when the taxonomy grows or becomes data-driven).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Verbatim from MessageType.java:7-24 (enum name -> wire code).
MESSAGE_TYPE_CODES: dict[str, str] = {
    "TEXT": "T",
    "BUZZ": "B",
    "PHOTO": "P",
    "IMAGE": "P",  # alias, MessageType.java:10
    "VIDEO": "V",
    "AUDIO": "A",
    "LOCATION": "L",
    "CONTACT": "C",
    "STICKER": "S",
    "GIF": "G",
    "CAPS_MEME": "M",
    "CAPS": "M",  # alias, MessageType.java:17
    "REGISTER": "R",
    "MUCROOM_JOIN": "J",
    "MESSAGE_WITHOUT_PREVIEW": "NP",  # MessageType.java:21
    "SECRET_MESSAGE": "E",  # MessageType.java:22
    "INCOMING_CALL": "IC",
    "MISSED_CALL": "MC",
}


def classify(type_name: Column) -> Column:
    """Map a type-name column to its wire code via a codegen'd CASE chain."""
    expr = None
    for name, code in MESSAGE_TYPE_CODES.items():
        cond = type_name == F.lit(name)
        expr = F.when(cond, code) if expr is None else expr.when(cond, code)
    return expr.otherwise(F.lit(None))


def lookup_df(spark: SparkSession) -> DataFrame:
    """The taxonomy as an 18-row dimension table (broadcast-join friendly).

    Built from a SQL VALUES literal, not ``createDataFrame``: the literal
    stays JVM-side (no Python->Arrow->JVM hop, which costs seconds of
    first-use warm-up in a fresh session)."""
    vals = ", ".join(f"('{k}', '{v}')" for k, v in MESSAGE_TYPE_CODES.items())
    return spark.sql(f"SELECT * FROM (VALUES {vals}) AS t(type_name, type_code)")


def classify_case_sql(col_sql: str) -> str:
    """The same mapping as ANSI CASE SQL (for DuckDB oracle parity)."""
    whens = "\n".join(
        f"  WHEN {col_sql} = '{name}' THEN '{code}'" for name, code in MESSAGE_TYPE_CODES.items()
    )
    return f"CASE\n{whens}\n  ELSE NULL\nEND"
