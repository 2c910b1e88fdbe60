"""The Spark-SQL string twins in functions/vectors.py must compute
bit-identically to the Column forms they replace (r17 plan-construction
optimization): same fold order, same casts, same zero-norm NULL guard.
Exact equality on purpose -- any difference is a determinism bug that
would redline the DuckDB oracle gate."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.functions import vectors as V


def _frame(spark):
    rows = [
        (1, [1.5, -2.25, 3.0], [0.5, 4.0, -1.0]),
        (2, [0.1, 0.2, 0.3], [0.7, 0.11, 0.13]),  # non-representable decimals
        (3, [0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),    # zero norm -> NULL cosine
        (4, None, [1.0, 1.0, 1.0]),               # NULL vector
        (5, [1e300, 1e-300, -1e300], [1e300, 1.0, 1e300]),  # extreme exponents
    ]
    return spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )


def test_dot_norm_cosine_string_twins_bit_identical(spark):
    df = _frame(spark)
    got = df.select(
        "id",
        V.dot(F.col("a"), F.col("b")).alias("dot_col"),
        V.dot_s("a", "b").alias("dot_str"),
        V.norm(F.col("a")).alias("norm_col"),
        V.norm_s("a").alias("norm_str"),
        V.cosine(F.col("a"), F.col("b")).alias("cos_col"),
        V.cosine_s("a", "b").alias("cos_str"),
    ).collect()
    for r in got:
        for base in ("dot", "norm", "cos"):
            c, s = r[f"{base}_col"], r[f"{base}_str"]
            if c is None or s is None:
                assert c is None and s is None, (r["id"], base, c, s)
            else:
                assert math.isnan(c) == math.isnan(s), (r["id"], base, c, s)
                if not math.isnan(c):
                    # bit-identical, not approximately equal
                    assert c.hex() == s.hex(), (r["id"], base, c, s)


def test_array_lit_round_trips_exactly(spark):
    vals = [1.0, -1.0, 0.1, 1e-300, 123456789.123456789, float(2**53 - 1)]
    got = spark.range(1).select(
        F.expr(V.array_lit(vals)).alias("arr")
    ).collect()[0]["arr"]
    assert [v.hex() for v in got] == [v.hex() for v in vals]
