"""Null/degenerate-vector hardening: the embeddings twin of the documents
and events adversarial sweeps.

Every embeddings-consuming builder must BUILD and EXECUTE over a corpus
the pristine fixture never produces: NULL embedding, empty array,
shorter- and longer-than-standard vectors (fold/zip_with length
semantics), an all-zeros vector (zero norm -> division in cosine), a
vector with extreme magnitudes, NULL label, and duplicate vec_ids.  The
claim is totality (collect without raising); degenerate VALUES are
pinned where they matter (functions/vectors.py fold conventions,
tests/test_similarity.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

_DIM = 16


def _v(seed: float) -> list[float]:
    return [float(((seed * (i + 3)) % 7) - 3) for i in range(_DIM)]


_ROWS = [
    # healthy core: enough well-formed vectors for codebooks/top-k to work
    *[(i, _v(float(i + 1)), i % 4) for i in range(24)],
    # degenerate rows
    (100, None, 0),                      # NULL embedding
    (101, [], 1),                        # empty vector
    (102, [1.0, 2.0], 2),                # too short
    (103, _v(5.0) + [1.0] * 8, 3),       # too long
    (104, [0.0] * _DIM, 0),              # zero norm
    (105, [1e30] * _DIM, 1),             # extreme magnitude
    (106, _v(7.0), None),                # NULL label
    (5, _v(6.0), 2),                     # duplicate vec_id
    (107, None, None),                   # all-null row
]

_PREFIX = "emb_"

_NAMES = sorted(n for n in all_specs() if n.startswith(_PREFIX))


@pytest.fixture(scope="module")
def degenerate_emb_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("degenerate_emb_sf")
    spark.createDataFrame(_ROWS, _SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "embeddings.parquet")
    )
    return str(out)


def test_sweep_covers_the_embeddings_surface():
    assert len(_NAMES) >= 6, _NAMES


@pytest.mark.parametrize("name", _NAMES)
def test_builder_total_on_degenerate_embeddings(spark, degenerate_emb_dir, name):
    df = all_specs()[name].builder(spark, degenerate_emb_dir)
    rows = df.collect()  # must EXECUTE, not just build the plan
    assert rows is not None
