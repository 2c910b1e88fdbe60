"""doc_chunking boundary semantics: chunk-count arithmetic and the
reconstruction invariant (stride-prefixes + final chunk == the original
token stream) on synthesized documents sized around every boundary the
200/150 window arithmetic has.  The fixture-driven oracle parity in
test_oracle_parity.py proves cross-engine equality; this pins the
SEMANTICS against hand-computed truth, so both engines being identically
wrong would still fail.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flink_kafka_consumer_cassandra_output_spark.plans.northstar_queries import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    doc_chunking,
)

# token counts around every arithmetic boundary: sub-stride, exact stride,
# stride+1, exact window, window+1, multi-window, exact multiple, large
N_TOKENS = [1, 2, CHUNK_STRIDE - 1, CHUNK_STRIDE, CHUNK_STRIDE + 1,
            CHUNK_SIZE, CHUNK_SIZE + 1, 2 * CHUNK_STRIDE, 3 * CHUNK_STRIDE + 7,
            1000]


@pytest.fixture(scope="module")
def chunked(spark, tmp_path_factory):
    sf_dir = tmp_path_factory.mktemp("chunkfix")
    docs = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(N_TOKENS)
    ]
    spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).write.parquet(f"{sf_dir}/documents.parquet")
    out = doc_chunking(spark, str(sf_dir)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.chunk_id)
    return by_doc


def test_chunk_count_is_ceil_n_over_stride(chunked):
    for doc_id, n in enumerate(N_TOKENS):
        got = len(chunked[doc_id])
        want = math.ceil(n / CHUNK_STRIDE)
        assert got == want, f"doc {doc_id} ({n} tokens): {got} chunks != {want}"


def test_chunk_sizes_and_ids(chunked):
    for doc_id, n in enumerate(N_TOKENS):
        for k, r in enumerate(chunked[doc_id]):
            assert r.chunk_id == k
            assert r.n_tokens == min(CHUNK_SIZE, n - k * CHUNK_STRIDE)
            assert r.n_tokens == len(r.chunk_text.split(" "))


def test_reconstruction_invariant(chunked):
    """Taking each chunk's first CHUNK_STRIDE tokens (the non-overlapping
    prefix) plus the last chunk in full reassembles the exact original
    token stream -- no token lost, duplicated, or reordered."""
    for doc_id, n in enumerate(N_TOKENS):
        rows = chunked[doc_id]
        rebuilt = []
        for r in rows[:-1]:
            rebuilt.extend(r.chunk_text.split(" ")[:CHUNK_STRIDE])
        rebuilt.extend(rows[-1].chunk_text.split(" "))
        assert rebuilt == [f"t{doc_id}_{j}" for j in range(n)], (
            f"doc {doc_id} ({n} tokens) failed reconstruction"
        )
