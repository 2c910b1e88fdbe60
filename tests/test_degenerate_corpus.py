"""Null/degenerate-text hardening (VERDICT r6 item 6).

The r6 ADVICE simhash-NULL bug class existed because the driver fixture
contains no null/empty/whitespace-only/1-token documents, so nothing
exercised the text operators' degenerate paths.  This corpus pins them:
every documents-consuming builder in the registry must BUILD and EXECUTE
(collect without raising) over a corpus of adversarial degenerate rows.
No oracle needed — the claim is totality, not values; cross-engine values
on degenerate inputs are pinned per-operator where they matter
(tests/test_properties.py, tests/test_similarity.py NULL-sketch test).

The corpus keeps a few normal documents so joins/top-k/cluster stages
have real work, and spans: NULL text, empty, whitespace-only (space/tab/
newline), 1-token, punctuation-only, digits-only, a single repeated
token, emoji/unicode (incl. an astral-plane char and combining marks),
a BOM/zero-width string, and a pathologically long single line.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

_ROWS = [
    # normal docs first: dedup/cluster/top-k stages need real pairs
    (1, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
    (2, "the quick brown fox jumps over the lazy dog again and again", "en", "web", 60),
    (3, "a completely different document about spark query engines", "en", "web", 58),
    (4, None, "en", "web", None),                      # NULL text
    (5, "", "en", "web", 0),                           # empty
    (6, "   ", "en", "web", 3),                        # spaces only
    (7, "\t\n \t", "en", "web", 4),                    # mixed whitespace
    (8, "solitary", "en", "web", 8),                   # 1 token
    (9, "!!! ... ???", "en", "web", 11),               # punctuation only
    (10, "1234567890", "en", "web", 10),               # digits only
    (11, "spam " * 50, "en", "web", 250),              # one token repeated
    (12, "café naïve éclair \U0001f600", "fr", "web", 22),
    (13, "﻿​‍", "xx", "web", 3),        # BOM + zero-widths
    (14, "x" * 5000, "en", "web", 5000),               # one pathological line
    (15, None, None, None, None),                      # all-null row
]

#: documents-consuming registry prefixes (embeddings/events/tpch excluded:
#: their inputs have no text column).
_PREFIXES = ("doc_", "mm_")

_NAMES = sorted(n for n in all_specs() if n.startswith(_PREFIXES))


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("degenerate_sf")
    spark.createDataFrame(_ROWS, _SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "documents.parquet")
    )
    return str(out)


def test_corpus_covers_every_doc_builder():
    # the sweep below must actually cover the north-star text surface;
    # if the registry grows a new prefix family this asserts loudly
    assert len(_NAMES) >= 18, _NAMES


@pytest.mark.parametrize("name", _NAMES)
def test_builder_total_on_degenerate_corpus(spark, degenerate_dir, name):
    df = all_specs()[name].builder(spark, degenerate_dir)
    rows = df.collect()  # must EXECUTE, not just build the plan
    assert rows is not None
