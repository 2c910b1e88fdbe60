"""Hand-computed truth for the curation query family.

The DuckDB oracles in plans/curation_queries.py are generated from the
same constants as the Spark builders, so oracle parity alone cannot catch
a shared specification bug.  This corpus pins the SEMANTICS by hand:
every expected number below was computed on paper from the docstrings'
definitions, not by running either engine.
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

# doc 1: "a b a b a b" -> 6 words, bigrams: [a b, b a, a b, b a, a b]
#   n_bigrams=5, distinct=2, dup_frac=3/5, top bigram "a b" x3 -> top=3/5
# doc 2: "x y z w v"  -> 5 words, 4 bigrams all distinct, dup=0, top=1/4
# doc 3: 5 tokens shared with doc 4's interior -> one shared 5-gram passage
# doc 4: doc 3's passage embedded with one token either side
# doc 5: single token (zero bigrams; passage-less)
_ROWS = [
    (1, "a b a b a b", "en", "s", 11),
    (2, "x y z w v", "en", "s", 9),
    (3, "p q r s t", "en", "s", 9),
    (4, "u p q r s t u", "en", "s", 13),
    (5, "solo", "en", "s", 4),
]


@pytest.fixture(scope="module")
def truth_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("curation_truth_sf")
    spark.createDataFrame(_ROWS, _SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "documents.parquet")
    )
    return str(out)


def _rows(spark, name, sf_dir):
    return all_specs()[name].builder(spark, sf_dir).collect()


def test_gopher_bigram_fractions_by_hand(spark, truth_dir):
    got = {r.doc_id: r for r in _rows(spark, "doc_gopher_quality_rules", truth_dir)}
    assert got[1].n_words == 6
    assert got[1].dup_bigram_frac == 3 / 5
    assert got[1].top_bigram_frac == 3 / 5
    assert got[2].dup_bigram_frac == 0.0
    assert got[2].top_bigram_frac == 1 / 4
    assert got[5].dup_bigram_frac == 0.0  # zero bigrams -> defined 0.0
    assert got[5].top_bigram_frac == 0.0
    # mean word length: doc 2 = (1+1+1+1+1)/5 = 1.0
    assert got[2].mean_word_len == 1.0
    # every doc fails the word-count floor (20) -> keep all False
    assert not any(r.keep for r in got.values())


def test_lm_rarity_frequencies_by_hand(spark, truth_dir):
    # corpus unigram counts: a3 b3 x1 y1 z1 w1 v1 p2 q2 r2 s2 t2 u2 solo1
    got = {r.doc_id: r for r in _rows(spark, "doc_lm_rarity", truth_dir)}
    assert got[1].n_tokens == 6 and got[1].avg_tok_freq == 3.0  # all a/b
    assert got[2].avg_tok_freq == 1.0                           # all unique
    assert got[3].avg_tok_freq == 2.0                           # all shared w/ doc 4
    assert got[4].avg_tok_freq == 2.0                           # p q r s t u u p...
    assert got[5].avg_tok_freq == 1.0
    # terciles over 5 docs ordered by (score, doc_id):
    # (1.0,2) (1.0,5) (2.0,3) (2.0,4) (3.0,1); r*3<=5 -> rank1 tail,
    # r*3<=10 -> ranks 2,3 middle, ranks 4,5 head
    assert got[2].bucket == "tail"
    assert got[5].bucket == "middle" and got[3].bucket == "middle"
    assert got[4].bucket == "head" and got[1].bucket == "head"


def test_repeated_passages_by_hand(spark, truth_dir):
    rows = _rows(spark, "doc_repeated_passages", truth_dir)
    # exactly one 5-gram appears in >= 2 docs: "p q r s t" (docs 3 and 4)
    assert len(rows) == 1
    r = rows[0]
    assert r.passage == "p q r s t"
    assert r.n_docs == 2
    assert r.n_occurrences == 2


def test_bm25_zero_match_queries_emit_nothing(spark, truth_dir):
    # no fixture vocab term appears in this corpus -> all scores 0 -> empty
    assert _rows(spark, "doc_bm25_topk", truth_dir) == []


def test_bloom_decontamination_no_false_negatives(spark, sf_dir):
    """The Bloom guarantee, executable: every gram truly in the needle set
    MUST bloom-hit, so per doc n_bloom_hits >= n_true_hits with zero
    exceptions -- and every true-contaminated doc appears in the output.
    (False positives are allowed and expected; the certificate columns
    make them visible rather than hiding them.)"""
    from flink_kafka_consumer_cassandra_output_spark.plans import all_specs

    rows = all_specs()["doc_decontamination_bloom"].builder(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.n_bloom_hits >= r.n_true_hits for r in rows), (
        "a truly-present gram failed its Bloom probe: impossible unless "
        "the builder and filter hash differently"
    )
    # needle sources self-match: each doc_id % 100 == 7 doc contains its
    # own grams, so it must be reported with n_true_hits > 0
    srcs = {r.doc_id for r in rows if r.n_true_hits > 0}
    assert any(d % 100 == 7 for d in srcs)


def test_char_kl_gibberish_by_hand(spark, tmp_path_factory):
    """A single-character flood must rank first with a hand-computable KL:
    its only term is (c/L)*(((ln c - ln L) - ln C) + ln T) with c = L, so
    kl = (ln L - ln L - ln C) + ln T reproduced op-for-op in Python (libm
    on both sides)."""
    import math

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "a normal english sentence with usual letters",
        3: "z" * 20,
    }
    out = tmp_path_factory.mktemp("char_kl_truth_sf")
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()], _SCHEMA
    ).coalesce(1).write.parquet(os.path.join(str(out), "documents.parquet"))

    rows = {
        r["doc_id"]: r
        for r in _rows(spark, "doc_char_kl_gibberish", str(out))
    }
    assert set(rows) == {1, 2, 3}
    flood = rows[3]
    assert flood["n_chars"] == 20 and flood["distinct_chars"] == 1
    ranked = sorted(rows.values(), key=lambda r: -r["kl_nats"])
    assert ranked[0]["doc_id"] == 3, "the flood must be the top outlier"
    # hand-computed KL, same expression tree and libm ln as the engine
    total = sum(len(t) for t in texts.values())
    c_z = float(sum(t.count("z") for t in texts.values()))  # incl. "lazy"
    expect = 1.0 * (
        ((math.log(20.0) - math.log(20.0)) - math.log(c_z)) + math.log(float(total))
    )
    assert flood["kl_nats"] == expect


def test_dsir_importance_by_hand(spark, tmp_path_factory):
    """DSIR log-weights on a corpus small enough to hand-derive the
    direction: target (en) docs repeat bigram 'aa bb' while non-target
    docs repeat 'xx yy', so the en-favored bucket's log-ratio is positive
    and each doc's weight has the sign of its language -- plus the
    no-bigram doc pins the zero-feature path (weight exactly 0.0,
    n_features 0, not selected)."""
    import os

    out = tmp_path_factory.mktemp("dsir_truth_sf")
    rows = [
        (1, "aa bb aa bb aa bb", "en", "s", 17),
        (2, "aa bb aa bb", "en", "s", 11),
        (3, "xx yy xx yy xx yy", "de", "s", 17),
        (4, "xx yy xx yy", "fr", "s", 11),
        (5, "solo", "en", "s", 4),
    ]
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        os.path.join(str(out), "documents.parquet")
    )
    got = {r.doc_id: r for r in _rows(spark, "doc_dsir_importance", str(out))}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[5].n_features == 0 and got[5].log_weight == 0.0
    assert not got[5].selected
    assert got[1].log_weight > 0 and got[2].log_weight > 0
    assert got[3].log_weight < 0 and got[4].log_weight < 0
    assert got[1].selected and not got[3].selected
    # more repeats of the en-favored feature -> strictly larger weight
    assert got[1].log_weight > got[2].log_weight
    assert got[3].log_weight < got[4].log_weight


def test_dsir_separates_target_language_on_fixture(spark, sf_dir):
    """On the real sf0.001 corpus the estimator must separate the target
    class in aggregate: mean log-weight of en docs above non-en."""
    from pyspark.sql import functions as F

    res = all_specs()["doc_dsir_importance"].builder(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang"
    )
    agg = (
        res.join(docs, "doc_id")
        .groupBy((F.col("lang") == "en").alias("is_en"))
        .agg(F.avg("log_weight").alias("mw"))
        .collect()
    )
    by = {r.is_en: r.mw for r in agg}
    assert by[True] > by[False]
