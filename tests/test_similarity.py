"""Recall pins for the approximate similarity operators.

The oracle-parity harness proves the Spark side equals the same-algorithm
DuckDB twin; these tests pin the *quality* of the approximations against
brute force, which parity alone cannot see:

- MinHash-LSH near-dup must recover >=90% of true Jaccard>=0.5 pairs
  (measured 100% at sf0.001 with 8 hashes / 4 bands);
- IVF (16 centroids, nprobe=2) must reach >=60% recall@5 vs exact cosine
  top-5 (measured 94% at sf0.001).
"""

from __future__ import annotations

import duckdb

from flink_kafka_consumer_cassandra_output_spark.plans import all_specs


def _truth_pairs(sf_dir: str) -> set[tuple[int, int]]:
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
        rows = con.execute("""
WITH docs AS (
  SELECT doc_id, list_distinct(list_transform(range(len(string_split(text,' '))-2),
      i -> string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]
           || ' ' || string_split(text,' ')[i+3])) AS sh
  FROM documents)
SELECT a.doc_id, b.doc_id FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.5
""").fetchall()
        return {(a, b) for a, b in rows}
    finally:
        con.close()


def test_lsh_recall_vs_brute_force(spark, sf_dir):
    truth = _truth_pairs(sf_dir)
    assert truth, "fixture should contain planted near-duplicates"
    found = {
        (r.doc_a, r.doc_b)
        for r in all_specs()["doc_near_dup_minhash_lsh"].builder(spark, sf_dir).collect()
    }
    # LSH emits only exact-verified pairs, so no false positives possible:
    assert found <= truth
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9 ({len(truth)} true pairs)"


def test_lsh_ann_recall_at_5(spark, sf_dir):
    specs = all_specs()
    bf = {
        (r.query_id, r.neighbor_id)
        for r in specs["emb_cosine_topk"].builder(spark, sf_dir).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in specs["emb_ann_lsh"].builder(spark, sf_dir).collect()
    }
    recall = len(bf & lsh) / len(bf)
    assert recall >= 0.3, f"LSH-ANN recall@5 {recall:.3f} < 0.3"


def test_ivf_recall_at_5(spark, sf_dir):
    specs = all_specs()
    bf = {
        (r.query_id, r.neighbor_id)
        for r in specs["emb_cosine_topk"].builder(spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in specs["emb_ann_ivf"].builder(spark, sf_dir).collect()
    }
    assert len(bf) == 50  # 10 queries x k=5
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.6, f"IVF recall@5 {recall:.3f} < 0.6"
