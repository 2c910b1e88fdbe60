"""Scaling probe for the embedding/ANN suite (VERDICT r6 item 3).

Usage: python tools/scale_probe_emb.py <k>   (one fresh JVM per k;
       run k = 1 2 4 8 as separate invocations -- SCALING.md explains
       why a single-session sweep self-contaminates)

The sf0.1 embeddings table (2,000 x 64-dim) is replicated k times with
vec_id re-keyed into per-replica id spaces AND each replica's vectors
passed through a per-replica deterministic sign-flip (an orthogonal
transform: within-replica cosines are preserved EXACTLY, cross-replica
cosines decorrelate), so each replica is a disjoint neighborhood copy of
the fixture's similarity structure.

Two probe shapes, because search cost factors as |queries| x per-query
touch set:

- CORPUS scaling (table 5a): the fixture's 10-query set held fixed while
  the corpus grows k x.  Brute-force touches the whole corpus (cost ~k),
  and fixed-codebook IVF / fixed-plane LSH probe buckets that grow ~k, so
  every per-query row count stays 50 and wall-clock must grow ~k or
  better.  Superlinear growth here is a broadcast that stopped
  broadcasting or a bucket join gone cross-product.
- QUERY-VOLUME scaling (table 5b): every replica contributes its own 10
  queries (k x 10 total) and the Arrow brute-force search is bucketed by
  replica (queries join ONLY their replica's corpus chunk via the rep
  key, the same routing-key pattern emb_top_similar_pairs uses for
  label buckets).  Work and result rows both grow exactly k (k x 50
  rows); this is the shape a sharded 100 TB ANN service actually runs.

Codebook-growth note (SCALING.md): fixed C=16 makes IVF per-query cost
grow with corpus (bucket size ~N/C).  Holding bucket size constant needs
C ~ N (quantizer assign cost N*C) -- the standard compromise is
C ~ sqrt(N) (both bucket size and assign cost grow ~sqrt(N)); the probe
prints the per-bucket candidate count so the effect is visible.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402

from flink_kafka_consumer_cassandra_output_spark.operators import similarity as SIM  # noqa: E402
from flink_kafka_consumer_cassandra_output_spark.session import local_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("SPARK_GRAFT_PROBE_REPEATS", "3"))
ID_SPACE = 100_000_000


def build_probe_dir(spark: SparkSession, k: int) -> str:
    out = f"/tmp/sfprobe_emb_k{k}"
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    reps = spark.range(k).select(F.col("id").alias("rep"))
    e = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    # Per-replica sign flip: bit j of replica r flips iff
    # xxhash64(r, j) is odd.  Orthogonal per replica -> within-replica
    # cosine structure identical to the fixture's.
    flipped = F.zip_with(
        F.col("embedding"),
        F.sequence(F.lit(0), F.size("embedding") - 1),
        lambda x, j: F.when(
            F.pmod(F.xxhash64(F.col("rep"), j), F.lit(2)) == 1, -x
        ).otherwise(x),
    )
    (
        e.crossJoin(F.broadcast(reps))
        .withColumn("vec_id", F.col("rep") * ID_SPACE + F.col("vec_id"))
        .withColumn("embedding", flipped)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.parquet(os.path.join(out, "embeddings.parquet"))
    )
    return out


def _corpus(spark: SparkSession, probe_dir: str) -> DataFrame:
    e = spark.read.parquet(os.path.join(probe_dir, "embeddings.parquet"))
    return e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda v: v.cast("double")).alias("embedding"),
    )


def _fixed_queries(corpus: DataFrame) -> DataFrame:
    """The fixture's 10-query set (replica 0 only) -- table 5a."""
    return corpus.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_emb")
    )


def probe_arrow_fixed(spark: SparkSession, probe_dir: str) -> DataFrame:
    c = _corpus(spark, probe_dir)
    return SIM.brute_force_topk_arrow(_fixed_queries(c), c, k=5)


def probe_ivf_fixed(spark: SparkSession, probe_dir: str) -> DataFrame:
    c = _corpus(spark, probe_dir)
    cent = SIM.ivf_train(c, k=16)
    assigned = SIM.ivf_assign(c, cent)
    return SIM.ivf_topk(_fixed_queries(c), assigned, cent, k=5, nprobe=1)


def probe_lsh_fixed(spark: SparkSession, probe_dir: str) -> DataFrame:
    # Same assembly as the registered emb_ann_lsh builder (planes = the
    # corpus vectors at ids 16..19, 4 bits, multi-probe all 1-bit flips),
    # minus the loud plane-count guard the probe corpus satisfies by
    # construction.
    n_planes = 4
    c = _corpus(spark, probe_dir)
    planes_row = (
        c.filter((F.col("vec_id") >= 16) & (F.col("vec_id") < 20))
        .agg(F.array_sort(F.collect_list(F.struct("vec_id", "embedding"))).alias("ps"))
        .select(F.transform("ps", lambda s: s["embedding"]).alias("planes"))
    )
    coded = c.crossJoin(F.broadcast(planes_row)).select(
        "vec_id",
        "embedding",
        SIM.lsh_sign_bucket(F.col("embedding"), F.col("planes"), n_planes).alias("bucket"),
    )
    q = coded.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
        SIM.lsh_multiprobe_codes(F.col("bucket"), n_planes).alias("probe_codes"),
    )
    probes = q.select("query_id", "query_emb", F.explode("probe_codes").alias("bucket"))
    cands = probes.join(coded, "bucket").filter(F.col("query_id") != F.col("vec_id"))
    cos = SIM.vectors.cosine(F.col("query_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


def probe_arrow_sharded(spark: SparkSession, probe_dir: str) -> DataFrame:
    """Table 5b: k x 10 queries, search bucketed by replica (rep key)."""
    c = _corpus(spark, probe_dir).withColumn(
        "rep", (F.col("vec_id") / ID_SPACE).cast("long")
    )
    q = c.filter(F.col("vec_id") % ID_SPACE < 10).select(
        F.col("rep").alias("q_rep"),
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_emb"),
    )
    # Replica-bucketed brute force: candidates come from the replica's own
    # chunk only (equi-join on rep), mirroring emb_top_similar_pairs'
    # label-bucket routing; cosine + per-query top-5 as usual.
    cands = q.join(c, q["q_rep"] == c["rep"]).filter(
        F.col("query_id") != F.col("vec_id")
    )
    cos = SIM.vectors.cosine(F.col("query_emb"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cands.select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


def probe_semdedup_sharded(spark: SparkSession, probe_dir: str) -> DataFrame:
    """Table 5b: replica-sharded SemDeDup (emb_semantic_dedup's scale
    form).  Per-replica seed codebooks (each replica's vectors 0..15),
    assignment via an equi-join on the rep key, quadratic verify within
    (rep, bucket).  The sign-flip transform preserves within-replica
    cosines AND bucket assignments (flipping both vector and centroid
    cancels), so the duplicate-pair count must be exactly k x replica
    0's -- and the verify join stays equi on (rep, bucket), never
    all-pairs."""
    c = _corpus(spark, probe_dir).withColumn(
        "rep", (F.col("vec_id") / ID_SPACE).cast("long")
    )
    cent = c.filter(F.col("vec_id") % ID_SPACE < 16).select(
        F.col("rep").alias("c_rep"),
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
    )
    j = c.join(cent, F.col("rep") == F.col("c_rep"))
    cos = SIM.vectors.cosine(F.col("embedding"), F.col("cent_emb"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cent_id"))
    assigned = (
        j.select("rep", "vec_id", "embedding", "cent_id", cos.alias("cos_c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("rep", "vec_id", "embedding", F.col("cent_id").alias("bucket"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    x = assigned.select(
        F.col("rep").alias("r_a"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("bucket").alias("b_a"),
    )
    y = assigned.select(
        F.col("rep").alias("r_b"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("b_b"),
    )
    return (
        x.join(
            y,
            (F.col("r_a") == F.col("r_b"))
            & (F.col("b_a") == F.col("b_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(SIM.vectors.cosine(F.col("emb_a"), F.col("emb_b")) >= 0.35)
        .select("id_a", "id_b")
    )


_SKEWED_CACHE: dict = {}


def _skewed_corpus(spark: SparkSession, probe_dir: str) -> DataFrame:
    """Each replica's corpus DOUBLED with exact copies of its vector 0:
    one IVF bucket per replica ends up holding more than half that
    replica's rows -- the mass-duplicated-boilerplate pathology the
    SemDeDup skew ceiling names.  Checkpointed so probe repeats time the
    dedup, not the corpus build."""
    if probe_dir in _SKEWED_CACHE:
        return _SKEWED_CACHE[probe_dir]
    c = _corpus(spark, probe_dir).withColumn(
        "rep", (F.col("vec_id") / ID_SPACE).cast("long")
    )
    n_per_rep = c.filter(F.col("rep") == 0).count()
    seed = c.filter(F.col("vec_id") % ID_SPACE == 0)
    copies = seed.crossJoin(
        F.broadcast(spark.range(n_per_rep).select(F.col("id").alias("i")))
    ).select(
        (F.col("rep") * ID_SPACE + F.lit(10_000_000) + F.col("i")).alias("vec_id"),
        "embedding",
        "rep",
    )
    out = (
        c.select("vec_id", "embedding", "rep")
        .unionByName(copies)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )
    _SKEWED_CACHE[probe_dir] = out
    return out


def _skewed_assigned(spark: SparkSession, probe_dir: str) -> DataFrame:
    """Per-replica seed-codebook assignment of the skewed corpus (same
    assignment machinery as probe_semdedup_sharded)."""
    c = _skewed_corpus(spark, probe_dir)
    cent = c.filter(F.col("vec_id") % ID_SPACE < 16).select(
        F.col("rep").alias("c_rep"),
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("cent_emb"),
    )
    j = c.join(cent, F.col("rep") == F.col("c_rep"))
    cos = SIM.vectors.cosine(F.col("embedding"), F.col("cent_emb"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_c"), F.asc("cent_id"))
    return (
        j.select("rep", "vec_id", "embedding", "cent_id", cos.alias("cos_c"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("rep", "vec_id", "embedding", F.col("cent_id").alias("bucket"))
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint(eager=True)
    )


def _pairs_within(assigned: DataFrame) -> DataFrame:
    x = assigned.select(
        F.col("rep").alias("r_a"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("bucket").alias("b_a"),
    )
    y = assigned.select(
        F.col("rep").alias("r_b"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("b_b"),
    )
    return (
        x.join(
            y,
            (F.col("r_a") == F.col("r_b"))
            & (F.col("b_a") == F.col("b_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .filter(SIM.vectors.cosine(F.col("emb_a"), F.col("emb_b")) >= 0.35)
        .select("id_a", "id_b")
    )


def probe_semdedup_skewed_uncompressed(spark: SparkSession, probe_dir: str) -> DataFrame:
    """Table 5c skew CONTRAST row: the pre-mitigation all-pairs verify on
    the skewed corpus.  The hot bucket holds >n_per_rep identical rows,
    so its task does a quadratic block of ~n^2/2 cosine folds -- this row
    is expected to blow past the unskewed band and NOT flatten with k."""
    return _pairs_within(_skewed_assigned(spark, probe_dir))


def probe_semdedup_skewed_compressed(spark: SparkSession, probe_dir: str) -> DataFrame:
    """Table 5c skew row: emb_semantic_dedup's r8 fingerprint-first
    compression on the skewed corpus.  Identical-embedding groups
    collapse to their min-id rep before the (rep, bucket) verify, so the
    hot bucket contributes ~1 rep and sec/k stays in the unskewed row's
    band; the member-level dup_of expansion (exact, see the registered
    query's docstring) is included in the timed pipeline."""
    assigned = _skewed_assigned(spark, probe_dir)
    grp = Window.partitionBy("rep", "embedding")
    with_rep = assigned.withColumn("rep_id", F.min("vec_id").over(grp))
    members = with_rep.select("vec_id", "rep_id")
    reps = with_rep.filter(F.col("vec_id") == F.col("rep_id")).select(
        "rep", "vec_id", "embedding", "bucket"
    )
    rep_pairs = _pairs_within(reps)
    sim = rep_pairs.select(
        F.col("id_a").alias("ctr"), F.col("id_b").alias("partner")
    ).unionByName(
        rep_pairs.select(F.col("id_b").alias("ctr"), F.col("id_a").alias("partner"))
    )
    cand = (
        members.join(sim, members["rep_id"] == sim["ctr"])
        .filter(F.col("partner") < F.col("vec_id"))
        .select("vec_id", F.col("partner").alias("cand"))
    )
    own = members.filter(F.col("vec_id") != F.col("rep_id")).select(
        "vec_id", F.col("rep_id").alias("cand")
    )
    return cand.unionByName(own).groupBy("vec_id").agg(F.min("cand").alias("dup_min"))


PROBES = (
    ("5a", "cosine_topk_arrow_fixedq", probe_arrow_fixed),
    ("5a", "ann_ivf_trained_fixedq", probe_ivf_fixed),
    ("5a", "ann_lsh_fixedq", probe_lsh_fixed),
    ("5b", "cosine_topk_replica_sharded", probe_arrow_sharded),
    ("5b", "semdedup_replica_sharded", probe_semdedup_sharded),
    ("5c-skew", "semdedup_skewed_uncompressed", probe_semdedup_skewed_uncompressed),
    ("5c-skew", "semdedup_skewed_compressed", probe_semdedup_skewed_compressed),
)


def main() -> None:
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    k = int(sys.argv[1])
    spark = local_session(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    probe_dir = build_probe_dir(spark, k)
    n = spark.read.parquet(os.path.join(probe_dir, "embeddings.parquet")).count()
    print("| table | k | corpus | probe | result rows | seconds | sec/k |")
    print("|---|---|---|---|---|---|---|")
    for table, name, fn in PROBES:
        if name == "semdedup_skewed_uncompressed" and k > 4:
            # the quadratic contrast row is established at k=1,2,4; at k=8
            # it alone would cost ~10 min of probe wall-clock for no new
            # information (its sec/k GROWS -- that is the point)
            print(f"| {table} | {k} | {n} | {name} | - | skipped | - |")
            continue
        fn(spark, probe_dir).write.format("noop").mode("overwrite").save()  # warm-up
        best = float("inf")
        for _ in range(REPEATS):
            t0 = time.monotonic()
            fn(spark, probe_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        rows = fn(spark, probe_dir).count()
        print(
            f"| {table} | {k} | {n} | {name} | {rows} | {best:.2f} | {best / k:.2f} |"
        )
    # codebook-growth visibility: mean probed-bucket size at C=16 vs C=16k
    c = _corpus(spark, probe_dir)
    for C in (16, 16 * k):
        cent = SIM.ivf_train(c, k=C)
        sizes = (
            SIM.ivf_assign(c, cent)
            .groupBy("bucket")
            .count()
            .agg(F.avg("count").alias("avg"))
            .first()[0]
        )
        print(f"| note | {k} | {n} | ivf_avg_bucket_size_C{C} | {sizes:.0f} | - | - |")
    shutil.rmtree(probe_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
