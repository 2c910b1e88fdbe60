"""Plan-truncating materialization, mode-selected by environment.

Several pipelines materialize an intermediate that feeds multiple
downstream subtrees (Spark shares no common subplans, so an
unmaterialized frame recomputes once per consumer -- and a self-joined
one doubles its lineage).  Three modes, one call site:

- default: ``localCheckpoint(eager=True)`` -- executor-local blocks,
  plan truncated, AQE stays live downstream.  Right for local[n] and for
  clusters without preemption.
- ``SPARK_GRAFT_STAGING_DIR=<dir>``: write the frame to a parquet
  staging table under <dir> and read it back.  Same plan-truncation
  effect, executor-loss-safe (local checkpoint blocks die with their
  executor under dynamic allocation/preemption), and the write doubles
  as a restartable pipeline boundary.  This is the 100 TB-cluster mode;
  ``tests/test_staging_mode.py`` pins result equality against the
  default so the documented equivalence is executable, not prose.
- ``SPARK_GRAFT_SCHEMA_ONLY=1``: no materialization at all (lazy,
  schema-identical plan) so schema-only consumers -- the registry lint's
  output-type sweep, plan dumps -- never pay for build-time jobs.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame

from .config import schema_only_builds

STAGING_ENV = "SPARK_GRAFT_STAGING_DIR"


def materialize(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once per the mode above; see module docstring.

    Staging tables land under ``<dir>/<applicationId>/stage-<uuid>``: the
    per-application scoping is the reclamation contract.  Stage tables are
    plan intermediates, never durable outputs, so everything under an
    application's subdirectory is garbage the moment that application
    ends -- ``cleanup_staging(spark)`` deletes the CURRENT app's subdir
    (call it from job teardown), and a janitor can safely remove any
    subdir whose application id is no longer running.  Without the
    scoping, staged intermediates from repeated builder invocations would
    accumulate unboundedly with no safe deletion rule.
    """
    if schema_only_builds():
        return df
    staging = os.environ.get(STAGING_ENV, "")
    if staging:
        app_dir = os.path.join(staging, df.sparkSession.sparkContext.applicationId)
        path = os.path.join(app_dir, f"stage-{uuid.uuid4().hex}")
        df.write.parquet(path)
        staged = df.sparkSession.read.parquet(path)
        # Tag the frame with its stage path so iterative pipelines can
        # reclaim a dead round's table mid-run via drop_stage() instead
        # of holding max_iters rounds of files until cleanup_staging.
        staged._spark_graft_stage_path = path
        return staged
    return df.localCheckpoint(eager=True)


def materialize_many(dfs: list[DataFrame]) -> list[DataFrame]:
    """Materialize INDEPENDENT frames concurrently (optimization guide
    section 2.6, "overlap independent jobs"): each eager localCheckpoint /
    staging write is a blocking action, so a builder with several
    independent intermediates otherwise pays their job latencies in
    SERIES.  Spark's scheduler runs concurrent jobs fine (FIFO back-fill);
    a small pool is enough and bounds driver-side thread fan-out.  Frames
    must not depend on each other -- callers sequence dependent WAVES.
    Results are positionally aligned with the input.  Schema-only mode
    degrades to the lazy no-op exactly like :func:`materialize`."""
    if schema_only_builds() or len(dfs) <= 1:
        return [materialize(df) for df in dfs]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(4, len(dfs))) as pool:
        return list(pool.map(materialize, dfs))


#: (applicationId, tag, staging dir, schema-only?) -> materialized frame.
#: Keyed so a mode flip (tests toggle STAGING_ENV mid-session) or a new
#: session never sees a stale entry; dead-application entries are inert
#: DataFrame handles, not held executor memory.
_SESSION_MEMO: dict[tuple, DataFrame] = {}

#: tag -> wall seconds spent building+materializing the memoized frame.
#: bench.py reads this to bill shared stages honestly: min-of-N repeat
#: timing would otherwise drop the one-time build from the sweep total.
#: SELF time only: a memo build that triggers a nested memo build (the CC
#: label stage builds on the memoized pair table) records its own wall
#: time MINUS the child's, so summing the dict never double-bills.
SESSION_MEMO_BUILD_SECONDS: dict[str, float] = {}

#: Stack of child-build-time accumulators for nested session_memo builds.
_MEMO_CHILD_SECONDS: list[float] = []


def session_memo(spark, tag: str, build) -> DataFrame:
    """Materialize-once-per-session for an intermediate SHARED ACROSS
    registered queries (e.g. the PPJoin -> connected-components label
    stage consumed by both doc_dedup_clusters and doc_dedup_keep_best).

    Spark shares no common subplans across separately-built DataFrames,
    and the driver/bench sweeps build every query in one session -- so
    without this, a stage shared by N queries executes N times per sweep.
    ``build`` is called lazily, its result wrapped in ``materialize``
    (inheriting the localCheckpoint/staging-table/schema-only mode
    selection), and the handle reused for the rest of the session.  This
    is the cross-query face of the staging-table mode: at cluster scale
    the first query stages the table, the rest read it back.
    """
    app_id = spark.sparkContext.applicationId
    key = (
        app_id,
        tag,
        os.environ.get(STAGING_ENV, ""),
        schema_only_builds(),
    )
    # Evict entries from OTHER applications: they are stale handles from
    # dead sessions (inert, but a long-lived process cycling many Spark
    # sessions -- the pytest suite -- would otherwise accumulate them
    # without bound; r11 ADVICE).  Same-app entries stay, whatever their
    # mode component: mode flips within one app are a handful of keys.
    stale = [k for k in _SESSION_MEMO if k[0] != app_id]
    for k in stale:
        del _SESSION_MEMO[k]
    got = _SESSION_MEMO.get(key)
    if got is None:
        t0 = time.perf_counter()
        _MEMO_CHILD_SECONDS.append(0.0)
        try:
            got = materialize(build())
        finally:
            child = _MEMO_CHILD_SECONDS.pop()
        elapsed = time.perf_counter() - t0
        SESSION_MEMO_BUILD_SECONDS[tag] = (
            SESSION_MEMO_BUILD_SECONDS.get(tag, 0.0) + elapsed - child
        )
        if _MEMO_CHILD_SECONDS:
            _MEMO_CHILD_SECONDS[-1] += elapsed
        _SESSION_MEMO[key] = got
    return got


def rebroadcast_small(df: DataFrame, max_rows: int = 4096) -> DataFrame:
    """Collect a BOUNDED-SMALL frame to the driver and rebuild it as a
    zero-lineage local DataFrame (the codebook collect-and-rebroadcast
    pattern: ``operators/similarity.py:ivf_train`` docstring).

    For frames whose size is bounded by a constant (a k x dim codebook,
    an LSH plane set) this beats ``materialize``: the deep training
    lineage executes exactly once, and every downstream consumer sees a
    zero-lineage ``Scan ExistingRDD`` -- no checkpoint blocks to lose
    under executor preemption, no staging table.  Note the rebuilt frame
    carries NO size statistics (ExistingRDD defaults pessimistic), so
    consumers must keep their explicit ``F.broadcast(...)`` hints -- the
    IVF/LSH call sites already do.  NEVER use it on data-proportional
    frames; ``max_rows`` is a
    hard guard against that driver-OOM misuse.  Values round-trip
    exactly (Spark doubles <-> Python floats are both IEEE binary64), so
    oracle determinism is unaffected.  Schema-only mode returns the
    frame untouched, like ``materialize``.
    """
    if schema_only_builds():
        return df
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"rebroadcast_small: frame exceeds {max_rows} rows -- this "
            "helper is for constant-bounded small sides only; use "
            "materialize() for data-proportional intermediates"
        )
    return df.sparkSession.createDataFrame(rows, schema=df.schema)


def drop_stage(df: DataFrame) -> None:
    """Eagerly delete the staging table backing a ``materialize`` result.

    Call ONLY when every consumer of ``df`` has already executed (i.e. a
    later ``materialize`` that read it has finished writing): after this,
    any new action on ``df`` fails with a missing-path error.  No-op for
    frames materialized via localCheckpoint (their blocks are reclaimed
    by the context cleaner on GC) and in schema-only mode.  This is the
    per-round reclamation path for iterative pipelines (connected
    components): the app's staging high-water mark stays at ~2 rounds of
    label tables instead of growing with iteration count."""
    path = getattr(df, "_spark_graft_stage_path", None)
    if not path:
        return
    spark = df.sparkSession
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def cleanup_staging(spark) -> None:
    """Delete the current application's staging subdirectory (no-op when
    staging mode is off or nothing was staged).  Uses the Hadoop
    filesystem API so it works on HDFS/S3A paths, not just local disk."""
    staging = os.environ.get(STAGING_ENV, "")
    if not staging:
        return
    app_dir = os.path.join(staging, spark.sparkContext.applicationId)
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(app_dir)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def collect_small(df: DataFrame, max_rows: int = 4096) -> list:
    """Driver-side VALUES of a bounded-small frame -- the
    literal-coefficient variant of :func:`rebroadcast_small` (same hard
    guard, same exactness argument: Spark doubles <-> Python floats are
    both IEEE binary64, and BIGINTs below 2^53 round-trip exactly).

    Use when a constant-bounded model (a bucket-statistics row, a
    codebook-sized table) feeds downstream expressions as LITERALS:
    folding the coefficients into the plan removes the wide one-row
    aggregate + crossJoin + Arrow-eval stages whose codegen dominates
    small-model queries (doc_dsir_importance measured 2.8 -> ~1 s).
    NEVER use on data-proportional frames; ``max_rows`` hard-guards the
    driver-OOM misuse.  Returns ``[]`` in schema-only mode -- callers
    must produce schema-identical fallback literals from the empty list.

    EAGER-BUILD caveat (r16 ADVICE): a builder that calls this runs a
    real (bounded) Spark aggregation job at DataFrame-CONSTRUCTION time,
    not first-action time.  Consumers that only need schemas or lazy
    plan shapes (registry lints, type sweeps) must set
    ``SPARK_GRAFT_SCHEMA_ONLY=1``; consumers auditing the REAL physical
    plan (tools/dump_plans.py) pay the model job by design, since the
    folded literals are the plan.
    """
    if schema_only_builds():
        return []
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"collect_small: frame exceeds {max_rows} rows -- this helper "
            "is for constant-bounded small sides only; use materialize() "
            "for data-proportional intermediates"
        )
    return rows
