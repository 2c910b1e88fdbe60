"""The reference's end-to-end message pipeline, Spark-first (O5-O13, O18, O22).

Reference semantics (/root/reference/src/main/java/com/cansever/consumer/
CassandraOutputFormat.java:100-137): for every consumed message --

1. ``sent_time`` = epoch ms -> timestamp              (O5, :103)
2. ``stanza``    = base64(AES-CBC-PKCS5(stanza))       (O7, :104)
3. drop the row if encryption returned null           (O9, :105)
4. ``date_partition`` = yyyyMM(sent_time) || 'M'       (O6, :106)
5. write summary row (username, jid, date_partition)  (O10/O11/O13, :108-119)
6. write detail row (6 columns)                       (O12, :121-132)

The Cassandra upsert of step 5 converges to the DISTINCT set of
``(username, jid, month)`` -- the reference's only aggregation (SURVEY.md
section 1.2/O11); the column name ``first_date_partition`` also implies the
``min(date_partition)`` variant.  Both are exposed.

Batch-vs-stream: every function here is ``DataFrame -> DataFrame`` and runs
unchanged under Structured Streaming (``streaming/pipeline.py`` wires the
same transforms behind ``readStream``/``foreachBatch``).

Fixture mapping: the driver's ``events`` table stands in for the Kafka
stream (FIXTURES.md part B): ``event_id -> msg_id``, ``user_id -> username``,
``ts -> sent_time``, peer JID derived from the ``props`` JSON, and an
XMPP-ish stanza synthesized from ``event_type`` via the O22 taxonomy.  The
mapping is pure SQL so the DuckDB oracle replicates it exactly.

Scale: steps 1-4 are narrow (one codegen stage, no shuffle -- the same
"fully chained, zero shuffle" shape as the reference topology,
BackupMessageConsumer.java:39-61).  The summary distinct is the single wide
op; it shuffles on ``(username, jid, date_partition)`` with map-side partial
aggregation, and the detail sink partitions by ``date_partition`` so month
queries prune at the directory level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import crypto, datetime_fns, taxonomy
from ..sources import tables

#: event_type -> MessageType enum name (synthetic classification input;
#: the taxonomy codes themselves are verbatim MessageType.java:7-24).
EVENT_TYPE_TO_MESSAGE_TYPE = {
    "click": "TEXT",
    "view": "PHOTO",
    "purchase": "VIDEO",
    "signup": "REGISTER",
    "error": "MISSED_CALL",
}


def messages_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the reference's input record stream (FIXTURES.md B.1) from
    the ``events`` fixture, deterministically and SQL-replicably."""
    return messages_from_events_df(tables.load(spark, sf_dir, "events"))


def messages_from_events_df(ev: DataFrame) -> DataFrame:
    """The events->messages mapping as a pure DataFrame transform: runs
    unchanged on a batch read or a Structured Streaming source
    (streaming/pipeline.py), which is the whole point of the
    DataFrame-first design (SURVEY.md section 1.5)."""
    type_name = _event_type_name_col()
    code = taxonomy.classify(type_name)
    stanza = F.concat(
        F.lit('<message type="'), code, F.lit('"><body>'),
        F.col("event_type"), F.lit(":"), F.get_json_object("props", "$.k"),
        F.lit("</body></message>"),
    )
    return ev.select(
        F.col("event_id").cast("string").alias("msg_id"),
        F.concat(F.lit("user"), F.col("user_id").cast("string")).alias("username"),
        F.concat(F.lit("peer"), F.get_json_object("props", "$.k"), F.lit("@chat.local")).alias("jid"),
        F.col("ts").alias("sent_ts"),
        F.unix_millis(F.col("ts")).alias("sent_time_ms"),
        stanza.alias("stanza"),
    )


def _event_type_name_col():
    expr = None
    for et, name in EVENT_TYPE_TO_MESSAGE_TYPE.items():
        cond = F.col("event_type") == F.lit(et)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return expr.otherwise(F.lit("TEXT"))


MESSAGES_ORACLE_CTE = """
messages AS (
  SELECT
    CAST(event_id AS VARCHAR) AS msg_id,
    'user' || CAST(user_id AS VARCHAR) AS username,
    'peer' || json_extract_string(props, '$.k') || '@chat.local' AS jid,
    ts AS sent_ts,
    epoch_ms(ts) AS sent_time_ms,
    '<message type="' || {type_code} || '"><body>' || event_type || ':' ||
      json_extract_string(props, '$.k') || '</body></message>' AS stanza
  FROM events
)
""".strip()


def messages_oracle_cte() -> str:
    """DuckDB CTE replicating :func:`messages_from_events` exactly."""
    type_name_sql = _event_type_name_sql()
    return MESSAGES_ORACLE_CTE.format(type_code=taxonomy.classify_case_sql(f"({type_name_sql})"))


def _event_type_name_sql() -> str:
    whens = "\n".join(
        f"    WHEN event_type = '{et}' THEN '{name}'"
        for et, name in EVENT_TYPE_TO_MESSAGE_TYPE.items()
    )
    return f"CASE\n{whens}\n    ELSE 'TEXT'\n  END"


def detail_table(msgs: DataFrame, encrypt: bool = True) -> DataFrame:
    """O5+O6+O7+O9+O12: the MESSAGE_HISTORY row shape
    (CassandraOutputFormat.java:87-89, bind :121).

    O9's null-drop of failed encryptions (CassandraOutputFormat.java:105)
    is expressed on the PLAINTEXT: with a fixed valid key, the builtin
    aes_encrypt is NULL-in/NULL-out (pinned by the crypto null-propagation
    test), so ``stanza IS NOT NULL`` before the projection is equivalent --
    and filtering the ciphertext instead doubles the AES work, because
    predicate pushdown re-evaluates the whole encrypt expression below the
    projection (observed in the physical plan: two aesEncrypt calls per
    row)."""
    sent_time = datetime_fns.epoch_ms_to_timestamp(F.col("sent_time_ms"))
    return msgs.filter(F.col("stanza").isNotNull()).select(
        F.col("msg_id").alias("message_id"),
        "username",
        "jid",
        datetime_fns.date_partition_from_epoch_ms(F.col("sent_time_ms")).alias("date_partition"),
        sent_time.alias("sent_time"),
        (crypto.aes_encrypt_b64(F.col("stanza")) if encrypt else F.col("stanza")).alias("stanza"),
    )


def summary_distinct(msgs: DataFrame) -> DataFrame:
    """O10+O11 distinct-set semantics: the months each (username, jid) pair
    exchanged messages (Cassandra upsert convergence, SURVEY.md O11)."""
    dp = datetime_fns.date_partition_from_epoch_ms(F.col("sent_time_ms"))
    return (
        msgs.select("username", "jid", dp.alias("date_partition"))
        .dropDuplicates()
    )


def summary_first(msgs: DataFrame) -> DataFrame:
    """O11 'first' variant implied by the column name
    ``first_date_partition`` (CassandraOutputFormat.java:95)."""
    dp = datetime_fns.date_partition_from_epoch_ms(F.col("sent_time_ms"))
    return (
        msgs.select("username", "jid", dp.alias("date_partition"))
        .groupBy("username", "jid")
        .agg(F.min("date_partition").alias("first_date_partition"))
    )


def write_dual_sink(msgs: DataFrame, out_dir: str) -> None:
    """O12+O13: one input, two sink writes -- detail (partitioned by month
    for partition pruning, mirroring the Cassandra partition-key design,
    CassandraOutputFormat.java:106) and the distinct summary.

    Unlike the reference's async fire-and-forget writes (O14 -- at-most-once,
    errors dropped, CassandraOutputFormat.java:109-132), both writes here are
    synchronous jobs over the same cached input: deterministic, retried,
    effectively exactly-once to an idempotent path."""
    msgs = msgs.persist()
    try:
        detail_table(msgs).write.mode("overwrite").partitionBy("date_partition").parquet(
            f"{out_dir}/message_history"
        )
        summary_distinct(msgs).write.mode("overwrite").parquet(
            f"{out_dir}/message_history_summary"
        )
    finally:
        msgs.unpersist()
