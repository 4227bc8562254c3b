"""Upsert/merge semantics as an oracle-checked query (SURVEY.md §2b
"stateful upsert", reference db.clj:100-134): a replayed stream is merged
last-writer-wins by key with a single window pass — the same plan
sinks/upsert.py executes inside its rewrite."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import _t
from . import query


@query(
    "upsert_last_writer_wins",
    oracle="""
    WITH replayed AS (
      SELECT event_id, event_type, value, ts FROM events
      UNION ALL
      SELECT event_id, 'corrected', value + 1000, ts + INTERVAL 1 HOUR
      FROM events WHERE event_id % 10 = 0
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY ts DESC) AS rn
      FROM replayed
    )
    SELECT event_id, event_type, round(value, 2) AS value
    FROM ranked WHERE rn = 1
    """,
)
def upsert_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value", "ts")
    replay = ev.where(F.col("event_id") % 10 == 0).select(
        "event_id",
        F.lit("corrected").alias("event_type"),
        (F.col("value") + 1000).alias("value"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("ts"),
    )
    w = Window.partitionBy("event_id").orderBy(F.desc("ts"))
    return (
        ev.unionByName(replay)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "event_type", F.round("value", 2).alias("value"))
    )


@query(
    "merge_cdc_apply",
    oracle="""
    WITH ops AS (
      SELECT user_id, ts, event_id, value,
             CASE event_type WHEN 'signup' THEN 'I'
                             WHEN 'error' THEN 'D'
                             ELSE 'U' END AS op
      FROM events
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
      ) AS rn FROM ops
    ),
    latest AS (
      SELECT user_id, op AS last_op, value AS last_value FROM ranked WHERE rn = 1
    ),
    counts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_ops FROM ops GROUP BY user_id)
    SELECT l.user_id, last_op, round(last_value, 2) AS last_value, n_ops
    FROM latest l JOIN counts USING (user_id)
    WHERE last_op <> 'D' ORDER BY user_id
    """,
)
def merge_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: fold an insert/update/delete change stream into final
    snapshot state per key. Event types stand in for CDC op codes
    (signup→I, error→D, else U); the winner per key is the latest op by
    (ts, event_id), and keys whose last op is a delete vanish from the
    snapshot — the piece plain last-writer-wins upsert (above) can't
    express.

    Scale shape: ONE map-side-combined hash aggregate keyed by user_id —
    max_by with a (ts, event_id) struct ordering key folds the per-key
    maximum incrementally in the partial agg, so the shuffle carries one
    row per key per map partition, never the raw change stream (the
    window formulation the oracle uses would shuffle and sort every
    change). This is the standard CDC-compaction shape: at 100 TB the
    change log is petabytes but the shuffle is |keys| rows."""
    ord_key = F.struct("ts", "event_id")
    ops = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value",
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )
    return (
        ops.groupBy("user_id")
        .agg(
            F.max_by("op", ord_key).alias("last_op"),
            F.round(F.max_by("value", ord_key), 2).alias("last_value"),
            F.count("*").alias("n_ops"),
        )
        .where(F.col("last_op") != "D")
        .orderBy("user_id")
    )
