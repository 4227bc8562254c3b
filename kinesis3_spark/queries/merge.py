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
