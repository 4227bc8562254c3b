"""Ingest-pipeline queries (SURVEY.md §2a F4/F14/F5 — the reference's core
data path, db.clj:146-173). The corpus has no raw collector records, so the
query CONSTRUCTS canonical two-level JSON records from `events` rows with
deterministic string concatenation, runs them through the real pipeline
(kinesis3_spark.pipeline.ingest — from_json x2, cookie parse, UTM
projection), and the DuckDB oracle predicts every output column from first
principles over the same construction. A hash match proves the two-level
parse, URL-decode, cookie map, UTM extraction, and epoch formatting all
behave to spec."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..pipeline import ingest
from .relational import _t
from . import query


def _raw_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events rows → synthetic collector records (outer JSON with an escaped
    inner-JSON `body`), built with pure concat so DuckDB can mirror it."""
    ev = _t(spark, sf_dir, "events")
    s = lambda c: c.cast("string")
    ep_ms = F.unix_timestamp("ts") * 1000
    inner = F.concat(
        F.lit('{"id":"e'), s(F.col("event_id")),
        F.lit('","t":'), s(ep_ms),
        F.lit(',"path":"/evt/'), F.col("event_type"),
        F.lit('","url":"https://ex.com/evt/'), F.col("event_type"),
        F.lit('","referrer":"https://ref.example/p'), s(F.col("user_id") % 7),
        F.lit('","args":{"utm_source":"src'), s(F.col("user_id") % 3),
        F.lit('","utm_campaign":"camp'), s(F.col("user_id") % 5),
        F.lit('"},"user":{"uid":"u'), s(F.col("user_id")),
        F.lit('"},"headers":{"User-Agent":"UA/1.0","X-Forward-For":"10.0.0.'),
        s(F.col("user_id") % 200),
        F.lit('","Cookie":"uid=u'), s(F.col("user_id")),
        F.lit('; tag=v%20'), s(F.col("event_id") % 7),
        F.lit('"}}'),
    )
    esc = F.replace(inner, F.lit('"'), F.lit('\\"'))
    outer = F.concat(
        F.lit('{"m":"evt","epoch":'), s(ep_ms + 1500),
        F.lit(',"ua":"UA/1.0","body":"'), esc, F.lit('"}'),
    )
    return ev.select(outer.alias("raw"))


@query(
    "pipeline_ingest_projection",
    oracle="""
    WITH src AS (
      SELECT event_id, user_id, event_type,
             (floor(epoch(ts))::BIGINT * 1000) AS ep_ms
      FROM events
    )
    SELECT 'e' || event_id AS id,
           strftime(make_timestamp((ep_ms + 1500) * 1000), '%Y-%m-%dT%H:%M:%S')
             AS received_at,
           strftime(make_timestamp(ep_ms * 1000), '%Y-%m-%dT%H:%M:%S') AS ts,
           '/evt/' || event_type AS path,
           'https://ex.com/evt/' || event_type AS url,
           'https://ref.example/p' || (user_id % 7) AS referrer,
           '10.0.0.' || (user_id % 200) AS ip,
           'src' || (user_id % 3) AS utm_source,
           'camp' || (user_id % 5) AS utm_campaign,
           '{"uid":"u' || user_id || '","tag":"v ' || (event_id % 7) || '"}'
             AS cookies,
           '{"utm_source":"src' || (user_id % 3) || '","utm_campaign":"camp'
             || (user_id % 5) || '"}' AS args,
           '{"uid":"u' || user_id || '"}' AS user_data,
           'UA/1.0' AS user_agent
    FROM src
    """,
)
def ingest_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = ingest(_raw_records(spark, sf_dir))
    return out.select(
        "id",
        "received_at",
        "ts",
        "path",
        "url",
        "referrer",
        "ip",
        "utm_source",
        "utm_campaign",
        "cookies",
        "args",
        "user_data",
        "user_agent",
    )


@query(
    "pipeline_utm_attribution",
    oracle="""
    WITH src AS (SELECT user_id, value FROM events)
    SELECT 'src' || (user_id % 3) AS utm_source,
           'camp' || (user_id % 5) AS utm_campaign,
           count(*)::BIGINT AS n_events,
           round(sum(value), 2) AS total_value
    FROM src
    GROUP BY 1, 2
    """,
)
def utm_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The downstream use of the projection: campaign attribution rollup —
    parse every record, group by extracted UTM columns. The aggregation
    runs on from_json outputs, proving projected columns are aggregation-
    grade (and at scale Catalyst prunes the unread struct fields)."""
    ev = _t(spark, sf_dir, "events").select("event_id", F.col("value"))
    parsed = ingest(_raw_records(spark, sf_dir)).select(
        F.expr("substring(id, 2)").cast("long").alias("event_id"),
        "utm_source",
        "utm_campaign",
    )
    return (
        parsed.join(ev, "event_id")
        .groupBy("utm_source", "utm_campaign")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
