"""VariantType tier for semi-structured JSON (Spark 4 `parse_json` /
`variant_get`) — the modern engine-native alternative to string-typed JSON
columns (SURVEY.md §2b "Scalar: JSON").

The reference stores JSON payloads as Postgres JSON text and re-parses on
read (src/kinesis3/db.clj:160-172); the engine's string tier mirrors that
(`scalar_json_suite`). The Variant tier is the at-scale upgrade: parse once
into the binary variant encoding at ingest, then path-access without
re-tokenizing — field reads on variant are O(path) binary probes, not
string parses, and shredding lets the scan prune unread paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _t
from . import query


@query(
    "variant_json_suite",
    oracle="""
    WITH doc AS (
      SELECT event_id,
             '{"base":' || props || ',"u":{"id":' || user_id
               || '},"tags":["t' || (user_id % 3) || '","x"],"nul":null}' AS d
      FROM events
    )
    SELECT json_extract_string(d, '$.tags[0]') AS tag0,
           count(*)::BIGINT AS n,
           sum(json_extract(d, '$.base.k')::BIGINT)::BIGINT AS sum_k,
           max(json_extract(d, '$.u.id')::BIGINT) AS max_uid,
           sum(CASE WHEN json_type(d, '$.nul') = 'NULL' THEN 1 ELSE 0 END)::BIGINT
             AS n_json_nulls,
           sum(CASE WHEN json_extract(d, '$.missing') IS NULL THEN 1 ELSE 0 END)::BIGINT
             AS n_missing
    FROM doc GROUP BY 1
    """,
)
def variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json → variant_get path access (nested object, array index,
    typed extraction), is_variant_null (JSON null vs missing path), and
    aggregation over variant-extracted values — all inside one hash
    aggregate; the variant parse runs in the scan stage."""
    ev = _t(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"base":'), F.col("props"),
        F.lit(',"u":{"id":'), F.col("user_id").cast("string"),
        F.lit('},"tags":["t'), (F.col("user_id") % 3).cast("string"),
        F.lit('","x"],"nul":null}'),
    )
    v = F.parse_json(doc)
    row = ev.select(
        F.variant_get(v, "$.tags[0]", "string").alias("tag0"),
        F.variant_get(v, "$.base.k", "bigint").alias("k"),
        F.variant_get(v, "$.u.id", "bigint").alias("uid"),
        F.is_variant_null(F.variant_get(v, "$.nul", "variant"))
        .cast("int")
        .alias("is_nul"),
        F.try_variant_get(v, "$.missing", "string").isNull().cast("int").alias("missing"),
    )
    return row.groupBy("tag0").agg(
        F.count("*").alias("n"),
        F.sum("k").alias("sum_k"),
        F.max("uid").alias("max_uid"),
        F.sum("is_nul").cast("bigint").alias("n_json_nulls"),
        F.sum("missing").cast("bigint").alias("n_missing"),
    )
