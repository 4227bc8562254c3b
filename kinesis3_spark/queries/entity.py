"""Entity resolution, column profiling, and SCD2 history building — the
warehouse-hygiene operators that sit beside dedup in a production data
platform (reference's upsert pipeline, src/kinesis3/db.clj:113-134, is the
SCD0 degenerate case of the SCD2 builder here).

Scale notes: fuzzy matching NEVER runs all-pairs — candidates come from an
equi-join on a blocking key and the edit-distance check is a post-join
residual on pairs only. Profiling is a single scan with all per-column
aggregates fused into one hash-aggregate state. SCD2 is one window pass
per entity key (single shuffle, in-partition sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .relational import _t
from . import query


@query(
    "dedup_fuzzy_blocked_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
      SELECT p_name, regexp_extract(p_name, '(\\S+)$', 1) AS blk FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY name_a, name_b
    """,
)
def dedup_fuzzy_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching over the part-name dictionary: block on the
    last token (the head noun), then verify candidate pairs with
    Levenshtein ≤ 4. The DISTINCT-first step is what scales — resolution
    runs on the name dictionary (|vocab|), not the fact table, and the
    dictionary maps back to rows by equi-join. Within-block self-join is
    quadratic only in block size; at 100 TB cap block width (as the
    LSH/minhash tier does) or sub-block on a second key."""
    names = (
        _t(spark, sf_dir, "part").select("p_name").distinct()
        .withColumn("blk", F.regexp_extract("p_name", r"(\S+)$", 1))
    )
    a = names.select(F.col("p_name").alias("name_a"), F.col("blk").alias("blk_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.col("blk").alias("blk_b"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("name_a") < F.col("name_b")))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
        .where(F.col("dist") <= 4)
        .select("name_a", "name_b", "dist")
        .orderBy("name_a", "name_b")
    )


@query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS col, count(o_orderkey) AS n_nonnull,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_s, CAST(max(o_orderkey) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(o_orderstatus), count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(o_orderpriority), count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(o_totalprice), count(DISTINCT o_totalprice),
           CAST(round(min(o_totalprice), 2) AS VARCHAR), CAST(round(max(o_totalprice), 2) AS VARCHAR)
    FROM orders
    """,
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (describe/ANALYZE shape): non-null count, exact
    distinct, min/max per column — ALL columns in ONE scan. The aggregates
    fuse into a single hash-aggregate state; the wide 1-row result is then
    melted to (col, stats) rows driver-trivially. At 100 TB swap exact
    distinct for approx_count_distinct (the sketch tier) — same plan."""
    o = _t(spark, sf_dir, "orders")
    wide = o.agg(
        F.count("o_orderkey").alias("k_n"),
        F.count_distinct("o_orderkey").alias("k_d"),
        F.min("o_orderkey").cast("string").alias("k_mn"),
        F.max("o_orderkey").cast("string").alias("k_mx"),
        F.count("o_orderstatus").alias("s_n"),
        F.count_distinct("o_orderstatus").alias("s_d"),
        F.min("o_orderstatus").alias("s_mn"),
        F.max("o_orderstatus").alias("s_mx"),
        F.count("o_orderpriority").alias("p_n"),
        F.count_distinct("o_orderpriority").alias("p_d"),
        F.min("o_orderpriority").alias("p_mn"),
        F.max("o_orderpriority").alias("p_mx"),
        F.count("o_totalprice").alias("t_n"),
        F.count_distinct("o_totalprice").alias("t_d"),
        F.round(F.min("o_totalprice"), 2).cast("string").alias("t_mn"),
        F.round(F.max("o_totalprice"), 2).cast("string").alias("t_mx"),
    )
    row = F.struct
    return wide.select(
        F.explode(
            F.array(
                row(
                    F.lit("o_orderkey").alias("col"),
                    F.col("k_n").alias("n_nonnull"),
                    F.col("k_d").alias("n_distinct"),
                    F.col("k_mn").alias("min_s"),
                    F.col("k_mx").alias("max_s"),
                ),
                row(
                    F.lit("o_orderstatus").alias("col"),
                    F.col("s_n").alias("n_nonnull"),
                    F.col("s_d").alias("n_distinct"),
                    F.col("s_mn").alias("min_s"),
                    F.col("s_mx").alias("max_s"),
                ),
                row(
                    F.lit("o_orderpriority").alias("col"),
                    F.col("p_n").alias("n_nonnull"),
                    F.col("p_d").alias("n_distinct"),
                    F.col("p_mn").alias("min_s"),
                    F.col("p_mx").alias("max_s"),
                ),
                row(
                    F.lit("o_totalprice").alias("col"),
                    F.col("t_n").alias("n_nonnull"),
                    F.col("t_d").alias("n_distinct"),
                    F.col("t_mn").alias("min_s"),
                    F.col("t_mx").alias("max_s"),
                ),
            )
        ).alias("p")
    ).select("p.col", "p.n_nonnull", "p.n_distinct", "p.min_s", "p.max_s")


@query(
    "merge_scd2_customer_orders",
    oracle="""
    SELECT o_custkey,
           round(o_totalprice, 2) AS price,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(
             strftime(lead(o_orderdate) OVER w, '%Y-%m-%d %H:%M:%S'),
             '9999-12-31 00:00:00') AS valid_to,
           CASE WHEN lead(o_orderdate) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def merge_scd2_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history builder: version rows per entity become validity
    intervals [valid_from, valid_to) with an is_current flag — the
    last-writer-wins upsert sink (`sinks/upsert.py`) is the special case
    that keeps only is_current = 1. One shuffle on the entity key; the
    lead() is computed in the same in-partition sort. The o_orderkey
    tie-break makes same-timestamp versions deterministic."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    fmt = "yyyy-MM-dd HH:mm:ss"
    return o.select(
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.date_format("o_orderdate", fmt).alias("valid_from"),
        F.coalesce(F.date_format(nxt, fmt), F.lit("9999-12-31 00:00:00")).alias(
            "valid_to"
        ),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )
