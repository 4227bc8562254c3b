"""Round-2 relational fill-ins: bare GROUPING SETS and a right-outer join
(SURVEY.md §2b rows 24 and 14 — rollup/cube and left/full outer were
already covered; these close the remaining sub-rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_agg
from ..sources import load_table
from .relational import _t
from . import query


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderpriority, '<ALL>') AS o_orderpriority,
           COALESCE(o_orderstatus, '<ALL>') AS o_orderstatus,
           count(*)::BIGINT AS n,
           CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare GROUPING SETS (not rollup/cube) via spark.sql — one shuffle,
    each set aggregated from the same shared partial aggregation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, '<ALL>') AS o_orderpriority,
               COALESCE(o_orderstatus, '<ALL>') AS o_orderstatus,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "agg_percentile_approx_within_band",
    oracle="""
    SELECT event_type, 1 AS p50_ok, 1 AS p95_ok
    FROM events GROUP BY event_type
    """,
)
def percentile_approx_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch tier for percentiles (§2b "percentiles", approx path):
    percentile_approx with accuracy 1000 must land within 5% of the exact
    discrete percentile — the scalable substitute when exact rank-select
    would need a full sort at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("ap50"),
        F.percentile_approx("value", 0.95, 1000).alias("ap95"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias("ep50"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias("ep95"),
    )
    band = lambda a, e: (F.abs(F.col(a) - F.col(e)) <= 0.05 * F.abs(F.col(e))).cast("int")
    return agg.select(
        "event_type",
        band("ap50", "ep50").alias("p50_ok"),
        band("ap95", "ep95").alias("p95_ok"),
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type,
           count(*)::BIGINT AS n,
           round(sum(value), 2) AS total,
           CAST(min(value) AS DOUBLE) AS lo,
           CAST(max(value) AS DOUBLE) AS hi
    FROM events GROUP BY event_type
    """,
)
def salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the (low-cardinality = maximally
    skew-prone) event_type key: shuffle on (key, salt) then on key. Result
    identical to the direct groupBy; the plan spreads each hot key over 16
    reducers. Exact-sum inputs keep the re-aggregated sum deterministic."""
    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": ("value", "count"),
            "total": ("value", "sum"),
            "lo": ("value", "min"),
            "hi": ("value", "max"),
        },
    )
    return out.select(
        "event_type",
        "n",
        F.round("total", 2).alias("total"),
        "lo",
        "hi",
    )


@query(
    "join_right_outer_orders",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           COALESCE(o.o_orderkey, -1) AS o_orderkey,
           COALESCE(CAST(o.o_totalprice AS DOUBLE), -1.0) AS o_totalprice
    FROM (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (orders on the left, preserved customer side on the
    right). At scale: equi-key shuffle join; the stream side filter is
    pushed to the scan."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") == "1-URGENT")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce("o_orderkey", F.lit(-1)).alias("o_orderkey"),
            F.coalesce(F.col("o_totalprice").cast("double"), F.lit(-1.0)).alias(
                "o_totalprice"
            ),
        )
    )
