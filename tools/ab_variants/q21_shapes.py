"""A/B (VERDICT r14 "Next round" #6): q21 r14 residual-join shape (old,
inlined) vs the per-order-aggregate shape (new, registered as of r15).
Decided at sf0.1 AND a synthetic ~sf1 (10x key-shifted lineitem/orders
replicas under /tmp/synth_sf1 — plan-shape decision data, not oracle
data): the aggregate shape won both (0.907x / 0.813x), so it is now the
registered form; `new` delegates to it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis3_spark.queries.relational import _t
from kinesis3_spark.queries.tpch3 import q21_waiting_suppliers


def old(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90)
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .persist()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    l1 = late.join(
        l2,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("o3_orderkey"))
        & (F.col("l_suppkey") != F.col("o3_suppkey")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    return (
        l1.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def new(spark, sf_dir):
    return q21_waiting_suppliers(spark, sf_dir)


VARIANTS = {"old": old, "new": new}
