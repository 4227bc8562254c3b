"""Bucketed co-located join: proves the Exchange is actually eliminated
(the whole point of paying the bucket-write) and that bucket layout never
changes results. Mirrors the scale claim in SCALE.md: a fact table bucketed
on its join key sort-merge-joins with zero shuffle on every later query."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis3_spark.queries.physical import bucketed_pair


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    cust_name, ord_name = bucketed_pair(spark, sf_dir)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c = spark.table(cust_name)
        o = spark.table(ord_name)
        j = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")
        j.count()  # materialize so AQE finalizes the executed plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, sf_dir):
    from kinesis3_spark.queries import QUERIES
    from kinesis3_spark.sources import load_table

    got = {
        r["c_mktsegment"]: (r["n_orders"], r["total"])
        for r in QUERIES["join_bucketed_colocated"](spark, sf_dir).collect()
    }
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    want = {
        r["c_mktsegment"]: (r["n_orders"], r["total"])
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .collect()
    }
    assert got == want


def test_hll_sketch_within_band(spark, sf_dir):
    from kinesis3_spark.queries import QUERIES

    rows = QUERIES["agg_hll_distinct_band"](spark, sf_dir).collect()
    assert rows and all(r["hll_ok"] == 1 for r in rows)
    (merged,) = QUERIES["agg_hll_mergeable_union"](spark, sf_dir).collect()
    assert merged["union_ok"] == 1
