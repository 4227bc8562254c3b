"""Runtime bloom-filter join pruning: a selective dimension filter is turned
into a bloom filter applied on the fact side BEFORE the shuffle, so at scale
the join shuffles only rows that can match (the Catalyst analogue of the
reference's find-ids-then-fetch two-step, db.clj:70-78). Asserts the filter
is injected and that it never changes results."""

from __future__ import annotations

from pyspark.sql import functions as F

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local test data is KBs; drop the size gates so the rule fires
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


def _with_confs(spark, confs):
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return prev


def _restore(spark, prev):
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_and_result_unchanged(spark, sf_dir):
    baseline = {tuple(r) for r in _join(spark, sf_dir).collect()}
    prev = _with_confs(spark, BLOOM_CONFS)
    try:
        j = _join(spark, sf_dir)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, f"no runtime bloom filter:\n{plan}"
        assert {tuple(r) for r in j.collect()} == baseline
    finally:
        _restore(spark, prev)
