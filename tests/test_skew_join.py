"""AQE skew-join: a planted hot key must trigger runtime partition
splitting ("skew=true" in the join node) — the join-side complement of
operators/skew.salted_agg. At 100 TB one viral key turns a sort-merge
join into a single-straggler stage unless this fires; the session
factory keeps skewJoin enabled, and this test pins that the mechanism
actually engages on this build (the DPP lesson: trust nothing
unmeasured — SCALE.md "Known trade-offs")."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_planted_skewed_join(spark):
    confs = {
        # shrink thresholds so the planted skew qualifies at test scale
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 200k rows on ONE hot key + a uniform tail; dim has every key
        hot = spark.range(200_000).select(
            F.lit(0).alias("k"), F.col("id").alias("v")
        )
        tail = spark.range(5_000).select(
            (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
        )
        fact = hot.unionByName(tail)
        dim = spark.range(101).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        out = fact.join(dim, "k").agg(
            F.count("*").alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
        )
        [row] = out.collect()
        assert row["n"] == 205_000

        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
