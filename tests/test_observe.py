"""df.observe() — pipeline-piggybacked metrics (Spark's observable-metrics
API): aggregate metrics collected DURING another action's execution, zero
extra scan. This is how a production pipeline exports row counts /
checksums to its ops surface without re-running aggregates — the Spark
analog of the reference collector's inline counters feeding /stats
(core.clj:31-34). Pytest-only evidence by design: fetching an observation
requires running an action eagerly, and the query registry keeps the
lazy-construction discipline (SCALE.md declares its one exception)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from kinesis3_spark.sources import load_table


def test_observe_metrics_match_direct_aggregate(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_orderkey")
    obs = Observation("k3s_obs")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.floor(F.col("l_quantity") * 1e6).cast("long")).alias("qty_micro"),
        F.max("l_orderkey").alias("max_key"),
    )
    n = observed.count()  # the real action the metrics piggyback on
    got = obs.get
    want = li.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.floor(F.col("l_quantity") * 1e6).cast("long")).alias("qty_micro"),
        F.max("l_orderkey").alias("max_key"),
    ).collect()[0]
    assert got["rows"] == n == want["rows"]
    assert got["qty_micro"] == want["qty_micro"]
    assert got["max_key"] == want["max_key"]


def test_observe_survives_downstream_filter(spark, sf_dir):
    """The observation point measures rows AT ITS PLAN POSITION — a
    downstream filter must not change the observed count (the property
    that makes observe() a trustworthy ingest counter)."""
    li = load_table(spark, sf_dir, "lineitem")
    total = li.count()
    obs = Observation("k3s_obs_pos")
    filtered = (
        li.observe(obs, F.count(F.lit(1)).alias("rows"))
        .where(F.col("l_quantity") > 25)
    )
    kept = filtered.count()
    assert obs.get["rows"] == total
    assert kept < total
