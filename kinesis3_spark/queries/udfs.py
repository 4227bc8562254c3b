"""The Python UDF surface (SURVEY.md §2b row 47): Arrow-batched
`@pandas_udf` scalar functions and grouped `applyInPandas` — the sanctioned
Python tiers (vectorized, batch-at-a-time). Row-at-a-time `F.udf` is
deliberately absent from every query: it is the documented anti-pattern
tier (10-100x slower; see functions/scalar.py docstring).

Float-parity discipline: the applyInPandas z-score derives mean/std from
EXACT sums (2-decimal inputs scale to integers, so sum and sum-of-squares
are exact in double); the oracle applies the identical closed formula, so
both engines compute bit-identical doubles before rounding.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _t
from . import query


@query(
    "udf_pandas_revenue",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)::BIGINT AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pandas_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF in an aggregation pipeline. (The same
    expression is a one-liner in pyspark.sql.functions — the point here is
    the Arrow round-trip carrying exact results through groupBy.)"""

    @F.pandas_udf("double")
    def discounted(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.withColumn("rev", discounted("l_extendedprice", "l_discount"))
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"), F.count("*").alias("n"))
    )


@query(
    "udf_zscore_applyinpandas",
    oracle="""
    WITH stats AS (
      SELECT event_type,
             sum(value) AS s, sum(value * value) AS sq, count(*)::DOUBLE AS n
      FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           e.event_type,
           round((e.value - s.s / s.n)
                 / sqrt(s.sq / s.n - (s.s / s.n) * (s.s / s.n)), 4) AS z
    FROM events e JOIN stats s USING (event_type)
    """,
)
def zscore_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas: per-event-type z-score normalization — the
    custom-stateless-operator escape hatch (one Arrow batch per group;
    groups must fit in executor memory, which event_type cardinality
    guarantees; a high-cardinality key would use window aggregates
    instead)."""

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        s, sq, n = pdf.value.sum(), (pdf.value * pdf.value).sum(), float(len(pdf))
        mean = s / n
        std = (sq / n - mean * mean) ** 0.5
        return pd.DataFrame(
            {
                "event_id": pdf.event_id,
                "event_type": pdf.event_type,
                "z": ((pdf.value - mean) / std).round(4),
            }
        )

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ev.groupBy("event_type").applyInPandas(
        normalize, schema="event_id long, event_type string, z double"
    )


@query(
    "udf_arrow_grouped_agg",
    oracle="""
    SELECT o_orderpriority,
           count(*)::BIGINT AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(min(o_orderkey) AS BIGINT) AS min_key,
           CAST(max(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def arrow_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInArrow (Spark 4): the pyarrow-NATIVE grouped-map tier
    — the same shape as applyInPandas but the batch stays a pa.Table end
    to end, skipping the Arrow→pandas→Arrow conversion entirely (the
    conversion is the dominant per-batch overhead for wide/simple UDFs,
    and pandas coerces types — e.g. int columns with NULLs to float —
    which pyarrow does not). Per-priority exact aggregates: prices ride
    on integer cents (2-decimal doubles scale to within 1 ulp of
    integers, so any rounding mode agrees), so both engines hash
    identically. Completes the Python-surface inventory next to
    pandas_udf / applyInPandas / mapInPandas / UDTF.

    Scale: same contract as applyInPandas — one shuffle on the group key,
    each group one Arrow batch in executor memory (|priorities| = 5 tiny
    groups; a high-cardinality key would use plain aggregates)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def per_group(table: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(table.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64(),
        )
        return pa.table(
            {
                "o_orderpriority": [table.column("o_orderpriority")[0].as_py()],
                "n": [table.num_rows],
                "cents": [pc.sum(cents).as_py()],
                "min_key": [pc.min(table.column("o_orderkey")).as_py()],
                "max_key": [pc.max(table.column("o_orderkey")).as_py()],
            }
        )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice", "o_orderkey"
    )
    return (
        orders.groupBy("o_orderpriority")
        .applyInArrow(
            per_group,
            schema="o_orderpriority string, n bigint, cents bigint, "
            "min_key bigint, max_key bigint",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "udtf_archive_line_parse",
    oracle="""
    SELECT count(*)::BIGINT AS n,
           CAST(sum(event_id) AS BIGINT) AS seq_sum,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
             AS k_sum
    FROM events
    """,
)
def udtf_archive_line_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function, Arrow-optimized)
    parsing the reference collector's own S3 archive line format —
    "<sequence-number> <json-payload>" (core.clj:153) — back into typed
    rows via a LATERAL join, completing the Python-surface inventory
    (pandas UDF, applyInPandas, mapInPandas, applyInPandasWithState,
    mapInPandas multimodal, and now UDTF). The identity sums prove every
    line parsed: a dropped or mis-split line shifts seq_sum. useArrow
    keeps the exchange Arrow-batched (the registry's Python contract);
    at 100 TB this is the restore path for the gzip-line archive the
    reference wrote."""
    import json as _json

    from pyspark.sql.functions import udtf

    @udtf(returnType="seq: bigint, k: bigint", useArrow=True)
    class ParseArchiveLine:
        def eval(self, line: str):
            seq, payload = line.split(" ", 1)
            yield (int(seq), int(_json.loads(payload)["k"]))

    spark.udtf.register("k3s_parse_archive_line", ParseArchiveLine)
    _t(spark, sf_dir, "events").select(
        F.concat_ws(" ", F.col("event_id"), F.col("props")).alias("line")
    ).createOrReplaceTempView("k3s_archive_lines")
    return spark.sql("""
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p.seq) AS BIGINT) AS seq_sum,
               CAST(sum(p.k) AS BIGINT) AS k_sum
        FROM k3s_archive_lines, LATERAL k3s_parse_archive_line(line) p
    """)
