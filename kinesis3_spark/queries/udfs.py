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
