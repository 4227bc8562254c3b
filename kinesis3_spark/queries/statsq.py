"""Statistical aggregate surface: correlation / covariance / linear
regression, bitwise aggregates, and interpolated median — the descriptive
statistics tier a warehouse exposes beyond sum/avg/stddev.

Generalizes the reference's metrics aggregation (counter/mean snapshots,
reference src/kinesis3/core.clj:74-86) to the full moment-based family.
All of these are algebraic aggregates (finite sufficient statistics:
sums, sums of squares, cross products, pairwise counts), so map-side
partial aggregation applies and the shuffle carries one state tuple per
group — the same 100 TB profile as a plain sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _t
from . import query


@query(
    "agg_corr_regression",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_extendedprice, l_quantity), 6)           AS r,
           round(covar_pop(l_extendedprice, l_quantity), 4)      AS cov_p,
           round(covar_samp(l_extendedprice, l_quantity), 4)     AS cov_s,
           round(regr_slope(l_extendedprice, l_quantity), 6)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, covariances, and OLS fit of price on quantity
    per return flag. Each is one algebraic state (Σx, Σy, Σxy, Σx², n) —
    a single hash aggregate, no second pass for the means."""
    li = _t(spark, sf_dir, "lineitem")
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(y, x), 6).alias("r"),
        F.round(F.covar_pop(y, x), 4).alias("cov_p"),
        F.round(F.covar_samp(y, x), 4).alias("cov_s"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("icept"),
        F.regr_count(y, x).cast("bigint").alias("n"),
    )


@query(
    "agg_bitwise_keys",
    oracle="""
    SELECT o_orderstatus,
           bit_and(o_orderkey) AS band,
           bit_or(o_orderkey)  AS bor,
           bit_xor(o_orderkey) AS bxor
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_bitwise_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates over the key domain — commutative and
    associative, so partial aggregation is exact and the merge is a single
    op per partition."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and("o_orderkey").alias("band"),
        F.bit_or("o_orderkey").alias("bor"),
        F.bit_xor("o_orderkey").alias("bxor"),
    )


@query(
    "agg_median_interpolated",
    oracle="""
    SELECT l_returnflag,
           median(l_quantity) AS med_qty,
           round(median(l_discount), 4) AS med_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_median_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated median (continuous percentile 0.5). Quantities are
    integer-valued doubles, so the even-count midpoint (a+b)/2 is exact in
    binary and hashes identically across engines; the discount median is
    rounded at 4 dp (its native precision). Exact medians need a
    per-group sort at scale — the approximate tier
    (`agg_percentile_approx_within_band`) is the 100 TB default."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("med_qty"),
        F.round(F.median("l_discount"), 4).alias("med_disc"),
    )
