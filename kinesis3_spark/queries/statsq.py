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


@query(
    "stats_daily_anomaly_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stats AS (
      SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sigma
      FROM daily GROUP BY event_type
    )
    SELECT d.event_type, strftime(day, '%Y-%m-%d') AS day, n,
           round((n - mu) / nullif(sigma, 0), 4) AS z,
           CAST(CASE WHEN abs((n - mu) / nullif(sigma, 0)) > 2.0
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM daily d JOIN stats s USING (event_type)
    ORDER BY event_type, day
    """,
)
def stats_daily_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection on the event stream: per event type, flag
    days whose count deviates > 2 sigma from that type's daily mean (the
    ops-dashboard alert the reference's /stats endpoint feeds). Two
    map-side-combined aggregates (raw → daily, daily → per-type moments)
    and a broadcast join of the |types|-row stats back onto daily rows —
    the raw stream is touched once, and nothing wider than (type, day)
    ever shuffles."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    stats = daily.groupBy("event_type").agg(
        F.avg("n").alias("mu"), F.stddev_samp("n").alias("sigma")
    )
    # sigma == 0 (a type whose daily counts are all identical) must be a
    # deterministic NULL z / 0 flag on BOTH engines — Spark's x/0.0 is
    # NULL but DuckDB's ieee_floating_point_ops mode yields ±inf, so
    # guard the divisor explicitly rather than lean on engine defaults.
    z = F.when(
        F.col("sigma") != 0, (F.col("n") - F.col("mu")) / F.col("sigma")
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(z, 4).alias("z"),
            F.when(F.abs(z) > 2.0, 1).otherwise(0).cast("bigint").alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "win_rolling_median_value",
    oracle="""
    SELECT user_id, event_id,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS med7
    FROM events WHERE user_id < 30
    ORDER BY user_id, event_id
    """,
)
def win_rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-event median of `value` per user — the robust-smoothing
    twin of the EWMA meters (metrics_ewma_rates): medians shrug off the
    spikes the mean-based meters chase. One shuffle keyed by user_id; the
    ROWS frame bounds per-row state to 7 values, so the window pass is
    O(7) per row regardless of stream length — this is the exact-median
    window; at 100 TB cardinality the sketch tier (agg_percentiles /
    t-digest shape) replaces it only when the frame itself is huge."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 30)
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.percentile("value", F.lit(0.5)).over(w), 4).alias("med7"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "stats_daily_anomaly_mad",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    med AS (
      SELECT event_type, quantile_cont(n, 0.5) AS med
      FROM daily GROUP BY event_type
    ),
    mad AS (
      SELECT d.event_type, quantile_cont(abs(n - med), 0.5) AS mad
      FROM daily d JOIN med USING (event_type) GROUP BY d.event_type
    )
    SELECT d.event_type, strftime(day, '%Y-%m-%d') AS day, n,
           round(CASE WHEN mad <> 0
                      THEN 0.6745 * (n - med) / mad END, 4) AS rz,
           CAST(CASE WHEN mad <> 0
                      AND abs(0.6745 * (n - med) / mad) > 3.5
                     THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
    FROM daily d JOIN med USING (event_type) JOIN mad USING (event_type)
    ORDER BY event_type, day
    """,
)
def stats_daily_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume-anomaly detection: the median/MAD twin of
    stats_daily_anomaly_zscore (Iglewicz-Hodges modified z-score,
    0.6745*(x-med)/MAD, |rz| > 3.5 flags). mean/stddev anomaly detection
    is itself corrupted by the outliers it hunts — one bad day inflates
    sigma and masks the next bad day; median/MAD has a 50% breakdown
    point, which is why production volume monitors prefer it.

    Cross-engine parity: daily counts are exact bigints, interpolated
    medians of integers are exact halves, so every double on both sides
    is bitwise equal before the 4-dp round (F.percentile and DuckDB
    quantile_cont share the linear-interpolation definition — probed:
    both give 3.0 on [1,2,4,8]). MAD == 0 (>=half the days identical)
    yields a deterministic NULL rz / 0 flag on both engines, the sigma==0
    discipline of the z-score twin.

    Scale: raw stream touched once (raw -> daily), then two exact
    per-type percentile aggregates over |types| x |days| rows (bounded by
    calendar x type — the percentile state is the day vector, fine at any
    event volume) and a broadcast of the |types|-row med/mad tables back
    onto daily rows."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    med = daily.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("med")
    )
    mad = (
        daily.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(F.percentile(F.abs(F.col("n") - F.col("med")), F.lit(0.5)).alias("mad"))
    )
    rz = F.when(
        F.col("mad") != 0, 0.6745 * (F.col("n") - F.col("med")) / F.col("mad")
    )
    return (
        daily.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(rz, 4).alias("rz"),
            F.when(F.abs(rz) > 3.5, 1).otherwise(0).cast("bigint").alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


@query(
    "ts_weekly_seasonality",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             isodow(CAST(ts AS DATE)) AS dow,
             count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2, 3
    ),
    prof AS (
      SELECT event_type, dow,
             count(*)::BIGINT AS n_days,
             sum(n)::BIGINT AS s
      FROM daily GROUP BY 1, 2
    ),
    overall AS (
      SELECT event_type, sum(n)::BIGINT AS s_all, count(*)::BIGINT AS d_all
      FROM daily GROUP BY 1
    )
    SELECT p.event_type, p.dow::BIGINT AS dow, p.n_days,
           round(p.s / p.n_days, 2) AS avg_n,
           round((p.s / p.n_days) / (o.s_all / o.d_all), 4) AS idx
    FROM prof p JOIN overall o USING (event_type)
    ORDER BY event_type, dow
    """,
)
def ts_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: average daily
    volume per ISO weekday and its index against the type's overall
    daily average (idx > 1 = that weekday runs hot) — the seasonal
    baseline a volume monitor normalizes by before flagging anomalies
    (the median/MAD detector's natural companion: deviation from the
    DOW-matched baseline, not the global one).

    Parity: every division is exact-int / exact-int, so the doubles are
    bitwise identical cross-engine before rounding (the sum/count are
    computed explicitly rather than via avg() so no engine's internal
    summation order is involved). ISO weekday via Spark weekday()+1 ==
    DuckDB isodow (Mon=1..Sun=7).

    Scale: raw stream touched once (raw -> daily), two bounded rollups
    (|types| x 7 and |types| rows) that broadcast-join — the z-score /
    MAD detectors' exact shuffle budget."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.weekday(F.to_date("ts")) + 1).alias("dow"),
    ).agg(F.count("*").alias("n"))
    prof = daily.groupBy("event_type", "dow").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("s"),
    )
    overall = daily.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("s_all"),
        F.count("*").cast("bigint").alias("d_all"),
    )
    return (
        prof.join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            F.col("dow").cast("bigint").alias("dow"),
            "n_days",
            F.round(F.col("s") / F.col("n_days"), 2).alias("avg_n"),
            F.round(
                (F.col("s") / F.col("n_days")) / (F.col("s_all") / F.col("d_all")), 4
            ).alias("idx"),
        )
        .orderBy("event_type", "dow")
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, day, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY day) AS s_t,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
             sum(n) OVER (PARTITION BY event_type) AS s_n,
             count(*) OVER (PARTITION BY event_type) AS n_days
      FROM daily
    ),
    stat AS (
      SELECT event_type, day, n_days,
             abs(n_days * s_t - t * s_n) AS d_t
      FROM cum WHERE t < n_days
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           strftime(day, '%Y-%m-%d') AS cp_day,
           CAST(d_t AS BIGINT) AS cusum_stat
    FROM (
      SELECT event_type, day, n_days, d_t,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY d_t DESC, day) AS rk
      FROM stat
    ) WHERE rk = 1 ORDER BY event_type
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-shift changepoint per event type: the CUSUM-of-deviations
    curve D_t = |n*S_t - t*S_n| (the Pettitt/AMOC statistic with the
    division cleared — PURE INTEGERS, so the argmax day is hash-exact
    cross-engine, no float comparison anywhere), maximized over split
    points with earliest-day tie-break. The volume monitors
    (z-score/MAD) flag single bad days; this finds the day the LEVEL
    changed — the complementary regime-shift alarm.

    Scale: one (type, day) rollup, cumulative sums windowed over days
    WITHIN a type (bounded by the calendar, never corpus rows), a
    per-type argmax window over the same bounded partition."""
    from pyspark.sql.window import Window

    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    wt = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "day",
        F.sum("n").over(wd).alias("s_t"),
        F.row_number().over(wd).alias("t"),
        F.sum("n").over(wt).alias("s_n"),
        F.count("*").over(wt).alias("n_days"),
    )
    stat = cum.where(F.col("t") < F.col("n_days")).select(
        "event_type",
        "day",
        "n_days",
        F.abs(
            F.col("n_days") * F.col("s_t") - F.col("t") * F.col("s_n")
        ).alias("d_t"),
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.col("d_t").desc(), "day")
    )
    return (
        stat.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            F.col("d_t").cast("bigint").alias("cusum_stat"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov (round 13): the distribution-shift test a
# data pipeline runs between cohorts/sources — here between the 'view' and
# 'purchase' value distributions. Computed on a QUANTIZED grid
# (floor(value*1000), i.e. 0.001 resolution — finer than the data's 2dp
# precision, so quantization is lossless here) because the production
# shape at corpus scale is histogram-KS: the cumulative walk runs over the
# |distinct bins| rollup, never the raw rows. Integer-exact end to end:
# D's numerator is max|cum_a*n_b - cum_b*n_a| (cross-multiplied), and the
# alpha=0.05 decision compares 1e6*d_num^2 against 1844164*(n_a+n_b)*n_a*n_b
# (c(0.05)=1.358, c^2*1e6=1844164) in doubles — products of exact integers,
# so both engines round identically.
# --------------------------------------------------------------------------
@query(
    "stats_ks_two_sample",
    oracle="""
    WITH two AS (
      SELECT CAST(floor(value * 1000) AS BIGINT) AS bin,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_a
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    bins AS (
      SELECT bin, sum(is_a)::BIGINT AS c_a, sum(1 - is_a)::BIGINT AS c_b
      FROM two GROUP BY bin
    ),
    cum AS (
      SELECT sum(c_a) OVER w AS cum_a, sum(c_b) OVER w AS cum_b,
             sum(c_a) OVER () AS n_a, sum(c_b) OVER () AS n_b
      FROM bins WINDOW w AS (ORDER BY bin ROWS UNBOUNDED PRECEDING)
    )
    SELECT max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
           max(abs(cum_a * max_nb - cum_b * max_na))::BIGINT AS d_num,
           CAST(CASE WHEN 1000000.0
                          * max(abs(cum_a * max_nb - cum_b * max_na))
                          * max(abs(cum_a * max_nb - cum_b * max_na))
                        > 1844164.0 * (max_na + max_nb) * max_na * max_nb
                     THEN 1 ELSE 0 END AS INT) AS reject_05
    FROM cum, (SELECT max(n_a) AS max_na, max(n_b) AS max_nb
               FROM (SELECT sum(is_a)::BIGINT AS n_a,
                            sum(1 - is_a)::BIGINT AS n_b FROM two) t) s
    GROUP BY max_na, max_nb
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binned two-sample KS between view/purchase value
    distributions. Plan: one filtered scan → (bin, group) map-side-
    combined rollup (|bins| rows) → cumulative window OVER THE ROLLUP
    (scale-ok: input is the bounded histogram, never the corpus; the
    binned_auc discipline) → one max aggregate. The decision flag stays
    in cross-multiplied integer space lifted to doubles only for the
    final comparison (n^3-scale products exceed int64)."""
    from pyspark.sql.window import Window

    two = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select(
            F.floor(F.col("value") * 1000).cast("bigint").alias("bin"),
            (F.col("event_type") == "view").cast("int").alias("is_a"),
        )
    )
    bins = two.groupBy("bin").agg(
        F.sum("is_a").cast("bigint").alias("c_a"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("c_b"),
    )
    # scale-ok: window over the |bins| histogram rollup, never the corpus
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        F.sum("c_a").over(w).alias("cum_a"),
        F.sum("c_b").over(w).alias("cum_b"),
    )
    totals = two.agg(
        F.sum("is_a").cast("bigint").alias("n_a"),
        F.sum(1 - F.col("is_a")).cast("bigint").alias("n_b"),
    )
    d = cum.crossJoin(F.broadcast(totals)).agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
        ).cast("bigint").alias("d_num"),
    )
    return d.select(
        "n_a",
        "n_b",
        "d_num",
        (
            1000000.0 * F.col("d_num") * F.col("d_num")
            > 1844164.0 * (F.col("n_a") + F.col("n_b")) * F.col("n_a") * F.col("n_b")
        ).cast("int").alias("reject_05"),
        # on zero view/purchase events the global agg yields one all-NULL
        # row while the oracle's GROUP BY yields zero rows — align both
        # sides to zero rows on empty input (ADVICE r13)
    ).where(F.col("n_a").isNotNull())
