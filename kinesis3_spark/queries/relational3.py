"""SQL-completeness fill-ins beyond the SURVEY.md §2b checklist rows:
pivot/unpivot, scalar subquery, ranking-distribution windows (ntile /
percent_rank / cume_dist), ordered string aggregation, filtered/boolean
aggregates, argmin/argmax, null-safe equality join, nth_value, and
explicit NULLS FIRST/LAST ordering.

These generalize the reference's relational surface (HoneySQL-generated
Postgres queries, reference src/kinesis3/db.clj:70-97) the same way §2b
does: each query is a DataFrame-API plan hash-checked against a DuckDB
oracle. All are single-shuffle (one groupBy or one window partition) or
broadcast-joined shapes that hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .relational import _t
from . import query


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COALESCE(round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0) AS st_open,
           COALESCE(round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0) AS st_filled,
           COALESCE(round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0) AS st_partial
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): revenue per priority × status. The value list is
    given explicitly, so Spark skips the extra distinct-values job and the
    plan is ONE hash aggregate with |values| conditional sums — identical
    shuffle profile to a plain groupBy at any scale."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("O", F.lit(0.0)).alias("st_open"),
        F.coalesce("F", F.lit(0.0)).alias("st_filled"),
        F.coalesce("P", F.lit(0.0)).alias("st_partial"),
    )


@query(
    "unpivot_lineitem_totals",
    oracle="""
    SELECT 'sum_qty' AS metric, round(sum(l_quantity), 2) AS val FROM lineitem
    UNION ALL
    SELECT 'sum_price', round(sum(l_extendedprice), 2) FROM lineitem
    UNION ALL
    SELECT 'sum_disc', round(sum(l_discount), 2) FROM lineitem
    UNION ALL
    SELECT 'sum_tax', round(sum(l_tax), 2) FROM lineitem
    """,
)
def unpivot_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) after aggregation: one scan + one global agg to a
    single row, then melt 4 columns to 4 (metric, val) rows. Aggregating
    BEFORE the unpivot keeps the melt driver-trivial at any scale — never
    unpivot the fact table itself when an aggregate is what's wanted."""
    li = _t(spark, sf_dir, "lineitem")
    wide = li.agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.sum("l_discount"), 2).alias("sum_disc"),
        F.round(F.sum("l_tax"), 2).alias("sum_tax"),
    )
    return wide.unpivot([], ["sum_qty", "sum_price", "sum_disc", "sum_tax"], "metric", "val")


@query(
    "subquery_scalar_above_1p5x_avg",
    oracle="""
    SELECT o_orderpriority,
           count(*)::BIGINT AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderpriority
    """,
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a WHERE clause. Catalyst plans the
    subquery as an independent 1-row aggregate broadcast into the main
    scan's filter — two passes over orders, no shuffle join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_orders_ss")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM _orders_ss
        WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM _orders_ss)
        GROUP BY o_orderpriority
        """
    )


@query(
    "win_ntile_pctrank_cumedist",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4)        OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    """,
)
def ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile/percent_rank/cume_dist in one window pass
    (single shuffle on the partition key, one in-partition sort). The order
    key is unique, so ranks are engine-independent."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "agg_listagg_nations",
    oracle="""
    SELECT n_regionkey::BIGINT AS n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey
    """,
)
def listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect_list is unordered in a
    distributed engine, so the deterministic form is array_sort before the
    join — safe only for bounded groups (25 nations; for unbounded groups
    cap with slice() or use a top-k window first)."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey")).agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@query(
    "agg_count_if_bools",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_totalprice > 200000)::BIGINT AS n_big,
           CAST(bool_or(o_totalprice > 400000) AS INT)  AS any_huge,
           CAST(bool_and(o_totalprice > 1000) AS INT)   AS all_above_floor
    FROM orders GROUP BY o_orderpriority
    """,
)
def count_if_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered count + boolean aggregates — the predicates fold into the
    same single hash aggregate as the groupBy (no extra pass per metric)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_or(F.col("o_totalprice") > 400000).cast("int").alias("any_huge"),
        F.bool_and(F.col("o_totalprice") > 1000).cast("int").alias("all_above_floor"),
    )


@query(
    "agg_argmax_customer",
    oracle="""
    SELECT c_mktsegment,
           round(max(c_acctbal), 2) AS top_bal,
           arg_max(c_name, CAST(round(c_acctbal * 100, 0) AS BIGINT) * 10000000 + c_custkey) AS top_name
    FROM customer GROUP BY c_mktsegment
    """,
)
def argmax_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/arg_max: richest customer per segment in ONE aggregate pass —
    the scalable replacement for the join-back-on-max or window-rank-1
    idioms (both need a second shuffle). The ordering key folds the
    tie-break (unique custkey) into one integer so every engine picks the
    same winner on equal balances."""
    c = _t(spark, sf_dir, "customer")
    key = (F.round(F.col("c_acctbal") * 100, 0).cast("bigint") * 10000000) + F.col("c_custkey")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.max("c_acctbal"), 2).alias("top_bal"),
        F.max_by("c_name", key).alias("top_name"),
    )


@query(
    "join_nullsafe_status_counts",
    oracle="""
    WITH d AS (
      SELECT nullif(o_orderstatus, 'P') AS st, count(*)::BIGINT AS n
      FROM orders GROUP BY nullif(o_orderstatus, 'P')
    )
    SELECT COALESCE(a.st, '<NULL>') AS st, a.n AS n_a, b.n AS n_b
    FROM d a JOIN d b ON a.st IS NOT DISTINCT FROM b.st
    """,
)
def nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys match
    each other instead of dropping out. Spark plans <=> as an ordinary
    equi-join key (nulls hash to one partition — salt if the null share is
    skewed at scale)."""
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.nullif("o_orderstatus", F.lit("P")).alias("st")).count()
    a = d.alias("a")
    b = d.alias("b")
    return a.join(b, F.col("a.st").eqNullSafe(F.col("b.st"))).select(
        F.coalesce(F.col("a.st"), F.lit("<NULL>")).alias("st"),
        F.col("a.count").alias("n_a"),
        F.col("b.count").alias("n_b"),
    )


@query(
    "win_nth_value_third",
    oracle="""
    SELECT DISTINCT c_mktsegment,
           nth_value(c_name, 3) OVER (
             PARTITION BY c_mktsegment
             ORDER BY c_acctbal DESC, c_custkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS third_name
    FROM customer
    """,
)
def nth_value_third(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value with an explicit full frame (the default frame stops at the
    current row, which would yield NULL for the first two rows). Unique
    tie-break key keeps the pick deterministic across engines."""
    c = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return c.select(
        "c_mktsegment", F.nth_value("c_name", 3).over(w).alias("third_name")
    ).distinct()


@query(
    "sort_nulls_last_top20",
    oracle="""
    SELECT COALESCE(nullif(o_orderstatus, 'P'), '<NULL>') AS st, o_orderkey
    FROM orders
    ORDER BY nullif(o_orderstatus, 'P') ASC NULLS LAST, o_orderkey
    LIMIT 20
    """,
)
def nulls_last_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS LAST ordering under a LIMIT (engines default
    differently: Spark sorts nulls first ASC, DuckDB last — the modifier
    makes the selected set identical). orderBy+limit plans as
    TakeOrderedAndProject: per-partition top-20 then a 20-row driver merge,
    never a global sort."""
    o = _t(spark, sf_dir, "orders")
    st = F.nullif("o_orderstatus", F.lit("P"))
    return (
        o.select(st.alias("st_raw"), "o_orderkey")
        .orderBy(F.col("st_raw").asc_nulls_last(), "o_orderkey")
        .limit(20)
        .select(F.coalesce("st_raw", F.lit("<NULL>")).alias("st"), "o_orderkey")
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery (SQL-surface completeness, Spark 4): top-N
# per group expressed the ANSI way. The DataFrame twin is the rank-window
# top-k (win_top3_orders_per_customer); registering the SQL form proves
# the engine's SQL dialect carries it too.
# --------------------------------------------------------------------------
@query(
    "sql_lateral_topn_per_nation",
    oracle="""
    SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name LIMIT 2
    ) t
    ORDER BY n.n_name, c_acctbal DESC, t.c_name
    """,
)
def sql_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 customers by balance per nation via a LATERAL correlated
    subquery — exercised through spark.sql so the SQL dialect surface is
    what's tested (Catalyst decorrelates it to the same rank-window /
    join shape as the DataFrame form; per-nation LIMIT keeps any plan's
    per-group state at k rows)."""
    import hashlib as _h

    tag = _h.md5(sf_dir.encode()).hexdigest()[:8]
    _t(spark, sf_dir, "nation").createOrReplaceTempView(f"nation_{tag}")
    _t(spark, sf_dir, "customer").createOrReplaceTempView(f"customer_{tag}")
    return spark.sql(
        f"""
        SELECT n.n_name, t.c_name, round(t.c_acctbal, 2) AS c_acctbal
        FROM nation_{tag} n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer_{tag} c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        ORDER BY n.n_name, c_acctbal DESC, t.c_name
        """
    )


@query(
    "sql_recursive_calendar_counts",
    oracle="""
    WITH RECURSIVE cal(d) AS (
      SELECT (SELECT min(CAST(ts AS DATE)) FROM events)
      UNION ALL
      SELECT d + 1 FROM cal
      WHERE d < (SELECT max(CAST(ts AS DATE)) FROM events)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(count(e.ed) AS BIGINT) AS n
    FROM cal LEFT JOIN (SELECT CAST(ts AS DATE) AS ed FROM events) e
      ON e.ed = cal.d
    GROUP BY d ORDER BY day
    """,
)
def sql_recursive_calendar_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE (Spark 4's WITH RECURSIVE — new SQL surface): build
    the complete business calendar from min to max event date by
    recursion, left-join daily event counts onto it so silent days
    appear as zero — the reporting-calendar query every dashboard runs.
    Both engines execute a genuine recursive CTE.

    Scale note: Spark's cteRecursionLevelLimit defaults to 100 levels —
    ample for this corpus' 30-day span, and the right guardrail for a
    recursion whose depth is calendar days; a multi-year calendar at
    100 TB should use the closed-form `sequence(min, max)` spine
    (ts_gap_fill_interpolate's path) rather than recursion. This row
    certifies the SQL surface, not the preferred spine construction."""
    # Prefixed view name: a session-global view named plain 'events' would
    # silently shadow any user table of that name (ADVICE r6); every other
    # registration in this file tags its views the same way.
    _t(spark, sf_dir, "events").createOrReplaceTempView("k3s_events_cal")
    return spark.sql("""
        WITH RECURSIVE cal(d) AS (
          SELECT (SELECT min(CAST(ts AS DATE)) FROM k3s_events_cal)
          UNION ALL
          SELECT date_add(d, 1) FROM cal
          WHERE d < (SELECT max(CAST(ts AS DATE)) FROM k3s_events_cal)
        )
        SELECT date_format(d, 'yyyy-MM-dd') AS day,
               CAST(count(e.ed) AS BIGINT) AS n
        FROM cal LEFT JOIN (SELECT CAST(ts AS DATE) AS ed FROM k3s_events_cal) e
          ON e.ed = cal.d
        GROUP BY d ORDER BY day
    """)


# --------------------------------------------------------------------------
# Bag-semantics set operations: INTERSECT ALL / EXCEPT ALL keep
# MULTIPLICITY (min / difference of per-value counts) — a different
# operator from the distinct-set forms setops_customer_keys certifies,
# and the one dedup accounting actually needs (how many duplicate
# occurrences survive, not which values).
# --------------------------------------------------------------------------
@query(
    "setops_bag_semantics",
    oracle="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 45),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_discount >= 0.10)
    SELECT 'intersect_all' AS op, COUNT(*)::BIGINT AS n
    FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'except_all' AS op, COUNT(*)::BIGINT AS n
    FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    UNION ALL
    SELECT 'a_multiset' AS op, COUNT(*)::BIGINT AS n FROM a
    UNION ALL
    SELECT 'b_multiset' AS op, COUNT(*)::BIGINT AS n FROM b
    """,
)
def setops_bag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both inputs are genuine multisets (a supplier ships many qualifying
    lines), so the ALL-variant counts differ from the distinct forms by
    construction — the a/b multiset sizes are emitted alongside to prove
    non-vacuity. Scale: Spark plans both as a single hash aggregation on
    (value, count) pairs per side + a count merge — one shuffle per
    side, same budget as the distinct forms."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_quantity") >= 45).select(F.col("l_suppkey").alias("k"))
    b = li.where(F.col("l_discount") >= 0.10).select(F.col("l_suppkey").alias("k"))

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("n")).select(
            F.lit(op).alias("op"), "n"
        )

    return (
        one("intersect_all", a.intersectAll(b))
        .unionByName(one("except_all", a.exceptAll(b)))
        .unionByName(one("a_multiset", a))
        .unionByName(one("b_multiset", b))
    )


# --------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL — the modern-dialect ergonomics (DuckDB
# pioneered it, Spark 4 adopted it): every non-aggregate select item
# becomes a grouping key. The oracle runs the IDENTICAL SQL text.
# --------------------------------------------------------------------------
_GBA_SQL = """
    SELECT event_type,
           date_format(ts, 'yyyy-MM') AS month,
           count(*) AS n,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM {events}
    GROUP BY ALL
    ORDER BY ALL
"""


@query(
    "sql_group_by_all_monthly",
    oracle=_GBA_SQL.replace("{events}", "events").replace(
        "date_format(ts, 'yyyy-MM')", "strftime(ts, '%Y-%m')"
    ).replace("count(*) AS n", "count(*)::BIGINT AS n"),
)
def sql_group_by_all_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialect-parity row: the SAME GROUP BY ALL / ORDER BY ALL text runs
    on both engines (only the date-format function name differs). The
    resolved plan is the ordinary hash aggregate — ALL is sugar, so the
    scale budget is exactly the explicit GROUP BY's."""
    ev = _t(spark, sf_dir, "events")
    ev.createOrReplaceTempView("k3s_events_gba")
    return spark.sql(
        _GBA_SQL.replace("{events}", "k3s_events_gba").replace(
            "count(*) AS n", "CAST(count(*) AS BIGINT) AS n"
        )
    )


@query(
    "win_range_interval_frame",
    oracle="""
    SELECT user_id, event_id,
           round(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w
                 AS DOUBLE)
                 / (count(*) OVER w) / 100.0, 4) AS avg_1h,
           CAST(count(*) OVER w AS BIGINT) AS n_1h
    FROM events
    WHERE user_id < 25
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def win_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE window frame (the sliding-lookback every
    sessionless rate/rolling-average monitor needs): per user, the
    trailing-1-hour mean event value at microsecond frame precision —
    rangeBetween over unix_micros(ts), the exact twin of SQL's RANGE
    BETWEEN INTERVAL. Summation is exact (integer cents accumulate, ONE
    double division at the end), so frame membership AND the average are
    hash-exact cross-engine. Scale: one (user) keyed shuffle; frames are
    bounded by event rate x window, never materialized."""
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 25)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.sum(cents).over(w).cast("double") / F.count("*").over(w) / 100.0, 4
        ).alias("avg_1h"),
        F.count("*").over(w).cast("bigint").alias("n_1h"),
    ).orderBy("user_id", "event_id")


@query(
    "agg_mode_quantity",
    oracle="""
    SELECT l_returnflag, mode_qty, n_mode FROM (
      SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS n_mode,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY count(*) DESC, l_quantity) AS rk
      FROM lineitem GROUP BY 1, 2
    ) WHERE rk = 1 ORDER BY l_returnflag
    """,
)
def agg_mode_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: the most frequent l_quantity per return flag,
    ties broken by the smallest value — spelled as count-rollup + argmax
    window rather than the engines' mode() builtins, whose tie rules
    differ (Spark's mode is non-deterministic on ties; pinning the
    tie-break makes the result hash-exact). Scale: one map-side-combined
    (flag, qty) rollup, then a window over |distinct qty| rows per flag
    — bounded by the value domain, never row count."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n_mode")
    )
    rk = F.row_number().over(
        Window.partitionBy("l_returnflag").orderBy(
            F.col("n_mode").desc(), "l_quantity"
        )
    )
    return (
        counts.withColumn("rk", rk)
        .where(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            "n_mode",
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_moments_exact",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             count(*)::BIGINT AS n,
             sum(l_quantity)::BIGINT AS s1,
             sum(l_quantity * l_quantity)::BIGINT AS s2,
             sum(l_quantity * l_quantity * l_quantity)::BIGINT AS s3,
             sum(l_quantity * l_quantity * l_quantity * l_quantity)::BIGINT AS s4
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           round((s2 * 1.0 / n) - (s1 * 1.0 / n) * (s1 * 1.0 / n), 6) AS var_pop,
           round(((s3 * 1.0 / n) - 3.0 * (s1 * 1.0 / n) * (s2 * 1.0 / n)
                  + 2.0 * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s1 * 1.0 / n))
                 / pow((s2 * 1.0 / n) - (s1 * 1.0 / n) * (s1 * 1.0 / n), 1.5), 6)
             AS skewness_pop,
           round(((s4 * 1.0 / n) - 4.0 * (s1 * 1.0 / n) * (s3 * 1.0 / n)
                  + 6.0 * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s2 * 1.0 / n)
                  - 3.0 * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s1 * 1.0 / n) * (s1 * 1.0 / n))
                 / pow((s2 * 1.0 / n) - (s1 * 1.0 / n) * (s1 * 1.0 / n), 2.0)
                 - 3.0, 6) AS excess_kurtosis
    FROM s ORDER BY l_returnflag
    """,
)
def agg_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population variance / skewness / excess kurtosis per return flag,
    computed from EXACT INTEGER power sums (l_quantity is integral, so
    sum x..sum x^4 accumulate exactly; the engines' own skewness()/
    kurtosis() builtins use different estimator conventions AND
    order-sensitive streaming moments — both problems vanish when the
    float math starts from identical integers). One map-side-combined
    aggregate; the moment algebra is a scan-free projection over
    |flags| rows."""
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(q).cast("bigint").alias("s1"),
        F.sum(q * q).cast("bigint").alias("s2"),
        F.sum(q * q * q).cast("bigint").alias("s3"),
        F.sum(q * q * q * q).cast("bigint").alias("s4"),
    )
    n = F.col("n").cast("double")
    m1 = F.col("s1") * 1.0 / n
    m2 = F.col("s2") * 1.0 / n
    m3 = F.col("s3") * 1.0 / n
    m4 = F.col("s4") * 1.0 / n
    var = m2 - m1 * m1
    return s.select(
        "l_returnflag",
        "n",
        F.round(var, 6).alias("var_pop"),
        F.round(
            (m3 - 3.0 * m1 * m2 + 2.0 * m1 * m1 * m1) / F.pow(var, 1.5), 6
        ).alias("skewness_pop"),
        F.round(
            (m4 - 4.0 * m1 * m3 + 6.0 * m1 * m1 * m2 - 3.0 * m1 * m1 * m1 * m1)
            / F.pow(var, 2.0)
            - 3.0,
            6,
        ).alias("excess_kurtosis"),
    ).orderBy("l_returnflag")
