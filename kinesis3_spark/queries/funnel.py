"""Event-sequence analytics over the collector's event stream: ordered
funnel conversion and weekly cohort retention — the two canonical
product-analytics rollups a Kinesis event pipeline feeds (generalizing the
reference's per-type metrics surface, src/kinesis3/core.clj:74-86, to
cross-event-type sequence semantics).

Scale design (100 TB):

* Funnel: ONE shuffle keyed on user_id. Per-type timestamp arrays are
  built with conditional collect_list inside a single hash aggregate, and
  the ordered-stage logic (first view, first click AFTER it, first
  purchase after THAT) runs as array HOFs on the collapsed per-user row —
  no per-stage self-join, no re-shuffle per funnel step. Adding a funnel
  stage is an expression change, not a new exchange. Per-user state is
  that user's event timestamps for the funnel's types only; for
  pathological power users, pre-collapse to (user, type, hour) first —
  same plan shape.
* Cohort retention: two shuffles — per-user first-seen (agg by user_id),
  then the events⋈first-seen join lands on the SAME user_id partitioning
  (exchange reused) before the (cohort_week, week_offset) rollup, whose
  exchange carries |cohorts × offsets| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from .relational import _t
from . import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) FILTER (WHERE event_type = 'view') AS t1
      FROM events GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
      GROUP BY e.user_id
    )
    SELECT count(t1)::BIGINT AS users_view,
           (SELECT count(*) FROM s2)::BIGINT AS users_click,
           (SELECT count(*) FROM s3)::BIGINT AS users_purchase,
           CAST((SELECT count(*) FROM s3) AS DOUBLE) / count(t1) AS conversion
    FROM s1
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel in one hash aggregate: conditional
    collect_list per stage type, then array HOFs walk the stages on the
    collapsed per-user row (first view; first click strictly after it;
    first purchase strictly after that). The oracle expresses the same
    semantics as three correlated min-aggregations."""
    # Prune to the funnel's types BEFORE the aggregate: the predicate
    # pushes to the scan, and rows of other types never reach the shuffle.
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )

    def ts_of(t: str):
        # collect_list skips the CASE's NULLs, so only type-t timestamps
        # enter per-user state (map-side partial agg drops the rest).
        return F.collect_list(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        ts_of("view").alias("vs"), ts_of("click").alias("cs"), ts_of("purchase").alias("ps")
    )
    t1 = F.array_min("vs")
    t2 = F.array_min(F.filter(F.col("cs"), lambda c: c > F.col("t1")))
    t3 = F.array_min(F.filter(F.col("ps"), lambda p: p > F.col("t2")))
    stages = (
        per_user.withColumn("t1", t1).withColumn("t2", t2).withColumn("t3", t3)
    )
    return stages.agg(
        F.count("t1").cast("bigint").alias("users_view"),
        F.count("t2").cast("bigint").alias("users_click"),
        F.count("t3").cast("bigint").alias("users_purchase"),
        (F.count("t3").cast("double") / F.count("t1")).alias("conversion"),
    )


@query(
    "cohort_weekly_retention",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           (datediff('day', cohort_week, date_trunc('week', e.ts)) // 7)::BIGINT
             AS week_offset,
           count(DISTINCT e.user_id)::BIGINT AS active_users
    FROM events e JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort = Monday-truncated week of the user's first event; each
    (cohort, offset) cell counts the cohort's users active that week.
    Both engines truncate weeks to Monday and the offset is an exact
    integer division of whole days, so the matrix is engine-exact."""
    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    joined = ev.join(first_seen, "user_id")
    return (
        joined.select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "metrics_rolling_7d_dau",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    )
    SELECT strftime(d + i::INTEGER, '%Y-%m-%d') AS day,
           count(DISTINCT user_id)::BIGINT AS dau_7d
    FROM ud CROSS JOIN (SELECT unnest(range(7)) AS i)
    GROUP BY 1
    ORDER BY 1
    """,
)
def metrics_rolling_7d_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day — the rolling-distinct
    aggregate that a range-frame window CANNOT express scalably (distinct
    doesn't compose over sliding frames). Scalable rewrite: collapse to
    distinct (user, day) FIRST (the shuffle carries user-days, not raw
    events), then each user-day contributes to the 7 window-end days via a
    7-way sequence explode, and a count-distinct by window-end day
    finishes. Fan-out is a constant ×7 on the already-collapsed relation —
    at 100 TB the exchange carries |users × active days| rows, independent
    of per-day event volume."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "d",
    ).select("user_id", F.date_format(F.date_add(F.col("d"), F.col("i")), "yyyy-MM-dd").alias("day"))
    return (
        contrib.groupBy("day")
        .agg(F.count_distinct("user_id").cast("bigint").alias("dau_7d"))
        .orderBy("day")
    )


@query(
    "seq_event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY prev_type), 4)
             AS p
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    ORDER BY prev_type, next_type
    """,
)
def seq_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences
    (the sequence-mining summary behind next-event prediction and funnel
    discovery): count (prev → next) type pairs and the row-normalized
    transition probability. One user-keyed exchange for the lag window;
    the pair counts collapse map-side to ≤ |types|² rows, and the
    row-normalizing window runs on that tiny aggregate — the raw stream
    is shuffled once, exactly like the funnel/sessionization tier."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    wrow = Window.partitionBy("prev_type")
    return (
        counts.withColumn("p", F.round(F.col("n") / F.sum("n").over(wrow), 4))
        .orderBy("prev_type", "next_type")
    )
