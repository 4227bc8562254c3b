"""Temporal join surface over the `events` stream table (SURVEY.md §2b
"range/interval join" and "as-of join" — ext rows motivated by
sessionization of the reference's event stream, db.clj:146-173).

Scale notes (100 TB):
  * The range join keeps an EQUI key (user_id) alongside the interval
    predicate, so Catalyst plans a hash/sort-merge join on user_id and
    evaluates the ts-interval as a post-join filter within each key group —
    never an all-pairs cross product. Event streams keyed by user are the
    partitioning that holds at scale (150 users/10k events at sf0.01 scales
    to per-user event counts, not per-user blowup).
  * The as-of join is NOT implemented as a join at all: a union of the two
    sides + one window pass (`last(value, ignorenulls=True)` over rows
    preceding) computes "latest left row ≤ right.ts" with a single shuffle
    on user_id and no join amplification — the classic scalable as-of shape
    (one sort per key group, no candidate explosion when a user has many
    matching left rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .relational import _t
from . import query


# --------------------------------------------------------------------------
# Range/interval join: for each error event, how many clicks the same user
# made in the preceding 5 minutes (strictly before the error).
# --------------------------------------------------------------------------
@query(
    "join_range_clicks_before_error",
    oracle="""
    SELECT e.event_id, COUNT(c.event_id) AS n_recent_clicks
    FROM events e
    LEFT JOIN events c
      ON c.user_id = e.user_id
     AND c.event_type = 'click'
     AND c.ts >= e.ts - INTERVAL 5 MINUTE
     AND c.ts <  e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    cond = (
        (F.col("c_user") == F.col("e_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("c_ts") < F.col("e_ts"))
    )
    return (
        e.join(c, cond, "left")
        .groupBy(F.col("e_id").alias("event_id"))
        .agg(F.count("c_id").alias("n_recent_clicks"))
    )


# --------------------------------------------------------------------------
# As-of join: for each purchase, the latest click by the same user at or
# before the purchase timestamp. Implemented join-free (union + window —
# see module docstring); the oracle is DuckDB's native ASOF LEFT JOIN.
# Only the matched click's ts is emitted (not its id), so simultaneous
# clicks at the best timestamp cannot introduce nondeterminism.
# --------------------------------------------------------------------------
@query(
    "join_asof_click_before_purchase",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           COALESCE(strftime(c.ts, '%Y-%m-%d %H:%M:%S'), '<NONE>') AS click_ts,
           COALESCE(datediff('second', c.ts, p.ts), -1) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("side"),  # clicks sort before purchases at equal ts (>= semantics)
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(None).cast("timestamp").alias("click_ts"), F.lit(1).alias("side")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases).withColumn(
        "asof_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return merged.where(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.coalesce(
            F.date_format("asof_click_ts", "yyyy-MM-dd HH:mm:ss"), F.lit("<NONE>")
        ).alias("click_ts"),
        F.coalesce(
            F.unix_timestamp("ts") - F.unix_timestamp("asof_click_ts"), F.lit(-1)
        ).cast("bigint").alias("gap_s"),
    )


@query(
    "sessionize_events_batch",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM o
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           count(*)::BIGINT AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM s GROUP BY user_id, session_idx
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts after
    a >30-minute silence; the session id is the running count of session
    starts per user. The streaming twin is `session_window`
    (queries/streamq.stream_sessions); this is the backfill/batch form a
    pipeline runs over historical data.

    One shuffle on user_id serves both window passes (lag + running sum
    share the partitioning and sort), then the session aggregate reuses
    the same partitioning — Catalyst plans a single Exchange."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | ((F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
        1,
    ).otherwise(0)
    s = ev.withColumn("new_s", new_s).withColumn(
        "session_idx",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id", F.col("session_idx").cast("bigint").alias("session_idx")).agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


# --------------------------------------------------------------------------
# Time-series gap fill + linear interpolation (resample-to-daily): the
# classic hypertable/time_bucket_gapfill + locf/interpolate operation.
# --------------------------------------------------------------------------
@query(
    "ts_gap_fill_interpolate",
    oracle="""
    WITH obs AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 1e6) AS BIGINT)) AS DOUBLE)
               / (1000000.0 * count(*)) AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM obs GROUP BY user_id),
    spine AS (
      SELECT user_id, CAST(u.d AS DATE) AS day
      FROM bounds, UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(d)
    ),
    j AS (
      SELECT s.user_id, s.day, o.v
      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.day = o.day
    ),
    fb AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        first_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
           CAST(floor((CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) * date_diff('day', pd, day)
                            / date_diff('day', pd, nd) END) * 1e6 + 0.5)
                AS BIGINT) AS value_micro,
           CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS interpolated
    FROM fb ORDER BY user_id, day
    """,
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample the event stream to a daily per-user series, fill calendar
    gaps, and linearly interpolate missing days between the surrounding
    observations (TimescaleDB's time_bucket_gapfill + interpolate shape;
    the reference's metrics tier only aggregates observed points).

    Scale shape: the raw stream collapses to (user, day) via ONE
    map-side-combined aggregate — the wide table never reaches the
    window. Each observed row then looks ONE observation ahead (lead) and
    emits days [day, next_day) by sequence()+explode, interpolating from
    its own (v, next_v) pair directly — no calendar spine relation, no
    spine⋈obs join, and no second traversal of the obs subtree (the
    first formulation derived spine bounds from a second obs reference;
    Spark re-planned the whole scan+aggregate per reference — the
    round-4 self-join-duplication lesson, confirmed by plan audit at 2x
    scan rows). Two exchanges total: the (user, day) aggregate and the
    user-keyed lead window; the explode is executor-side, bounded by the
    series' calendar span. Because emission stops at the NEXT observed
    day, every emitted gap day has both neighbors by construction — no
    extrapolation branch, and per-task state is O(1) beyond the sort."""
    ev = _t(spark, sf_dir, "events")
    # Daily mean via exact integer-micro sum (embed_l2_norm_stats
    # discipline): a float avg's cross-row addition order differs per
    # engine/partitioning, and the ±1-ulp noise surfaces at round-4
    # boundaries once it flows through the interpolation (3 rows at
    # sf0.01). Only exact integers cross partition boundaries; the
    # division is one deterministic scalar op on both engines.
    obs = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        (
            F.sum(F.floor(F.col("value") * 1e6).cast("bigint")).cast("double")
            / (1e6 * F.count("*"))
        ).alias("v")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    nxt = obs.withColumn("nd", F.lead("day").over(w)).withColumn(
        "nv", F.lead("v").over(w)
    )
    # Emit [day, next_day) per observed row (the final row emits itself):
    # every emitted day's interpolation neighbors are this row's (day, v)
    # and (nd, nv) — the left/right ignore-nulls window scans of the
    # spine formulation collapse into plain columns.
    fb = nxt.select(
        "user_id",
        "day",
        "v",
        "nd",
        "nv",
        F.explode(
            F.sequence(
                "day",
                F.coalesce(F.date_sub("nd", 1), F.col("day")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day_out"),
    )
    interp = F.col("v") + (F.col("nv") - F.col("v")) * F.datediff(
        "day_out", "day"
    ) / F.datediff("nd", "day")
    val = F.when(F.col("day_out") == F.col("day"), F.col("v")).otherwise(interp)
    return fb.select(
        "user_id",
        F.date_format("day_out", "yyyy-MM-dd").alias("day"),
        # floor(x*1e6 + 0.5), not round(x, 4): interpolated midpoints of
        # micro-exact daily means land EXACTLY on .00005 boundaries, where
        # Spark's decimal HALF_UP and a binary-double round() disagree
        # (5 rows at sf0.01). floor of identical IEEE doubles is bit-exact
        # on every engine — same fixed-point discipline as the embedding
        # norm/centroid queries.
        F.floor(val * 1e6 + 0.5).cast("bigint").alias("value_micro"),
        F.when(F.col("day_out") != F.col("day"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("interpolated"),
    ).orderBy("user_id", "day")


# --------------------------------------------------------------------------
# Longest consecutive-day activity streak per user (gaps-and-islands on the
# calendar instead of the clock — the retention metric next to
# cohort_weekly_retention).
# --------------------------------------------------------------------------
@query(
    "ts_longest_daily_streak",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      FROM days
    ),
    runs AS (
      SELECT user_id, grp, CAST(count(*) AS BIGINT) AS run_len
      FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           max(run_len) AS longest_streak,
           CAST(sum(run_len) AS BIGINT) AS n_active_days
    FROM runs GROUP BY user_id ORDER BY user_id
    """,
)
def ts_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user (day minus
    row_number is constant within a run — the classic islands key). Two
    data exchanges, both carrying (user, day) rows — never the raw
    stream: the distinct collapses map-side to its (user, day) exchange,
    the islands window re-keys on user alone, and BOTH rollups (runs by
    (user, grp), then per-user max) reuse the window's user partitioning
    with no further exchange — hashpartitioning(user) satisfies any
    user-prefixed grouping (executed-plan verified; the remaining
    exchange is the presentation sort)."""
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w))
    )
    runs = isl.groupBy("user_id", "grp").agg(F.count("*").alias("run_len"))
    return (
        runs.groupBy("user_id")
        .agg(
            F.max("run_len").alias("longest_streak"),
            F.sum("run_len").alias("n_active_days"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# GLOBAL interval join (no shared entity key): bucketize time so Catalyst
# gets an equi key — the standard rewrite that keeps a pure time-window
# theta join from planning as an all-pairs nested loop.
# --------------------------------------------------------------------------
@query(
    "join_interval_bucketed_global",
    oracle="""
    SELECT e.event_id, count(c.event_id)::BIGINT AS n_recent_clicks
    FROM events e
    LEFT JOIN events c
      ON c.event_type = 'click' AND c.ts < e.ts
     AND c.ts >= e.ts - INTERVAL 5 MINUTE
    WHERE e.event_type = 'error'
    GROUP BY e.event_id ORDER BY e.event_id
    """,
)
def join_interval_bucketed_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error, clicks from ANY user in the preceding 5 minutes —
    an interval join with NO entity equi key (join_range_clicks_before_error
    has user_id to hash on; here nothing). The naive plan is a nested-loop
    cross product over |errors|x|clicks|. The scale rewrite: bucket ts
    into window-sized (5 min) epochs; a click in bucket b can only
    precede-within-window an error in bucket b or b+1, so each click is
    EXPLODED to those two bucket keys and the join becomes an equi join
    on the bucket with the interval as a residual predicate. Each
    (click, error) candidate pair arises exactly once (the error's bucket
    is single-valued), so no post-dedup. Cost: 2x click rows shuffled on
    a key whose density is bounded by events-per-5-minutes — at 100 TB
    the bucket width tunes the shuffle-width vs candidates-per-bucket
    trade (same lever as the LSH band count, operators/dedup.py)."""
    ev = _t(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select(
        "event_id", F.col("ts").alias("e_ts"),
        F.floor(F.unix_timestamp("ts") / 300).alias("bk"),
    )
    clk = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("c_id"), F.col("ts").alias("c_ts"),
            F.floor(F.unix_timestamp("ts") / 300).alias("cb"),
        )
        .select(
            "c_id", "c_ts",
            F.explode(F.array(F.col("cb"), F.col("cb") + 1)).alias("bk"),
        )
    )
    residual = (F.col("c_ts") < F.col("e_ts")) & (
        F.col("c_ts") >= F.col("e_ts") - F.expr("INTERVAL 5 MINUTES")
    )
    joined = err.join(clk, ["bk"], "left").withColumn(
        "hit", F.when(residual, F.col("c_id"))
    )
    return (
        joined.groupBy("event_id")
        .agg(F.count("hit").alias("n_recent_clicks"))
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Point-in-time (feature-store) join: each label event gets the latest
# prior value of K feature streams, leakage-free. K features = K columns
# in ONE union+window pass — not K as-of joins.
# --------------------------------------------------------------------------
@query(
    "join_pointintime_features",
    oracle="""
    SELECT p.event_id, p.user_id,
           round(coalesce(c.value, -1), 2) AS last_click_value,
           round(coalesce(v.value, -1), 2) AS last_view_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events
                    WHERE event_type = 'click' GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS value FROM events
                    WHERE event_type = 'view' GROUP BY user_id, ts) v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.event_id
    """,
)
def join_pointintime_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-store training join: for every purchase (label event),
    the latest click value and latest view value by the same user at or
    before the label timestamp — point-in-time correct (no feature
    leakage from the future). Generalizes `join_asof_click_before_purchase`
    to MULTIPLE feature streams with the same single-shuffle shape: union
    all sides tagged, one window sort per user, one `last(x,
    ignorenulls)` column PER FEATURE. K feature tables cost K columns in
    one pass — the K-way chain of as-of joins the oracle runs would be K
    shuffles and K sorts, which is exactly what kills point-in-time joins
    at 100 TB feature-platform scale.

    Ties: a feature at exactly the label ts counts (>= semantics) — the
    side tag sorts features before labels at equal ts. Same-(user, ts)
    duplicate feature rows are collapsed (max) BEFORE the pass, because
    an as-of pick among equal-ts rows is engine-arbitrary."""
    ev = _t(spark, sf_dir, "events")

    def feat(tp: str, col: str):
        # collapse same-(user, ts) duplicates FIRST (max value) so the
        # as-of pick under timestamp ties is deterministic on every
        # engine — DuckDB's ASOF chooses arbitrarily among equal-ts rows
        # (the reason join_asof_click_before_purchase emits only the ts)
        return (
            ev.where(F.col("event_type") == tp)
            .groupBy("user_id", "ts")
            .agg(F.max("value").alias(col))
            .select(
                "user_id", "ts",
                F.lit(None).cast("long").alias("event_id"),
                F.col(col) if col == "click_v" else F.lit(None).cast("double").alias("click_v"),
                F.col(col) if col == "view_v" else F.lit(None).cast("double").alias("view_v"),
                F.lit(0).alias("side"),
            )
        )

    labels = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("double").alias("click_v"),
        F.lit(None).cast("double").alias("view_v"),
        F.lit(1).alias("side"),
    )
    merged = feat("click", "click_v").unionByName(feat("view", "view_v")).unionByName(labels)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("side"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = merged.withColumn(
        "last_click_value", F.last("click_v", ignorenulls=True).over(w)
    ).withColumn("last_view_value", F.last("view_v", ignorenulls=True).over(w))
    return (
        out.where(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.round(F.coalesce("last_click_value", F.lit(-1)), 2).alias(
                "last_click_value"
            ),
            F.round(F.coalesce("last_view_value", F.lit(-1)), 2).alias(
                "last_view_value"
            ),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# OHLC downsampling: the TimescaleDB/financial candlestick rollup — per
# (event_type, 15-min bucket): open/close = first/last value in event-time
# order, high/low = min/max. The continuous-aggregate staple for metric
# dashboards.
# --------------------------------------------------------------------------
@query(
    "ts_ohlc_downsample",
    oracle="""
    WITH b AS (
      SELECT event_type,
             time_bucket(INTERVAL '15 minutes', ts) AS bucket,
             value, ts, event_id
      FROM events
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(floor(max(CASE WHEN rn_a = 1 THEN value END) * 1e6) AS BIGINT)
             AS open_micro,
           CAST(floor(max(value) * 1e6) AS BIGINT) AS high_micro,
           CAST(floor(min(value) * 1e6) AS BIGINT) AS low_micro,
           CAST(floor(max(CASE WHEN rn_d = 1 THEN value END) * 1e6) AS BIGINT)
             AS close_micro
    FROM r
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def ts_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (open/high/low/close) downsampling per (event_type, 15-min
    bucket): open/close via `min_by`/`max_by` keyed on the (ts, event_id)
    struct — tie-safe by construction (equal timestamps break on the
    unique event id; DuckDB's arg_min/arg_max over a ROW key applies the
    identical order), high/low are plain min/max. Values quantize to
    integer micros per the float-parity discipline (floor of identical
    IEEE doubles is bit-exact; min/max/first/last never ADD floats, so
    no cross-row summation risk at all).

    Scale: ONE map-side-combined aggregate — OHLC state per group is four
    scalars plus the two (ts,id) argmin/argmax keys, all algebraic and
    mergeable, so the exchange carries |types × buckets| rows. This is
    the continuous-aggregate rollup shape `stream_continuous_rollup`
    materializes incrementally; here it is the batch/backfill form."""
    ev = _t(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    micro = lambda c: F.floor(c * 1e6).cast("bigint")  # noqa: E731
    return (
        ev.select(
            "event_type",
            F.window("ts", "15 minutes").start.alias("bucket_ts"),
            "value",
            key.alias("k"),
        )
        .groupBy("event_type", "bucket_ts")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            micro(F.min_by("value", F.col("k"))).alias("open_micro"),
            micro(F.max("value")).alias("high_micro"),
            micro(F.min("value")).alias("low_micro"),
            micro(F.max_by("value", F.col("k"))).alias("close_micro"),
        )
        .select(
            "event_type",
            F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            "n",
            "open_micro",
            "high_micro",
            "low_micro",
            "close_micro",
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    c AS (SELECT * FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id,
           CAST(min(abs(epoch_us(p.ts) - epoch_us(c.ts))) AS BIGINT)
             AS nearest_dt_us
    FROM p JOIN c ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 10 MINUTE
                  AND p.ts + INTERVAL 10 MINUTE
    GROUP BY 1, 2 ORDER BY p.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'): for
    each purchase, the microsecond distance to the CLOSEST click by the
    same user within ±10 minutes — before or after. Join-free like the
    backward as-of: one union, one user-keyed sort, last-before and
    first-after picked by two frames over the SAME window order, nearest
    = least of the two. The global nearest click is necessarily one of
    those two rows, so no candidate set ever materializes — while the
    oracle pays the explicit ±tolerance range join. Only the distance is
    emitted (integer micros — tie-free and hash-exact even when several
    clicks share it)."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("c_ts"),
        F.lit(0).alias("side"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("timestamp").alias("c_ts"),
        F.lit(1).alias("side"),
    )
    order = [F.asc("ts"), F.asc("side")]
    wprev = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wnext = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    merged = (
        clicks.unionByName(purchases)
        .withColumn("prev_ts", F.last("c_ts", ignorenulls=True).over(wprev))
        .withColumn("next_ts", F.first("c_ts", ignorenulls=True).over(wnext))
    )
    big = F.lit(1 << 62)
    d_prev = F.coalesce(
        F.unix_micros("ts") - F.unix_micros("prev_ts"), big
    )
    d_next = F.coalesce(
        F.unix_micros("next_ts") - F.unix_micros("ts"), big
    )
    tol_us = 10 * 60 * 1_000_000
    return (
        merged.where(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            F.least(d_prev, d_next).cast("bigint").alias("nearest_dt_us"),
        )
        .where(F.col("nearest_dt_us") <= tol_us)
        .orderBy("event_id")
    )
