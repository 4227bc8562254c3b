"""Planted boundary fixtures for the round-6 deterministic watermark
oracles: events placed exactly at the wm1/wm2 band edges pin the <= / >
boundary conventions the oracles encode (an engine or corpus change that
shifts emission by one window must fail HERE, not just in the official
row)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd

from kinesis3_spark.queries.streamq import (
    _left_outer_attribution,
    stream_watermark_late_drop,
)
from kinesis3_spark.streaming import run_to_memory


def _events(rows):
    d = tempfile.mkdtemp(prefix="k3s_wmband_")
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(os.path.join(d, "events.parquet"))
    return d


def test_watermark_two_phase_bands(spark):
    """Even phase ends 10:00:00 -> wm1 = 09:30. Odd (late) rows:
    - window [09:00, 09:05) ends 09:05 <= wm1: DROPPED (window already
      emitted even-only);
    - window [09:40, 09:45) ends 09:45 in (wm1, wm2]: counted;
    - the odd max 11:00 puts wm2 at 10:30, so the even 09:57 row's window
      [09:55,10:00) emits and the 11:00 row's own window is withheld."""
    base = "2024-03-01 "
    rows = [
        # EVEN phase (event_id % 2 == 0)
        (0, pd.Timestamp(base + "09:02:00"), 1, "view", 1.0, "{}"),
        (2, pd.Timestamp(base + "09:41:00"), 1, "view", 1.0, "{}"),
        (4, pd.Timestamp(base + "09:57:00"), 1, "view", 1.0, "{}"),
        (6, pd.Timestamp(base + "10:00:00"), 1, "view", 1.0, "{}"),  # wm1=09:30
        # ODD phase (late arrivals)
        (1, pd.Timestamp(base + "09:03:00"), 1, "view", 1.0, "{}"),  # dropped
        (3, pd.Timestamp(base + "09:42:00"), 1, "view", 1.0, "{}"),  # counted
        (5, pd.Timestamp(base + "11:00:00"), 1, "view", 1.0, "{}"),  # wm2=10:30; own window withheld
    ]
    d = _events(rows)
    got = {
        (r.win_start, r.event_type): r.n
        for r in stream_watermark_late_drop(spark, d).collect()
    }
    assert got == {
        ("2024-03-01 09:00:00", "view"): 1,  # odd twin dropped
        ("2024-03-01 09:40:00", "view"): 2,  # odd twin counted (band)
        ("2024-03-01 09:55:00", "view"): 1,
        ("2024-03-01 10:00:00", "view"): 1,
        # 11:00 window withheld (> wm2)
    }


def test_left_outer_attribution_band(spark):
    """Unmatched purchases null-emit only at or below the min-side
    watermark: purchase 09:00 (no click) emits -1; purchase at 11:55
    (5 min before the purchase-side max, above wm) stays withheld;
    a matched pair emits regardless. Purchase EXACTLY AT the watermark
    (11:50 == min(max click, max purchase) - 10min) pins the oracle's
    INCLUSIVE `p.ts <= wm` convention (ADVICE r6): if a Spark upgrade
    turns outer-state eviction strict, this planted row fails first."""
    base = "2024-03-01 "
    rows = [
        (0, pd.Timestamp(base + "09:00:00"), 1, "purchase", 1.0, "{}"),  # unmatched, old -> emits -1
        (1, pd.Timestamp(base + "10:00:00"), 2, "click", 1.0, "{}"),
        (2, pd.Timestamp(base + "10:05:00"), 2, "purchase", 1.0, "{}"),  # matched pair
        (3, pd.Timestamp(base + "11:55:00"), 3, "purchase", 1.0, "{}"),  # unmatched, above wm -> withheld
        (4, pd.Timestamp(base + "12:00:00"), 4, "click", 1.0, "{}"),     # click max 12:00
        (5, pd.Timestamp(base + "12:00:00"), 5, "purchase", 1.0, "{}"),  # purchase max 12:00 -> wm 11:50
        (6, pd.Timestamp(base + "11:50:00"), 6, "purchase", 1.0, "{}"),  # unmatched, p.ts == wm exactly -> emits -1
    ]
    d = _events(rows)
    out = run_to_memory(_left_outer_attribution(spark, d), output_mode="append")
    got = {(r.user_id, r.purchase_id): r.click_id for r in out.collect()}
    assert got == {(1, 0): -1, (2, 2): 1, (6, 6): -1}


def test_full_outer_attribution_bands(spark):
    """Full-outer emission bands, both sides, with exact-boundary rows:
    wm = min(12:00, 12:00) - 10min = 11:50.
    - purchase side (inclusive p.ts <= wm, same convention as left outer):
      09:00 unmatched emits; 11:50 == wm emits; 11:55 withheld.
    - click side: unmatched click emits once its match window END
      (c.ts + 10min) is STRICTLY below wm (measured Spark 4.1.2
      convention — asymmetric with the purchase side's inclusive <=):
      09:30 (end 09:40) emits; 11:40 (end 11:50 == wm exactly) pins the
      strict boundary by staying WITHHELD; 11:45 (end 11:55 > wm)
      withheld.
    - a matched pair emits with both ids regardless of bands."""
    base = "2024-03-01 "
    rows = [
        (0, pd.Timestamp(base + "09:00:00"), 1, "purchase", 1.0, "{}"),  # unmatched p, old -> (-1 click)
        (1, pd.Timestamp(base + "10:00:00"), 2, "click", 1.0, "{}"),
        (2, pd.Timestamp(base + "10:05:00"), 2, "purchase", 1.0, "{}"),  # matched pair
        (3, pd.Timestamp(base + "09:30:00"), 3, "click", 1.0, "{}"),     # unmatched c, window end 09:40 -> emits
        (4, pd.Timestamp(base + "11:40:00"), 4, "click", 1.0, "{}"),     # window end == wm exactly -> WITHHELD (strict)
        (5, pd.Timestamp(base + "11:45:00"), 5, "click", 1.0, "{}"),     # window end 11:55 > wm -> withheld
        (6, pd.Timestamp(base + "11:50:00"), 6, "purchase", 1.0, "{}"),  # p.ts == wm exactly -> emits
        (7, pd.Timestamp(base + "11:55:00"), 7, "purchase", 1.0, "{}"),  # above wm -> withheld
        (8, pd.Timestamp(base + "12:00:00"), 8, "click", 1.0, "{}"),     # click max 12:00
        (9, pd.Timestamp(base + "12:00:00"), 9, "purchase", 1.0, "{}"),  # purchase max 12:00 -> wm 11:50
    ]
    d = _events(rows)
    from kinesis3_spark.queries.streamq import _full_outer_attribution

    out = run_to_memory(_full_outer_attribution(spark, d), output_mode="append")
    got = {(r.user_id, r.purchase_id, r.click_id) for r in out.collect()}
    assert got == {
        (1, 0, -1),   # old unmatched purchase
        (2, 2, 1),    # matched pair
        (3, -1, 3),   # old unmatched click
        (6, 6, -1),   # purchase at wm
    }


def test_statestore_reconciliation_planted(spark):
    """Pins the positional (count, sum) value-field assumption in the
    statestore reader query: planted per-type totals must come back
    exactly — if a Spark upgrade reorders the aggregation buffer layout,
    this fails in CI before the official row goes red."""
    from kinesis3_spark.queries.roundtrip import statestore_reconciliation

    base = "2024-03-01 "
    rows = [
        (0, pd.Timestamp(base + "09:00:00"), 1, "view", 1.5, "{}"),
        (1, pd.Timestamp(base + "09:01:00"), 1, "view", 2.25, "{}"),
        (2, pd.Timestamp(base + "09:02:00"), 2, "click", -0.5, "{}"),
    ]
    d = _events(rows)
    got = {
        r.event_type: (r.n, r.value_micro_sum)
        for r in statestore_reconciliation(spark, d).collect()
    }
    assert got == {"view": (2, 3_750_000), "click": (1, -500_000)}


def test_chained_join_window_band_planted(spark):
    """The chained join->window pipeline emits only windows closing under
    the min-side watermark: a planted pair in the final hour is withheld,
    an older pair emits."""
    from kinesis3_spark.queries.streamq import stream_chained_join_window_agg

    base = "2024-03-01 "
    rows = [
        (0, pd.Timestamp(base + "09:00:00"), 1, "click", 1.0, "{}"),
        (1, pd.Timestamp(base + "09:05:00"), 1, "purchase", 1.0, "{}"),  # old pair -> emits
        (2, pd.Timestamp(base + "17:55:00"), 2, "click", 1.0, "{}"),
        (3, pd.Timestamp(base + "17:58:00"), 2, "purchase", 1.0, "{}"),  # window [17:00,18:00) > wm -> withheld
        (4, pd.Timestamp(base + "18:00:00"), 3, "click", 1.0, "{}"),     # maxes: wm = 17:48
        (5, pd.Timestamp(base + "18:00:00"), 3, "purchase", 1.0, "{}"),
    ]
    d = _events(rows)
    got = {
        r.win_start: r.n_attributed
        for r in stream_chained_join_window_agg(spark, d).collect()
    }
    assert got == {"2024-03-01 09:00:00": 1}


def test_recursive_calendar_fills_silent_days(spark):
    """The recursive spine must surface days with ZERO events."""
    from kinesis3_spark.queries.relational3 import sql_recursive_calendar_counts

    rows = [
        (0, pd.Timestamp("2024-03-01 09:00:00"), 1, "view", 1.0, "{}"),
        (1, pd.Timestamp("2024-03-04 09:00:00"), 1, "view", 1.0, "{}"),
        (2, pd.Timestamp("2024-03-04 10:00:00"), 1, "view", 1.0, "{}"),
    ]
    d = _events(rows)
    got = {r.day: r.n for r in sql_recursive_calendar_counts(spark, d).collect()}
    assert got == {
        "2024-03-01": 1,
        "2024-03-02": 0,
        "2024-03-03": 0,
        "2024-03-04": 2,
    }


def test_timezone_rollup_dst_transition(spark):
    """The corpus' January window never crosses a DST edge, so pin the
    tzdb agreement where it bites: 2024-11-03 America/New_York falls back
    at 06:00 UTC (02:00 EDT -> 01:00 EST). Events straddling the
    transition must land on the same NY-local day on both engines."""
    import duckdb

    from kinesis3_spark.queries import ORACLE
    from kinesis3_spark.queries.scalar import scalar_timezone_daily_counts

    rows = [
        # UTC 03:59 Nov 3 = 23:59 Nov 2 EDT (-4) -> NY day Nov 2
        (0, pd.Timestamp("2024-11-03 03:59:00"), 1, "view", 1.0, "{}"),
        # UTC 04:01 Nov 3 = 00:01 Nov 3 EDT (-4) -> NY day Nov 3
        (1, pd.Timestamp("2024-11-03 04:01:00"), 1, "view", 1.0, "{}"),
        # UTC 05:30 Nov 3 = 01:30 EDT (first pass through 1am) -> Nov 3
        (2, pd.Timestamp("2024-11-03 05:30:00"), 1, "view", 1.0, "{}"),
        # UTC 06:30 Nov 3 = 01:30 EST (second pass, post-fallback) -> Nov 3
        (3, pd.Timestamp("2024-11-03 06:30:00"), 1, "view", 1.0, "{}"),
        # UTC 04:30 Nov 4 = 23:30 Nov 3 EST (-5 now) -> NY day Nov 3
        (4, pd.Timestamp("2024-11-04 04:30:00"), 1, "view", 1.0, "{}"),
        # UTC 05:30 Nov 4 = 00:30 Nov 4 EST -> NY day Nov 4
        (5, pd.Timestamp("2024-11-04 05:30:00"), 1, "view", 1.0, "{}"),
    ]
    d = _events(rows)
    got = {r.ny_day: r.n for r in scalar_timezone_daily_counts(spark, d).collect()}
    assert got == {"2024-11-02": 1, "2024-11-03": 4, "2024-11-04": 1}

    con = duckdb.connect()
    con.sql("SET TimeZone='Asia/Tokyo'")  # oracle must not care
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')"
    )
    want = {
        r[0]: r[2] for r in con.sql(ORACLE["scalar_timezone_daily_counts"]).fetchall()
    }
    assert want == got
