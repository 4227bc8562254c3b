"""Planted-fixture tests for multi-touch attribution
(queries/funnel.py:multi_touch_attribution): hand-built event streams with
known first/last/linear credit, lookback-window and tie-break behavior."""

from __future__ import annotations

import datetime as dt

from kinesis3_spark.queries.funnel import multi_touch_attribution

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _ev(spark, rows):
    # rows: (event_id, minutes_offset, user_id, event_type, value)
    data = [
        (int(eid), T0 + dt.timedelta(minutes=m), int(u), et, float(v))
        for eid, m, u, et, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _by_channel(df):
    return {r.channel: r for r in df.collect()}

def test_single_touch_gets_full_credit_everywhere(spark):
    ev = _ev(spark, [(1, 0, 7, "view", 0.0), (2, 10, 7, "purchase", 10.00)])
    got = _by_channel(multi_touch_attribution(ev))
    assert set(got) == {"view"}
    r = got["view"]
    assert (r.first_touch_cents, r.last_touch_cents) == (1000, 1000)
    assert r.linear_millicents == 1000 * 1000
    assert r.n_touches == 1


def test_linear_split_and_first_last_models(spark):
    # view @0, click @5, view @9, purchase(30.00) @10 -> 3 touches.
    ev = _ev(
        spark,
        [
            (1, 0, 7, "view", 0.0),
            (2, 5, 7, "click", 0.0),
            (3, 9, 7, "view", 0.0),
            (4, 10, 7, "purchase", 30.00),
        ],
    )
    got = _by_channel(multi_touch_attribution(ev))
    # first touch: the @0 view; last touch: the @9 view.
    assert got["view"].first_touch_cents == 3000
    assert got["view"].last_touch_cents == 3000
    assert got["click"].first_touch_cents == 0
    assert got["click"].last_touch_cents == 0
    # linear: 3000 cents * 1000 DIV 3 = 1_000_000 millicents per touch.
    assert got["view"].linear_millicents == 2_000_000
    assert got["click"].linear_millicents == 1_000_000
    assert (got["view"].n_touches, got["click"].n_touches) == (2, 1)


def test_lookback_window_excludes_old_and_future_touches(spark):
    # touch 8 days before (outside 7d), touch after the purchase, touch at
    # the exact purchase ts (strict <) -> all excluded; one valid click.
    ev = _ev(
        spark,
        [
            (1, -8 * 24 * 60, 7, "view", 0.0),
            (2, -60, 7, "click", 0.0),
            (3, 0, 7, "view", 0.0),   # same instant as purchase: excluded
            (4, 0, 7, "purchase", 5.00),
            (5, 60, 7, "view", 0.0),  # after: excluded
        ],
    )
    got = _by_channel(multi_touch_attribution(ev))
    assert set(got) == {"click"}
    assert got["click"].n_touches == 1
    assert got["click"].first_touch_cents == 500


def test_other_users_touches_never_credited(spark):
    ev = _ev(
        spark,
        [
            (1, 0, 7, "view", 0.0),
            (2, 1, 8, "click", 0.0),  # different user
            (3, 10, 7, "purchase", 2.00),
        ],
    )
    got = _by_channel(multi_touch_attribution(ev))
    assert set(got) == {"view"}


def test_equal_ts_ties_break_on_event_id(spark):
    # Two touches at the same ts: event_id 1 (view) is first, 2 (click) last.
    ev = _ev(
        spark,
        [
            (1, 0, 7, "view", 0.0),
            (2, 0, 7, "click", 0.0),
            (3, 10, 7, "purchase", 4.00),
        ],
    )
    got = _by_channel(multi_touch_attribution(ev))
    assert got["view"].first_touch_cents == 400
    assert got["view"].last_touch_cents == 0
    assert got["click"].first_touch_cents == 0
    assert got["click"].last_touch_cents == 400
