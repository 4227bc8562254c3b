"""Property test for the full-outer stream-stream interval join's emission
bands: on random small click/purchase sets — minute-granularity timestamps
drawn from a tiny domain so exact-at-watermark collisions are COMMON — the
streaming drain must match a brute-force Python evaluation of the measured
Spark 4.1.2 semantics:

  wm           = min(max click ts, max purchase ts) - 10 min
                 (None if either side is empty: a silent side never
                 advances its watermark, so unmatched state never flushes)
  pair         : same user, c.ts in [p.ts - 10 min, p.ts)
  unmatched p  : no qualifying click anywhere AND p.ts <= wm   (inclusive)
  unmatched c  : no qualifying purchase AND c.ts + 10 min < wm (strict)

This is the adversarial-boundary coverage the hand-planted fixtures in
test_watermark_bands.py can't enumerate."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # excluded by the -m 'not slow' quick path

import os
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kinesis3_spark.streaming import run_to_memory

event = st.tuples(
    st.integers(min_value=1, max_value=3),            # user_id
    st.integers(min_value=0, max_value=25),           # ts minutes (ties likely)
    st.sampled_from(["click", "purchase"]),
)

LOOKBACK = 10  # minutes, matches _attribution_streams


def _brute(rows):
    clicks = [(i, u, t) for i, (u, t, y) in enumerate(rows) if y == "click"]
    purchases = [(i, u, t) for i, (u, t, y) in enumerate(rows) if y == "purchase"]
    out = set()
    for pi, pu, pt in purchases:
        for ci, cu, ct in clicks:
            if pu == cu and pt - LOOKBACK <= ct < pt:
                out.add((pu, pi, ci))
    if not clicks or not purchases:
        return out
    wm = min(max(t for _, _, t in clicks), max(t for _, _, t in purchases)) - LOOKBACK
    for pi, pu, pt in purchases:
        matched = any(
            cu == pu and pt - LOOKBACK <= ct < pt for _, cu, ct in clicks
        )
        if not matched and pt <= wm:
            out.add((pu, pi, -1))
    for ci, cu, ct in clicks:
        matched = any(
            pu == cu and pt - LOOKBACK <= ct < pt for _, pu, pt in purchases
        )
        if not matched and ct + LOOKBACK < wm:
            out.add((cu, -1, ci))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(event, min_size=1, max_size=10))
def test_full_outer_matches_bruteforce(spark, rows):
    from kinesis3_spark.queries.streamq import _full_outer_attribution

    base = pd.Timestamp("2024-01-01 09:00:00")
    d = tempfile.mkdtemp(prefix="k3s_foprop_")
    pd.DataFrame(
        [
            (i, base + pd.Timedelta(minutes=t), uid, typ, 1.0, "{}")
            for i, (uid, t, typ) in enumerate(rows)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(os.path.join(d, "events.parquet"))

    out = run_to_memory(_full_outer_attribution(spark, d), output_mode="append")
    got = {(r.user_id, r.purchase_id, r.click_id) for r in out.collect()}
    assert got == _brute(rows)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(event, min_size=1, max_size=10))
def test_right_outer_is_full_outer_minus_unmatched_purchases(spark, rows):
    """The RIGHT OUTER form must equal the brute-forced full-outer
    semantics with the unmatched-purchase band removed: pairs + strictly-
    evicted unmatched clicks, nothing else — the subset equivalence that
    makes the four-way matrix mutually consistent."""
    from kinesis3_spark.queries.streamq import _right_outer_attribution

    base = pd.Timestamp("2024-01-01 09:00:00")
    d = tempfile.mkdtemp(prefix="k3s_roprop_")
    pd.DataFrame(
        [
            (i, base + pd.Timedelta(minutes=t), uid, typ, 1.0, "{}")
            for i, (uid, t, typ) in enumerate(rows)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(os.path.join(d, "events.parquet"))

    out = run_to_memory(_right_outer_attribution(spark, d), output_mode="append")
    got = {(r.user_id, r.purchase_id, r.click_id) for r in out.collect()}
    want = {t for t in _brute(rows) if t[2] != -1}
    assert got == want
