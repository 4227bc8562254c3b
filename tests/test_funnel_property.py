"""Property test for the funnel's running-min window reduction: on random
small event sets — timestamps drawn from a tiny integer domain so
equal-ts collisions across types are COMMON — the one-shuffle cascade
must match a brute-force Python evaluation of the declared semantics
(t1 = min view ts; t2 = min click ts strictly after t1; t3 = min
purchase ts strictly after t2). This is the adversarial-tie coverage the
hand-planted fixtures can't enumerate."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # excluded by the -m 'not slow' quick path

import os
import tempfile

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

event = st.tuples(
    st.integers(min_value=1, max_value=3),          # user_id
    st.integers(min_value=0, max_value=5),          # ts seconds (ties likely)
    st.sampled_from(["view", "click", "purchase"]),
)


def _brute(rows):
    users = {}
    for uid, ts, typ in rows:
        users.setdefault(uid, []).append((ts, typ))
    a = b = c = 0
    for evs in users.values():
        t1 = min((t for t, y in evs if y == "view"), default=None)
        if t1 is None:
            continue
        a += 1
        t2 = min((t for t, y in evs if y == "click" and t > t1), default=None)
        if t2 is None:
            continue
        b += 1
        t3 = min((t for t, y in evs if y == "purchase" and t > t2), default=None)
        if t3 is not None:
            c += 1
    return a, b, c


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(event, min_size=1, max_size=12))
def test_funnel_matches_bruteforce(spark, rows):
    from kinesis3_spark.queries.funnel import funnel_view_click_purchase

    base = pd.Timestamp("2024-01-01")
    d = tempfile.mkdtemp(prefix="k3s_fprop_")
    pd.DataFrame(
        [
            (i, base + pd.Timedelta(seconds=ts), uid, typ, 1.0, "{}")
            for i, (uid, ts, typ) in enumerate(rows)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(os.path.join(d, "events.parquet"))
    r = funnel_view_click_purchase(spark, d).collect()[0]
    assert (r.users_view, r.users_click, r.users_purchase) == _brute(rows)


path_event = st.tuples(
    st.integers(min_value=1, max_value=2),           # user_id
    st.integers(min_value=0, max_value=30),          # ts hours (12h gap domain)
    st.sampled_from(["view", "click", "purchase"]),
)


def _brute_paths(rows):
    by_user = {}
    for i, (uid, hr, typ) in enumerate(rows):
        by_user.setdefault(uid, []).append((hr * 3600, i, typ))
    from collections import Counter

    paths = Counter()
    for evs in by_user.values():
        evs.sort()
        sessions, cur, prev = [], [], None
        for ts, _i, typ in evs:
            if prev is not None and ts - prev > 43200:
                sessions.append(cur)
                cur = []
            cur.append(typ)
            prev = ts
        sessions.append(cur)
        for sess in sessions:
            paths[">".join(sess[:8])] += 1
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return dict(top)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(st.lists(path_event, min_size=1, max_size=12))
def test_session_paths_match_bruteforce(spark, rows):
    from kinesis3_spark.queries.funnel import seq_topk_session_paths

    base = pd.Timestamp("2024-01-01")
    d = tempfile.mkdtemp(prefix="k3s_pprop_")
    pd.DataFrame(
        [
            (i, base + pd.Timedelta(hours=hr), uid, typ, 1.0, "{}")
            for i, (uid, hr, typ) in enumerate(rows)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(os.path.join(d, "events.parquet"))
    got = {r.path: r.n_sessions for r in seq_topk_session_paths(spark, d).collect()}
    assert got == _brute_paths(rows)
