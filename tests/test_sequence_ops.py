"""Parameterized motif matcher (operators/sequence.py): the validator
must admit exactly the RE2-and-Java-identical subset, and the counter
must produce leftmost non-overlapping counts on planted sequences."""

from __future__ import annotations

import pytest

from kinesis3_spark.operators.sequence import user_motif_counts, validate_motif

AL = "cepsv"


@pytest.mark.parametrize(
    "pat",
    ["vc*p", "e[cv]*p", "v(c|e)+p", "s?vp", "vc{2,3}p", "v{2}", "(vc)*p"],
)
def test_validator_admits_subset(pat):
    assert validate_motif(pat, AL) == pat


@pytest.mark.parametrize(
    "pat",
    [
        "",  # empty
        "vx*p",  # literal outside alphabet
        "v.p",  # dot
        "v\\dp",  # escape
        "^vp",  # anchor
        "v[^c]p",  # negated class
        "v[a-z]p",  # range in class
        "v[]p",  # empty class
        "v[cp",  # unclosed class
        "v{,3}p",  # malformed bound
        "vc*+p",  # possessive quantifier (Java-only)
        "(?=v)p",  # lookaround
        "*vp",  # does not compile
        "c*",  # nullable: zero-width counting diverges across engines
        "(e|c)?",  # nullable via optional group
        "e*|c",  # nullable left alternative (the hypothesis-found case)
    ],
)
def test_validator_rejects_outside_subset(pat):
    with pytest.raises(ValueError):
        validate_motif(pat, AL)


def test_alphabet_metachar_collision():
    with pytest.raises(ValueError):
        validate_motif("ab", "a*b")


def _events(spark, rows):
    # rows: (user_id, ts-order, event_type)
    return spark.createDataFrame(
        [(u, float(t), t, et) for (u, t, et) in rows],
        "user_id long, ts double, event_id long, event_type string",
    )


def test_planted_counts_and_nonoverlap(spark):
    rows = (
        # user 1: v c c p v p  -> vc*p matches twice (vccp, vp)
        [(1, i, e) for i, e in enumerate(["view", "click", "click", "purchase", "view", "purchase"])]
        # user 2: v e p -> no vc*p (error breaks contiguity)
        + [(2, i, e) for i, e in enumerate(["view", "error", "purchase"])]
        # user 3: p v c -> order matters, no match
        + [(3, i, e) for i, e in enumerate(["purchase", "view", "click"])]
    )
    got = {
        r["user_id"]: r["n_matches"]
        for r in user_motif_counts(_events(spark, rows), "vc*p", AL).collect()
    }
    assert got == {1: 2, 2: 0, 3: 0}


def test_order_cols_break_ties(spark):
    # same ts, event_id decides: (v then p) vs (p then v)
    df = spark.createDataFrame(
        [(1, 0.0, 1, "view"), (1, 0.0, 2, "purchase"),
         (2, 0.0, 2, "view"), (2, 0.0, 1, "purchase")],
        "user_id long, ts double, event_id long, event_type string",
    )
    got = {
        r["user_id"]: r["n_matches"]
        for r in user_motif_counts(df, "vp", AL).collect()
    }
    assert got == {1: 1, 2: 0}


# ---------------------------------------------------------------------------
# Cross-engine property: for ANY pattern the validator admits, DuckDB
# (RE2), java.util.regex (Spark), and Python `re` must agree on the
# leftmost non-overlapping match COUNT for any subject string — the claim
# the oracle-parity of the motif queries rests on. Hypothesis drives the
# grammar; a divergence here means the validated subset must shrink.
# ---------------------------------------------------------------------------

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

_SYM = st.sampled_from(list(AL))


def _quantify(atom):
    return st.one_of(
        st.just(atom),
        st.just(atom + "*"),
        st.just(atom + "+"),
        st.just(atom + "?"),
        st.integers(0, 2).flatmap(
            lambda m: st.integers(m, m + 2).map(
                lambda n: atom + "{%d,%d}" % (m, n)
            )
        ),
    )


def _atoms(expr):
    cls = st.lists(_SYM, min_size=1, max_size=3, unique=True).map(
        lambda cs: "[" + "".join(cs) + "]"
    )
    group = expr.map(lambda e: "(" + e + ")")
    return st.one_of(_SYM, cls, group)


_EXPR = st.deferred(
    lambda: st.lists(
        _atoms(_EXPR).flatmap(_quantify), min_size=1, max_size=4
    ).map("".join)
)
_PATTERN = st.one_of(
    _EXPR, st.tuples(_EXPR, _EXPR).map(lambda t: t[0] + "|" + t[1])
)
_SUBJECT = st.text(alphabet=AL, min_size=0, max_size=18)


@settings(max_examples=300, deadline=None)
@given(pat=_PATTERN, seq=_SUBJECT)
def test_duckdb_re2_count_matches_python(pat, seq):
    import duckdb

    from hypothesis import assume

    # the grammar can produce nullable patterns; the validator rejects
    # those by design (zero-width counting diverges) — skip them here
    assume(not _re.fullmatch(pat, ""))
    validate_motif(pat, AL)  # non-nullable grammar output must validate
    py = len(_re.findall(pat, seq))
    [(dk,)] = duckdb.sql(
        "SELECT len(regexp_extract_all(?, ?))", params=[seq, pat]
    ).fetchall()
    assert dk == py, f"pattern {pat!r} on {seq!r}: duckdb {dk} vs python {py}"


def test_spark_java_count_matches_python_batch(spark):
    """One Spark job over a seeded sample of grammar patterns × subjects:
    java.util.regex (regexp_count) must agree with Python everywhere."""
    import random

    rng = random.Random(42)
    cases = []
    for pat in [
        "vc*p", "e[cv]*p", "v(c|e)+p", "s?vp", "vc{2,3}p", "(vc)*p",
        "c+", "v|p", "[cepsv]+", "(e|c)v{0,2}", "p+c?e*",
    ]:
        for _ in range(6):
            seq = "".join(rng.choice(AL) for _ in range(rng.randrange(0, 16)))
            cases.append((pat, seq, len(_re.findall(pat, seq))))
    df = spark.createDataFrame(cases, "pat string, seq string, py long")
    from pyspark.sql import functions as F2

    bad = (
        df.withColumn("jv", F2.regexp_count("seq", F2.col("pat")))
        .where(F2.col("jv") != F2.col("py"))
        .collect()
    )
    assert bad == [], bad


# ---------------------------------------------------------------------------
# MEASURES mode: positions/lengths/spans per match must equal a Python
# re.finditer reference on planted sequences (one symbol == one event).
# ---------------------------------------------------------------------------

from kinesis3_spark.operators.sequence import user_motif_measures


def _ev_df(spark, rows):
    # rows: (user_id, ts_sec, event_id, event_type)
    return spark.createDataFrame(
        [(u, float(t), eid, et) for (u, t, eid, et) in rows],
        "user_id long, ts double, event_id long, event_type string",
    )


def test_measures_positions_lengths_spans(spark):
    # user 1 sequence: v c c p v p  (ts = index * 10)
    names = {"v": "view", "c": "click", "p": "purchase", "e": "error"}
    seq1 = "vccpvp"
    rows = [(1, 10 * i, i, names[ch]) for i, ch in enumerate(seq1)]
    # user 2: no match
    rows += [(2, 0, 0, "purchase"), (2, 10, 1, "view")]
    out = user_motif_measures(_ev_df(spark, rows), "vc*p", AL).collect()
    got = {
        (r.user_id, r.match_no): (r.start_idx, r.match_len, r.t_start, r.t_end)
        for r in out
    }
    ref = {
        (1, i + 1): (m.start(), m.end() - m.start(),
                     float(10 * m.start()), float(10 * (m.end() - 1)))
        for i, m in enumerate(_re.finditer("vc*p", seq1))
    }
    assert got == ref  # {(1,1): (0,4,0,30), (1,2): (4,2,40,50)}
    assert not any(u == 2 for (u, _n) in got)


def test_measures_agree_with_finditer_random(spark):
    """Batch check over seeded random sequences: positions and lengths
    from the array-fold reconstruction == Python re.finditer for every
    match, for several motifs."""
    import random

    rng = random.Random(7)
    names = {"v": "view", "c": "click", "p": "purchase", "e": "error", "s": "signup"}
    cases = []
    uid = 0
    for pat in ["vc*p", "e[cv]*p", "v(c|e)+p", "[cepsv]{2,3}"]:
        for _ in range(8):
            seq = "".join(rng.choice(AL) for _ in range(rng.randrange(1, 15)))
            cases.append((uid, pat, seq))
            uid += 1
    for pat in sorted({p for _, p, _ in cases}):
        sub = [(u, s) for (u, p, s) in cases if p == pat]
        rows = [
            (u, float(3 * i), i, names[ch])
            for (u, s) in sub
            for i, ch in enumerate(s)
        ]
        out = user_motif_measures(_ev_df(spark, rows), pat, AL).collect()
        got = {
            (r.user_id, r.match_no): (r.start_idx, r.match_len)
            for r in out
        }
        ref = {}
        for (u, s) in sub:
            for i, m in enumerate(_re.finditer(pat, s)):
                ref[(u, i + 1)] = (m.start(), m.end() - m.start())
        assert got == ref, f"pattern {pat!r}"


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_motif_measures_query_oracle_parity(spark, sf):
    """Driver-style parity for the PENDING measures query (r15
    registration): Spark's array-fold position reconstruction must
    hash-match the DuckDB split/prefix-sum re-derivation on the real
    events table."""
    import duckdb

    from kinesis3_spark.queries.funnel import (
        _MEASURES_ORACLE,
        seq_motif_measures_q,
    )

    sf_dir = f"/root/testdata/{sf}"
    s = seq_motif_measures_q(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    d = con.sql(_MEASURES_ORACLE).df()
    assert len(s) == len(d) == 1
    assert sorted(s.columns) == sorted(d.columns)
    cols = sorted(s.columns)
    assert s[cols].astype(str).values.tolist() == d[cols].astype(str).values.tolist()
    assert int(s["total_matches"].iloc[0]) > 0
