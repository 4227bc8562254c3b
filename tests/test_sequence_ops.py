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
