"""Planted-frame pins for the round-13 analytics queries (KS,
conversion latency, contiguous pattern match): oracle parity is the
hash gate; these pin the SEMANTICS on constructed inputs where the
right answer is hand-computable."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kinesis3_spark.queries import QUERIES

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double",
    ).withColumn("props", F.lit("{}")).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    return d


def test_ks_identical_vs_shifted_distributions(spark, tmp_path):
    """Identical view/purchase samples → D = 0, no rejection; a gross
    location shift → large D, rejection at alpha=0.05."""
    base = [float(v) for v in range(1, 101)]
    same = [
        (i, T0, i, t, v / 10.0)
        for i, (t, v) in enumerate(
            [(t, v) for t in ("view", "purchase") for v in base]
        )
    ]
    [row] = QUERIES["stats_ks_two_sample"](
        spark, _write_events(spark, tmp_path / "a", same)
    ).collect()
    assert (row.n_a, row.n_b, row.d_num, row.reject_05) == (100, 100, 0, 0)

    shifted = [
        (i, T0, i, "view", v / 10.0) for i, v in enumerate(base)
    ] + [
        (1000 + i, T0, i, "purchase", v / 10.0 + 50.0)
        for i, v in enumerate(base)
    ]
    [row] = QUERIES["stats_ks_two_sample"](
        spark, _write_events(spark, tmp_path / "b", shifted)
    ).collect()
    # disjoint supports: D = 1, numerator n_a * n_b
    assert (row.d_num, row.reject_05) == (100 * 100, 1)


def test_time_to_convert_exact_percentiles(spark, tmp_path):
    """10 users converting in 10,20,...,100 s (one never-viewing buyer
    and one never-buying viewer excluded): exact lower-discrete
    percentiles p50=50, p90=90."""
    rows = []
    for u in range(1, 11):
        rows.append((u * 2, T0, u, "view", 1.0))
        rows.append((u * 2 + 1, T0 + dt.timedelta(seconds=10 * u), u, "purchase", 1.0))
    rows.append((100, T0, 50, "view", 1.0))       # never buys
    rows.append((101, T0, 51, "purchase", 1.0))   # never viewed
    [row] = QUERIES["funnel_time_to_convert"](
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert (row.n_converted, row.min_s, row.p50_s, row.p90_s, row.max_s) == (
        10, 10, 50, 90, 100,
    )


def test_contiguous_pattern_counts_motifs_not_subsequences(spark, tmp_path):
    """u1: v c c p (one contiguous match); u2: v e p (the running-min
    funnel would match this ORDERED subsequence, the contiguous motif
    must NOT); u3: v p v c p (two matches)."""
    seqs = {1: "vccp", 2: "vep", 3: "vpvcp"}
    rows = []
    eid = 0
    for u, s in seqs.items():
        for k, ch in enumerate(s):
            t = {"v": "view", "c": "click", "p": "purchase", "e": "error"}[ch]
            rows.append((eid, T0 + dt.timedelta(seconds=k), u, t, 1.0))
            eid += 1
    [row] = QUERIES["seq_pattern_contiguous_funnel"](
        spark, _write_events(spark, tmp_path, rows)
    ).collect()
    assert (row.n_users, row.n_matched_users, row.total_matches) == (3, 2, 3)


def test_ks_empty_input_returns_zero_rows(spark, tmp_path):
    """No view/purchase events at all → ZERO rows from both the Spark
    query and the oracle (ADVICE r13: the global agg's all-NULL row used
    to survive on the Spark side while the oracle's GROUP BY dropped it)."""
    rows = [(1, T0, 1, "error", 1.0), (2, T0, 2, "signup", 2.0)]
    df = QUERIES["stats_ks_two_sample"](
        spark, _write_events(spark, tmp_path, rows)
    )
    assert df.count() == 0


def test_image_phash_empty_document_parity(spark, tmp_path):
    """A corpus containing an empty-text document must not break phash
    parity (ADVICE r13: the oracle's px-derived totals dropped L=0 docs
    while Spark hashed them to all-zero bands). Two identical docs form
    the one expected pair; the empty doc hashes to bands [0,0,0,0] on
    BOTH sides and pairs with nothing within the Hamming threshold."""
    import duckdb

    from kinesis3_spark.queries import ORACLE
    from .conftest import assert_parity

    d = str(tmp_path)
    spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
            (2, "the quick brown fox jumps over the lazy dog", "en", "web", 44),
            (3, "", "en", "web", 0),
            (4, "a completely different document about spark physical plans "
                "and shuffle boundaries at petabyte scale", "en", "web", 100),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    con = duckdb.connect()
    try:
        con.sql(
            f"CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{d}/documents.parquet/*.parquet')"
        )
        df = QUERIES["dedup_image_phash"](spark, d)
        assert_parity(df, con, ORACLE["dedup_image_phash"])
        assert df.count() == 1  # exactly the identical pair (1, 2)
    finally:
        con.close()
