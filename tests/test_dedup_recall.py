"""LSH recall regression: the MinHash+LSH pipeline must find every pair
the exact inverted-index operator finds on the corpus (verified 25/25 at
sf0.01 and 256/256 at sf0.1 during round 2 — the banding parameters are
chosen for ~1e-4 miss probability at the 0.5 threshold)."""

from __future__ import annotations

from kinesis3_spark.operators import dedup as D
from kinesis3_spark.queries.relational import _t


def test_lsh_matches_exact_operator(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    exact = {(r.id_a, r.id_b) for r in D.ngram_jaccard_pairs(df).collect()}
    lsh = {(r.id_a, r.id_b) for r in D.minhash_lsh_pairs(df).collect()}
    assert lsh == exact


def test_capped_matches_exact_operator(spark, sf_dir):
    df = _t(spark, sf_dir, "documents")
    exact = {(r.id_a, r.id_b) for r in D.ngram_jaccard_pairs(df).collect()}
    capped = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs_capped(df, df_cap=100).collect()
    }
    assert capped == exact
