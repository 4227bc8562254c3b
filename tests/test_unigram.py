"""Planted-corpus pins for the unigram-LM tokenizer (train / encode /
fertility): oracle parity at two SFs is the hash gate; these pin the
SEMANTICS — min-pieces Viterbi, lattice usage counts, the MAXW/len-1
exclusions, and the DIV-discipline k extraction — on a corpus where the
right answer is hand-computable."""

from __future__ import annotations

import duckdb
import pytest

from kinesis3_spark.queries import ORACLE, QUERIES

from .conftest import assert_parity

# words: ab(f=3), cd(f=2), ef(f=1), abcdabcd(f=1);
# "x" (len 1) and the 34-char word are excluded by the shared filter.
_TEXT = (
    "ab ab ab cd cd ef abcdabcd "
    "verylongwordthatexceedsmaxw24chars x"
)


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("unigram"))
    spark.createDataFrame(
        [(1, _TEXT, "en", "web", len(_TEXT))],
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return d


def test_encode_min_pieces_and_div_extraction(spark, planted):
    """abcdabcd must encode as abcd+abcd (k=2 — the ONLY 2-piece split
    under LMAX=4), the three bigram words as one piece each; symbol and
    token totals follow exactly."""
    [row] = QUERIES["llm_unigram_encode_corpus"](spark, planted).collect()
    assert (
        row.n_words,
        row.word_occurrences,
        row.symbols_before,
        row.tokens_after,
        row.vocab_multi,
        row.compression_x10k,
    ) == (4, 7, 20, 8, 13, 4000)


def test_train_lattice_usage_counts(spark, planted):
    """Usage counts come from the optimal-path lattice: 'ab' earns only
    word 'ab' (f=3) — its occurrences inside abcdabcd sit on 3-piece
    paths, never the optimal 2-piece one; 'abcd' earns both positions of
    the one optimal path (2). Ties break piece-ascending."""
    rows = QUERIES["llm_unigram_train"](spark, planted).collect()
    got = [(r.piece, r.cnt, r.rank) for r in rows[:4]]
    assert got == [("ab", 3, 1), ("abcd", 2, 2), ("cd", 2, 3), ("ef", 1, 4)]
    # every remaining multi-char seed survives (prune keep > inventory)
    # with zero usage, ordered alphabetically
    assert [r.piece for r in rows[4:]] == sorted(r.piece for r in rows[4:])
    assert all(r.cnt == 0 for r in rows[4:])


def test_planted_oracle_parity_all_three(spark, planted):
    """The generated recursive-CTE oracle agrees on the planted corpus
    too (not just the driver tables) — including the exclusion edges."""
    con = duckdb.connect()
    try:
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{planted}/documents.parquet/*.parquet')"
        )
        for name in (
            "llm_unigram_train",
            "llm_unigram_encode_corpus",
            "llm_tokenizer_fertility",
        ):
            assert_parity(QUERIES[name](spark, planted), con, ORACLE[name])
    finally:
        con.close()
