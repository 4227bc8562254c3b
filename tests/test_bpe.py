"""Planted-vocabulary test for the BPE merge loop (VERDICT r10 agenda
#2): on a corpus whose pair statistics are computed by hand, the loop
must reproduce the exact merge sequence — including the cross-round
behavior where round 2 merges a pair of MERGED symbols (the part a
single-round pair count can never exercise) and the greedy-left
non-overlap rule inside repeated-symbol words."""

from __future__ import annotations

import pandas as pd

from kinesis3_spark.queries import QUERIES


def _plant(tmp_path, texts):
    d = tmp_path / "sf"
    d.mkdir()
    rows = [
        (i, t, "en", "src0", len(t)) for i, t in enumerate(texts)
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    return str(d)


def test_bpe_merge_loop_planted_sequence(spark, tmp_path):
    """Corpus: 'abab' x3, 'abc' x2 (as whitespace tokens).

    Round 1 pairs: abab -> (a,b) x2 + (b,a) x1, weight 3; abc -> (a,b)
    + (b,c), weight 2. Totals: 'a b'=8, 'b a'=3, 'b c'=2 -> merge (a,b).
    Round 2: abab=(ab)(ab) -> 'ab ab'=3; abc=(ab)(c) -> 'ab c'=2
    -> merge (ab,ab) — a pair of symbols that only EXIST post-round-1.
    Round 3: abab fully merged (single symbol, no pairs); 'ab c'=2."""
    sf = _plant(
        tmp_path, ["abab abab", "abab", "abc abc"]
    )
    got = [
        (r["merge_round"], r["pair"], r["n"])
        for r in QUERIES["llm_bpe_merge_loop"](spark, sf).collect()
    ]
    assert got == [(1, "a b", 8), (2, "ab ab", 3), (3, "ab c", 2)]


def test_bpe_merge_is_greedy_left_nonoverlapping(spark, tmp_path):
    """'aaa' with winning pair (a,a) merges LEFT-first: (aa)(a), never
    (a)(aa) and never double-consuming the shared middle symbol — so
    round 2's pair over 'aaa' is ('aa','a'), and words fully merged
    drop out of later rounds instead of erroring on empty symbol
    lists."""
    # aaaa x5: round-1 pairs (a,a) x3, weight 5 -> 'a a'=15 + aaa x2
    # adds (a,a) x2, weight 2 -> total 19. Merge (a,a):
    #   aaaa -> (aa)(aa); aaa -> (aa)(a)   [greedy left]
    # round 2: 'aa aa'=5, 'aa a'=2 -> merge (aa,aa); aaaa -> (aaaa)
    # round 3: only aaa=(aa)(a) still has a pair -> 'aa a'=2
    sf = _plant(tmp_path, ["aaaa aaaa aaaa", "aaaa aaaa", "aaa aaa"])
    got = [
        (r["merge_round"], r["pair"], r["n"])
        for r in QUERIES["llm_bpe_merge_loop"](spark, sf).collect()
    ]
    assert got == [(1, "a a", 19), (2, "aa aa", 5), (3, "aa a", 2)]


def test_bpe_loop_stops_when_vocabulary_fully_merges(spark, tmp_path):
    """A corpus whose every word collapses before N rounds ends the
    loop early with the rounds that existed — no empty-argmax crash."""
    sf = _plant(tmp_path, ["ab ab ab"])
    got = [
        (r["merge_round"], r["pair"], r["n"])
        for r in QUERIES["llm_bpe_merge_loop"](spark, sf).collect()
    ]
    assert got == [(1, "a b", 3)]


def test_bpe_encode_corpus_counts(spark, tmp_path):
    """Encode stats on the planted corpus: 'abab' x3 + 'abc' x2, after
    merges (a,b), (ab,ab), (ab,c):
      abab -> (abab): 1 symbol (was 4 chars);  abc -> (abc): 1 (was 3)
    symbols_before = 3*4 + 2*3 = 18; symbols_after = 3 + 2 = 5;
    vocab_after = {abab, abc} = 2."""
    sf = _plant(tmp_path, ["abab abab", "abab", "abc abc"])
    rows = QUERIES["llm_bpe_encode_corpus"](spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_words"], r["word_occurrences"]) == (2, 5)
    assert (r["symbols_before"], r["symbols_after"]) == (18, 5)
    assert (r["merges_applied"], r["vocab_after"]) == (3, 2)


def test_bpe_oracles_match_spark_on_early_collapse(spark, tmp_path):
    """Review r11-2nd #2: the DuckDB oracles must agree with Spark even
    when the vocabulary fully merges before N rounds — the sentinel
    no-op round (pair = '', pattern '()()' unmatched) keeps the CTE
    chain alive where a bare CROSS JOIN against an empty argmax would
    empty it. Pins BOTH oracles against both queries on the collapsing
    corpus, value-for-value."""
    import duckdb

    from kinesis3_spark.queries import ORACLE

    sf = _plant(tmp_path, ["ab ab ab"])
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    for name in ("llm_bpe_merge_loop", "llm_bpe_encode_corpus"):
        s = QUERIES[name](spark, sf).toPandas()
        d = con.sql(ORACLE[name]).df()
        cols = sorted(s.columns)
        assert cols == sorted(d.columns), name
        got = sorted(map(tuple, s[cols].astype(str).values.tolist()))
        want = sorted(map(tuple, d[cols].astype(str).values.tolist()))
        assert got == want, (name, got, want)
    enc = QUERIES["llm_bpe_encode_corpus"](spark, sf).collect()[0]
    assert (enc["merges_applied"], enc["symbols_after"]) == (1, 3)


def _bpe_reference(texts, rounds):
    """Pure-Python BPE (Sennrich et al. 2016) on whitespace words:
    frequency-weighted adjacent pair counts over the word-frequency
    table, argmax with (count DESC, pair ASC) tie-break, greedy-left
    non-overlapping merge — the independent oracle the distributed
    implementation is propertied against."""
    import re
    from collections import Counter

    # EXACTLY the pipeline's gate: lowercase first (T.tokenize), then
    # ASCII ^[a-z0-9]+$ (review r11-4th #3: isalnum()+case-check diverged
    # on uppercase and non-ASCII tokens)
    freq = Counter(
        w for t in texts for w in (x.lower() for x in t.split())
        if len(w) >= 2 and re.fullmatch(r"[a-z0-9]+", w)
    )
    vocab = {w: [list(w), f] for w, f in freq.items()}
    merges = []
    for r in range(1, rounds + 1):
        pairs = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        merges.append((r, f"{a} {b}", n))
        for w, (syms, f) in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = [out, f]
    return merges, vocab


def test_bpe_loop_matches_pure_python_reference_on_random_corpora(
    spark, tmp_path
):
    """Property-style sweep: on randomized small corpora (letters a-d so
    pair collisions, ties, repeated symbols and full collapses all
    actually occur), the distributed merge loop must equal an
    independent pure-Python BPE — merge sequence AND final encoding
    stats. Seeded RNG: deterministic, no flaky shrinking."""
    import random

    rng = random.Random(1107)
    for case in range(8):
        n_docs = rng.randint(1, 6)
        texts = [
            " ".join(
                "".join(
                    rng.choice("abcdABé") for _ in range(rng.randint(1, 7))
                )
                for _ in range(rng.randint(1, 10))
            )
            for _ in range(n_docs)
        ]
        d = tmp_path / f"sf{case}"
        d.mkdir()
        import pandas as pd

        pd.DataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        ).to_parquet(str(d / "documents.parquet"))

        want_merges, want_vocab = _bpe_reference(texts, 3)
        got = [
            (r["merge_round"], r["pair"], r["n"])
            for r in QUERIES["llm_bpe_merge_loop"](spark, str(d)).collect()
        ]
        assert got == want_merges, (case, texts, got, want_merges)

        if not want_vocab:
            continue
        enc = QUERIES["llm_bpe_encode_corpus"](spark, str(d)).collect()[0]
        want_after = sum(len(s) * f for s, f in want_vocab.values())
        want_before = sum(len(w) * f for w, (_s, f) in want_vocab.items())
        want_vocab_n = len({t for s, _f in want_vocab.values() for t in s})
        assert enc["symbols_before"] == want_before, (case, texts)
        assert enc["symbols_after"] == want_after, (case, texts)
        assert enc["vocab_after"] == want_vocab_n, (case, texts)
        assert enc["merges_applied"] == len(want_merges), (case, texts)
