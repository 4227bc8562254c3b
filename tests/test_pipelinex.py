"""Planted-fixture semantics for the composed corpus-prep pipeline: each
stage must drop exactly the documents planted to trip it, and the
decontam-before-dedup reorder (queries/pipelinex.py) must keep the
fingerprint group's min-doc_id survivor. The oracle-parity test proves
set equality on the real corpus; this pins WHICH stage owns each drop."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

GOOD = (
    "the " + " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
)  # 37 tokens, has ' the ', distinct-heavy, word lengths 5-7


def _doc(doc_id, source, text):
    return (doc_id, text, "en", source, len(text))


@pytest.fixture(scope="module")
def planted_dir(spark):
    rows = [
        # bench slice: one doc whose 13-grams poison matching corpus docs
        _doc(0, "src0", GOOD),
        # clean survivors in two sources
        _doc(10, "srcA", GOOD.replace("alpha", "delta")),
        _doc(11, "srcA", GOOD.replace("alpha", "epsil")),
        # exact duplicates: min doc_id (20) must survive, 21/22 drop
        _doc(20, "srcB", GOOD.replace("alpha", "zetaa")),
        _doc(21, "srcB", GOOD.replace("alpha", "zetaa")),
        _doc(22, "srcB", GOOD.replace("alpha", "zetaa")),
        # contaminated: shares the bench doc's text verbatim
        _doc(30, "srcA", GOOD),
        # quality failures: too short / no stopword
        _doc(40, "srcB", "tiny text"),
        _doc(41, "srcB", GOOD.replace("the ", "", 1)),
    ]
    d = tempfile.mkdtemp(prefix="k3s_planted_")
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    # single file per table, mirroring the corpus layout _t expects
    for t in ["documents"]:
        df.toPandas().to_parquet(os.path.join(d, f"{t}.parquet"))
    return d


def test_each_stage_owns_its_drop(spark, planted_dir):
    from kinesis3_spark.queries.pipelinex import pipeline_llm_corpus_prep

    out = pipeline_llm_corpus_prep(spark, planted_dir).collect()
    by_cell = {(r.source, r.split): r for r in out}
    kept_ids = set()
    for r in out:
        assert r.n_docs >= 1
    # reconstruct kept ids from the digests indirectly: re-run the stages'
    # expected survivors and check cell counts instead (digest is
    # oracle-tested); survivors should be exactly {10, 11, 20}
    total = sum(r.n_docs for r in out)
    assert total == 3, f"expected survivors 10,11,20 — got cells {by_cell.keys()}"
    srcA = sum(r.n_docs for r in out if r.source == "srcA")
    srcB = sum(r.n_docs for r in out if r.source == "srcB")
    assert srcA == 2  # 10, 11 kept; 30 decontaminated away
    assert srcB == 1  # 20 kept; 21/22 deduped; 40/41 quality-dropped


def test_dedup_keeps_min_doc_id_after_decontam_reorder(spark, planted_dir):
    """The reordered pipeline must keep doc 20 (min of the 20/21/22
    fingerprint group), matching the oracle's dedup-first order."""
    from kinesis3_spark.queries.pipelinex import pipeline_llm_corpus_prep
    import hashlib

    out = pipeline_llm_corpus_prep(spark, planted_dir)
    cells = {r.source: r for r in out.collect() if r.source == "srcB"}
    r = cells["srcB"]
    # picks_sum is the commutative set checksum: hash60("20") mod 1e9
    want = int(hashlib.md5(b"20").hexdigest()[:15], 16) % 1_000_000_000
    assert r.picks_sum == want


def test_dsir_importance_ranks_targetlike_docs_first(spark, tmp_path):
    """Planted DSIR fixture: raw docs sharing the target corpus's bigram
    vocabulary must outscore raw docs from a disjoint vocabulary — the
    importance weight is per hashed bigram bucket, add-one smoothed, so
    overlap dominates regardless of doc length; and within equal
    overlap, MORE matching grams scores strictly higher."""
    import kinesis3_spark.queries.decontam as D

    tgt = ["the quick brown fox jumps over the lazy dog"] * 4
    rows = (
        [(i, t, "en", D._DSIR_TARGET, len(t)) for i, t in enumerate(tgt)]
        # doc 100: pure target vocabulary, long (8 matching grams)
        + [(100, "the quick brown fox jumps over the lazy dog", "en", "src9", 44)]
        # doc 101: half target vocabulary (mixed)
        + [(101, "the quick brown tortoise crawls under a rock", "en", "src9", 44)]
        # doc 102: fully disjoint vocabulary
        + [(102, "zeta omega gamma delta epsilon iota kappa", "en", "src9", 41)]
    )
    import pandas as pd

    d = tmp_path / "sf"
    d.mkdir()
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(d / "documents.parquet"))
    out = {
        r["doc_id"]: r["score"]
        for r in D.llm_dsir_importance(spark, str(d)).collect()
    }
    assert set(out) == {100, 101, 102}
    assert out[100] > out[101] > out[102]
