"""Semantics tests for the round-11 extension operators: bigram-LM
perplexity scoring (CCNet-style), lexicon domain tagging, the epoch
reshuffle audit, and the JL random projection. Planted-data checks —
the differential oracle gate lives in test_oracle_parity.py."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kinesis3_spark.operators.similarity import jl_signs, random_project, squared_l2
from kinesis3_spark.queries.lmquality import (
    DOMAIN_LEXICON,
    LM_ADD_K,
    score_perplexity,
    tag_domains,
)


# --------------------------------------------------------------------------
# Perplexity scoring
# --------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_perplexity_in_distribution_beats_gibberish(spark):
    """A doc drawn from the training distribution must score a lower NLL
    than a doc of never-seen tokens (the CCNet keep/drop direction)."""
    train = [(i, "src0", "the cat sat on the mat and the cat ran") for i in range(5)]
    good = [(100, "srcX", "the cat sat on the mat")]
    bad = [(101, "srcX", "zyx qwv jkl pqr mno vwx")]
    scored = {
        r.doc_id: r.nll
        for r in score_perplexity(_docs(spark, train + good + bad)).collect()
    }
    assert scored[100] < scored[101]


def test_perplexity_matches_hand_computation(spark):
    """Exact add-k arithmetic on a 2-bigram doc: vocabulary V from the
    train slice, logp = ln((c_bg+k)/(c_ug+k*(V+1)))."""
    train = [(0, "src0", "a b a b a")]  # bigrams: ab x2, ba x2; unigrams a:3 b:2; V=2
    target = [(1, "srcX", "a b c")]  # bigrams: (a,b) seen, (b,c) unseen
    rows = score_perplexity(_docs(spark, train + target)).collect()
    assert len(rows) == 1 and rows[0].n_bigrams == 2
    k, v = LM_ADD_K, 2
    p_ab = (2 + k) / (3 + k * (v + 1))
    p_bc = (0 + k) / (2 + k * (v + 1))
    want = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert rows[0].nll == pytest.approx(want, abs=1e-12)


def test_perplexity_drops_short_and_train_docs(spark):
    rows = score_perplexity(
        _docs(spark, [(0, "src0", "a b c"), (1, "srcX", "solo"), (2, "srcX", "a b")])
    ).collect()
    assert [r.doc_id for r in rows] == [2]  # train doc and 1-token doc drop


# --------------------------------------------------------------------------
# Domain tagging
# --------------------------------------------------------------------------


def test_domain_tagging_argmax_tie_and_default(spark):
    d = _docs(
        spark,
        [
            (0, "s", "join merge hash filter"),  # joins 3 > queryops 1
            (1, "s", "join merge filter sort"),  # tie 2-2 -> alphabetical: joins
            (2, "s", "nothing matches here"),  # zero hits -> general
            (3, "s", "scan table column row part stream"),  # storage 5 > streaming 1
        ],
    )
    got = {r.doc_id: r.domain for r in tag_domains(d).collect()}
    assert got == {0: "joins", 1: "joins", 2: "general", 3: "storage"}


def test_domain_lexicon_terms_disjoint():
    all_terms = [t for terms in DOMAIN_LEXICON.values() for t in terms]
    assert len(all_terms) == len(set(all_terms))


# --------------------------------------------------------------------------
# Epoch reshuffle audit
# --------------------------------------------------------------------------


def test_epoch_shuffle_partitions_the_corpus(spark, sf_dir):
    from kinesis3_spark.queries import QUERIES
    from kinesis3_spark.queries.llmprep import EPOCH_SHARDS
    from kinesis3_spark.queries.relational import _t

    out = QUERIES["llm_epoch_shuffle_shards"](spark, sf_dir).collect()
    n_docs = _t(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in out) == n_docs  # every doc in exactly one shard
    assert {r.shard for r in out} <= set(range(EPOCH_SHARDS))
    # uniform hash => no shard dominates (loose 3x-mean bound)
    assert max(r.n_docs for r in out) <= 3 * n_docs / EPOCH_SHARDS


def test_epoch_order_changes_with_epoch_salt(spark):
    """Different epochs produce different per-shard membership (the whole
    point of reshuffling) while total membership is conserved."""
    from kinesis3_spark.operators.dedup import portable_hash60

    d = spark.range(200).select(F.col("id").alias("doc_id"))

    def shards(salt):
        k = portable_hash60(F.concat(F.lit(salt), F.col("doc_id").cast("string")))
        return {
            (r.doc_id, r.s)
            for r in d.select("doc_id", F.pmod(k, F.lit(8)).alias("s")).collect()
        }

    e1, e2 = shards("epoch1:"), shards("epoch2:")
    assert {x for x, _ in e1} == {x for x, _ in e2}
    assert e1 != e2  # some docs moved shards


# --------------------------------------------------------------------------
# JL random projection
# --------------------------------------------------------------------------


def test_random_project_matches_numpy(spark):
    rng = np.random.default_rng(7)
    X = rng.normal(size=(6, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    got = {
        r.vec_id: np.array(r.proj)
        for r in random_project(df, 64, 16).select("vec_id", "proj").collect()
    }
    R = np.array(jl_signs(16, 64))  # (16, 64)
    want = (X.astype(np.float64) @ R.T) * 0.25
    for i in range(len(X)):
        assert np.allclose(got[i], want[i], atol=1e-12)


def test_random_project_preserves_expected_norm(spark):
    """E[|y|^2] = |x|^2 for the scaled sign matrix — on a 64-dim unit-ish
    vector the projected squared norm should land within the JL band."""
    rng = np.random.default_rng(11)
    X = rng.normal(size=(40, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<float>",
    )
    out = (
        random_project(df, 64, 16)
        .select(
            squared_l2(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(0.0)] * 64),
            ).alias("n_orig"),
            squared_l2("proj", F.array(*[F.lit(0.0)] * 16)).alias("n_proj"),
        )
        .agg(F.avg(F.col("n_proj") / F.col("n_orig")).alias("mean_ratio"))
        .first()
    )
    assert 0.7 <= out.mean_ratio <= 1.3


# --------------------------------------------------------------------------
# PSI drift + streaming admission
# --------------------------------------------------------------------------


def test_psi_zero_for_identical_and_positive_for_shifted(spark):
    from kinesis3_spark.queries.dataquality import token_drift_psi

    same = "the cat sat on the mat " * 10
    shifted = "zebra quark lattice " * 20
    d = spark.createDataFrame(
        [(0, "src0", same), (1, "mirror", same), (2, "drifted", shifted)],
        "doc_id long, source string, text string",
    )
    got = {r.source: r.psi for r in token_drift_psi(d).collect()}
    assert got["src0"] == 0.0  # self-check row
    assert got["mirror"] == 0.0  # identical distribution
    assert got["drifted"] > 0.25  # 'shifted' band: all mass in (other)


def test_stream_admission_matches_batch_filter(spark, sf_dir):
    """Batch-split invariance end-to-end: the streamed admitted set must be
    exactly the batch scorer's kept set (same model, same threshold)."""
    from kinesis3_spark.queries import QUERIES
    from kinesis3_spark.queries.lmquality import (
        LM_NLL_KEEP,
        score_perplexity,
    )
    from kinesis3_spark.queries.relational import _t

    streamed = {
        (r.source, r.n_admitted)
        for r in QUERIES["stream_perplexity_admission"](spark, sf_dir).collect()
    }
    batch = (
        score_perplexity(_t(spark, sf_dir, "documents"))
        .where(F.col("nll") <= LM_NLL_KEEP)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert streamed == {(r.source, r.n) for r in batch}
