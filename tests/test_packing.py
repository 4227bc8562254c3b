"""Sequence-packing invariants (operators/packing.py): conservation (every
doc in exactly one bin), budget respected except flagged oversize
singletons, determinism across runs, and FFD actually packing (bin count
well under one-doc-per-bin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis3_spark.operators.packing import bin_stats, pack_sequences

BUDGET = 100


def _fixture(spark):
    # 40 docs, sizes 5..83, plus two oversize docs (150, 999 tokens).
    rows = [(i, 5 + (i * 2)) for i in range(40)] + [(100, 150), (101, 999)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_conservation_and_budget(spark):
    df = _fixture(spark)
    packed = pack_sequences(df, BUDGET, num_groups=4).cache()
    try:
        # every doc assigned exactly once
        assert packed.count() == 42
        assert packed.select("doc_id").distinct().count() == 42
        # token totals conserved
        assert (
            packed.agg(F.sum("n_tokens")).first()[0]
            == df.agg(F.sum("n_tokens")).first()[0]
        )
        stats = bin_stats(packed)
        over = stats.where(F.col("bin_tokens") > BUDGET)
        # only oversize singletons may exceed budget, and only alone
        bad = over.where((F.col("oversize") != 1) | (F.col("n_docs") != 1))
        assert bad.count() == 0
        assert over.count() == 2  # the two planted oversize docs
    finally:
        packed.unpersist()


def test_deterministic(spark):
    df = _fixture(spark)
    a = sorted(pack_sequences(df, BUDGET, num_groups=4).collect())
    b = sorted(pack_sequences(df, BUDGET, num_groups=4).collect())
    assert a == b


def test_ffd_actually_packs(spark):
    df = _fixture(spark).where(F.col("n_tokens") <= BUDGET)
    stats = bin_stats(pack_sequences(df, BUDGET, num_groups=2))
    n_bins = stats.count()
    total = df.agg(F.sum("n_tokens")).first()[0]
    # lower bound: ceil(total/budget); FFD within 2 groups should be close.
    assert n_bins <= (total // BUDGET) + 2 + 2  # +2 slack per group
