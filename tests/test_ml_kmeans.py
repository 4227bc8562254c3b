"""Invariants for the MLlib k-means operator (iterative — no per-cluster
SQL oracle): full assignment coverage, k clusters, determinism under the
fixed seed, plus the banded summary the registered query emits."""

from __future__ import annotations

from kinesis3_spark.queries import QUERIES
from kinesis3_spark.queries.similarity import kmeans_assignments


def test_kmeans_assignment_invariants(spark, sf_dir):
    p = kmeans_assignments(spark, sf_dir).toPandas()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(p) == n_vecs  # every vector assigned exactly once
    assert p["vec_id"].is_unique
    assert 1 <= p["cluster"].nunique() <= 8
    assert p["cluster"].between(0, 7).all()


def test_kmeans_deterministic_same_seed(spark, sf_dir):
    a = kmeans_assignments(spark, sf_dir).toPandas()
    b = kmeans_assignments(spark, sf_dir).toPandas()
    assert a.equals(b)


def test_kmeans_banded_summary(spark, sf_dir):
    row = QUERIES["ml_kmeans_embedding_clusters"](spark, sf_dir).collect()
    assert len(row) == 1
    r = row[0]
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert r.total_assigned == n_vecs
    assert r.distinct_vecs == n_vecs
    assert r.clusters_ok == 1 and r.coverage_ok == 1
