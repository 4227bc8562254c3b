"""Invariants for the rows-only MLlib k-means query (no SQL oracle —
iterative algorithm): full assignment coverage, k clusters, per-cluster
sizes consistent, and determinism under the fixed seed."""

from __future__ import annotations

from kinesis3_spark.queries import QUERIES


def test_kmeans_assignment_invariants(spark, sf_dir):
    p = QUERIES["ml_kmeans_embedding_clusters"](spark, sf_dir).toPandas()
    n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(p) == n_vecs  # every vector assigned exactly once
    assert p["vec_id"].is_unique
    assert 1 <= p["cluster"].nunique() <= 8
    sizes = p.groupby("cluster")["vec_id"].count()
    for cl, sz in sizes.items():
        assert (p.loc[p.cluster == cl, "cluster_size"] == sz).all()


def test_kmeans_deterministic_same_seed(spark, sf_dir):
    a = QUERIES["ml_kmeans_embedding_clusters"](spark, sf_dir).toPandas()
    b = QUERIES["ml_kmeans_embedding_clusters"](spark, sf_dir).toPandas()
    assert a.equals(b)
