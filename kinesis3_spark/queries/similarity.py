"""Similarity-search queries over the `embeddings` corpus table
(SURVEY.md §2b "similarity search"). Operators live in
kinesis3_spark/operators/similarity.py.

Top-k results emit only (query_id, rnk, neighbor_id) — ranks are stable
across engines because adjacent cosine gaps in the corpus are orders of
magnitude above double-summation noise, and ties break on neighbor_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity as S
from .relational import _t
from . import query

_K = 5
_N_QUERIES = 10  # query set = vec_id < 10
_NEARDUP_T = 0.45
_DIM = 64

_TOPK_ORACLE = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < {_N_QUERIES}),
    s AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             list_dot_product(q.v, e.v)
               / sqrt(list_dot_product(q.v, q.v) * list_dot_product(e.v, e.v)) AS c
      FROM q JOIN e ON e.vec_id <> q.vec_id
    )
    SELECT query_id, rnk, neighbor_id FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
      FROM s
    ) WHERE rnk <= {_K}
"""


def _query_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < _N_QUERIES)


@query("sim_cosine_topk_brute", oracle=_TOPK_ORACLE)
def topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = S.cosine_topk_bruteforce(emb, _query_set(spark, sf_dir), k=_K)
    return out.withColumnRenamed("rank", "rnk")


@query("sim_cosine_topk_pandas", oracle=_TOPK_ORACLE)
def topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    qpdf = _query_set(spark, sf_dir).select("vec_id", "embedding").toPandas()
    out = S.cosine_topk_pandas(emb, qpdf, k=_K)
    return out.withColumnRenamed("rank", "rnk")


# ANN scale path: rows-only (LSH candidate sets are seed-deterministic but
# not SQL-expressible; recall quality is pytest-asserted on planted
# high-similarity fixtures in tests/test_similarity.py).
@query("sim_cosine_topk_lsh", oracle=None)
def topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = S.cosine_topk_lsh(emb, _query_set(spark, sf_dir), dim=_DIM, k=_K)
    return out.withColumnRenamed("rank", "rnk")


# IVF scale path: rows-only (k-means cells aren't SQL-expressible);
# recall quality pytest-asserted on planted clusters in tests/test_similarity.py.
@query("sim_cosine_topk_ivf", oracle=None)
def topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = S.cosine_topk_ivf(emb, _query_set(spark, sf_dir), k=_K)
    return out.withColumnRenamed("rank", "rnk")


@query(
    "sim_embedding_neardup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
            / sqrt(list_dot_product(a.v, a.v) * list_dot_product(b.v, b.v))
          >= {_NEARDUP_T}
    """,
)
def neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_neardup_pairs(_t(spark, sf_dir, "embeddings"), _NEARDUP_T)


@query("ml_kmeans_embedding_clusters")  # rows-only: iterative, no SQL oracle
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding column via Spark MLlib (the idiomatic
    Spark path for iterative algorithms — Lloyd's iterations are driver-
    coordinated map-reduce passes; we do not hand-roll them). Returns one
    row per vector with its cluster id plus per-cluster sizes, so the
    rows-only oracle checks total assignment coverage.

    Scale: k-means|| init + per-iteration treeAggregate are linear scans;
    the model (k x dim doubles) broadcasts. The fixed seed pins init for
    reproducibility, not correctness (tests assert cluster-count and
    coverage invariants, not centroid values)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = KMeans(k=8, seed=42, maxIter=20).fit(emb)
    assigned = model.transform(emb).select(
        "vec_id", F.col("prediction").alias("cluster")
    )
    from pyspark.sql.window import Window

    return assigned.withColumn(
        "cluster_size",
        F.count("*").over(Window.partitionBy("cluster")).cast("bigint"),
    ).orderBy("vec_id")
