"""A/B: llm_tfidf_top_terms scan-stage run-count tf (new, r15) vs the r14
explode + (doc,term) hash-agg exchange shape (old, inline).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis3_spark.functions.text import tokenize
from kinesis3_spark.queries.decontam import llm_tfidf_top_terms
from kinesis3_spark.queries.relational import _t


def old(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = d.count()
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 4),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf")
    )


def new(spark, sf_dir):
    return llm_tfidf_top_terms(spark, sf_dir)


VARIANTS = {"old": old, "new": new}
