"""A/B: search_bm25_prf tokenize-once persist (new, code as committed) vs
the r14 shape (old: 3 corpus tokenize passes), old body replicated inline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis3_spark.queries.search import (
    _PRF_EXPANSION,
    _PRF_FEEDBACK_DOCS,
    _QUERY_TERMS,
    bm25_scores,
    search_bm25_prf,
)
from kinesis3_spark.queries.relational import _t
from kinesis3_spark.functions.text import tokenize


def old(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_docs, avgdl = (
        d.select(F.size(tokenize(F.col("text"))).alias("dl"))
        .agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    st = (int(n_docs), float(avgdl) if avgdl is not None else 0.0)
    top = (
        bm25_scores(d, _QUERY_TERMS, stats=st)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_PRF_FEEDBACK_DOCS)
        .select("doc_id")
    )
    exp = (
        d.join(F.broadcast(top), "doc_id")
        .select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
        .where(~F.col("term").isin(*_QUERY_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(_PRF_EXPANSION)
        .select("term")
    )
    expanded = tuple(r.term for r in exp.collect()) + _QUERY_TERMS
    return (
        bm25_scores(d, expanded, stats=st)
        .select("doc_id", "bm25", "n_terms_hit")
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


def new(spark, sf_dir):
    return search_bm25_prf(spark, sf_dir)


VARIANTS = {"old": old, "new": new}
