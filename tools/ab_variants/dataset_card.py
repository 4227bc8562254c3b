"""A/B: pipeline_dataset_card fused (lang, domain) rollup (new, r15) vs
the r14 3-pass shape (size+dup fused pass, lang pass, tag_domains domain
pass — replicated inline with the NEW scan-stage tag_domains so the diff
isolates the rollup fusion, not the domain rewrite).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis3_spark.functions import text as T
from kinesis3_spark.queries.lmquality import tag_domains
from kinesis3_spark.queries.pipelinex import pipeline_dataset_card
from kinesis3_spark.queries.relational import _t


def old(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = T.tokenize("text")
    fp = T.fingerprint(F.col("text"))
    size_dup_rows = docs.agg(
        F.count("*").cast("bigint").alias("docs"),
        F.sum(F.size(toks)).cast("bigint").alias("tokens"),
        (F.count("*") - F.count_distinct(fp)).cast("bigint").alias("dups"),
    ).select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("size").alias("section"),
                    F.lit("docs").alias("key"),
                    F.col("docs").alias("n"),
                ),
                F.struct(
                    F.lit("size").alias("section"),
                    F.lit("tokens").alias("key"),
                    F.col("tokens").alias("n"),
                ),
                F.struct(
                    F.lit("dedup").alias("section"),
                    F.lit("exact_dup_docs").alias("key"),
                    F.col("dups").alias("n"),
                ),
            )
        ).alias("r")
    ).select("r.section", "r.key", "r.n")
    lang_rows = docs.groupBy(F.col("lang").alias("key")).agg(
        F.count("*").cast("bigint").alias("n")
    ).select(F.lit("lang").alias("section"), "key", "n")
    domain_rows = tag_domains(docs).groupBy(F.col("domain").alias("key")).agg(
        F.count("*").cast("bigint").alias("n")
    ).select(F.lit("domain").alias("section"), "key", "n")
    return (
        size_dup_rows.unionByName(lang_rows)
        .unionByName(domain_rows)
        .orderBy("section", "key")
    )


def new(spark, sf_dir):
    return pipeline_dataset_card(spark, sf_dir)


VARIANTS = {"old": old, "new": new}
