"""A/B: tag_domains scan-stage argmax (new, as committed r15) vs the r14
explode → broadcast-lexicon join → groupBy → window → join-back shape
(old, replicated inline). Timed via llm_domain_tagging's rollup; the same
operator also feeds pipeline_dataset_card's domain section.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis3_spark.functions import text as T
from kinesis3_spark.queries.lmquality import DOMAIN_LEXICON, llm_domain_tagging
from kinesis3_spark.queries.relational import _t


def _tag_domains_old(docs):
    spark = docs.sparkSession
    lex_rows = [
        (term, domain)
        for domain, terms in sorted(DOMAIN_LEXICON.items())
        for term in terms
    ]
    lexicon = F.broadcast(spark.createDataFrame(lex_rows, "term string, domain string"))
    hits = (
        docs.select("doc_id", F.explode(T.tokenize("text")).alias("term"))
        .join(lexicon, "term")
        .groupBy("doc_id", "domain")
        .agg(F.count("*").alias("hits"))
    )
    best = (
        hits.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("hits").desc(), F.col("domain")
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select("doc_id", "domain")
    )
    return docs.select("doc_id", "source").join(best, "doc_id", "left").select(
        "doc_id", "source", F.coalesce(F.col("domain"), F.lit("general")).alias("domain")
    )


def old(spark, sf_dir):
    tagged = _tag_domains_old(_t(spark, sf_dir, "documents"))
    return (
        tagged.groupBy("source", "domain")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("source", "domain")
    )


def new(spark, sf_dir):
    return llm_domain_tagging(spark, sf_dir)


VARIANTS = {"old": old, "new": new}
