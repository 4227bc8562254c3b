"""A/B: text_repetition_signals zero-shuffle sorted-run form (new, r15)
vs the r14 explode + two-exchange aggregation shape (old, inline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis3_spark.functions import text as T
from kinesis3_spark.functions.text import _let, ngram_hashes_from_tokens
from kinesis3_spark.queries.llmtext import repetition_signals
from kinesis3_spark.queries.relational import _t


def old(spark, sf_dir):
    def tagged(toks, n: int):
        return F.transform(
            ngram_hashes_from_tokens(toks, n),
            lambda h: F.struct(F.lit(n).alias("n"), h.alias("gh")),
        )

    empty = F.array().cast("array<struct<n:int,gh:bigint>>")
    grams = _let(
        T.tokenize("text"),
        lambda toks: F.when(
            F.size(toks) >= 3, F.concat(tagged(toks, 2), tagged(toks, 3))
        ).otherwise(empty),
    )
    ex = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(grams).alias("g"))
        .select("doc_id", F.col("g.n").alias("n"), F.col("g.gh").alias("gh"))
    )
    c = ex.groupBy("doc_id", "n", "gh").agg(F.count("*").alias("c"))
    two = F.col("n") == 2
    three = F.col("n") == 3
    return c.groupBy("doc_id").agg(
        F.max(F.when(two, F.col("c"))).cast("bigint").alias("top2_cnt"),
        F.sum(F.when(two, F.col("c"))).cast("bigint").alias("n2_grams"),
        F.count(F.when(two, F.lit(1))).cast("bigint").alias("distinct2"),
        F.coalesce(F.sum(F.when(three & (F.col("c") > 1), F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("dup3_cnt"),
        F.sum(F.when(three, F.col("c"))).cast("bigint").alias("n3_grams"),
    )


def new(spark, sf_dir):
    return repetition_signals(spark, sf_dir)


VARIANTS = {"old": old, "new": new}
