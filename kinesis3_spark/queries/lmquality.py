"""Model-based corpus quality operators over `documents`: CCNet-style
bigram-LM perplexity filtering and broadcast-lexicon domain tagging.

Perplexity filtering is the canonical language-model quality gate from the
LLM-pretraining literature (CCNet, Wenzek et al. 2020: score every crawl
document under an LM trained on a trusted slice, keep the low-perplexity
tail). Here the "trusted slice" is the `src0` source and the LM is an
add-k-smoothed bigram model — the mechanism (train counts on a bounded
slice, join-score the full corpus, threshold) is exactly the production
shape; a KenLM swap changes only the scoring expression. The reference
collector (bcambel/kinesis3) has no training-data path; this extends the
SURVEY.md §2b LLM-pipeline mandate.

Domain tagging is the corpus-composition report every data card needs
(what fraction of the corpus is code / web / books / ...): a keyword
lexicon joined against the token stream, per-document argmax, per-source
composition rollup. The lexicon here is tiny and synthetic (the test
corpus is word soup) but the plan is the 100k-term production shape:
explode → broadcast equi-join → two keyed aggregations.

Scale notes:
  * LM training runs ONLY on the trusted slice (filter pushed to the
    scan), two map-side-combined aggregates. The model tables are bounded
    by the slice's vocabulary, not the corpus — CCNet's construction —
    and join the corpus bigram stream as equi-joins that AQE converts to
    broadcasts when they fit (same declarative discipline as
    decontam.decontaminate_grams; an adversarially large slice degrades
    to a shuffle hash join instead of OOMing the driver).
  * Scoring is one linear pass over corpus bigrams (explode in the scan
    stage, never materialized), then a doc-keyed and a source-keyed
    aggregation — two shuffles whose width is (doc_id, logp).
  * Domain tagging's lexicon is an explicit `F.broadcast` (it is
    model-config, bounded by construction); the per-doc argmax is a
    4-rows-per-doc window partitioned by doc_id, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import text as T
from .relational import _t
from . import query

# mirrors functions.text.tokenize (regexp edge-strip, not spaces-only trim)
_TOKS = "string_split_regex(regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g'), '\\s+')"

# LM hyperparameters: trusted slice, add-k constant, keep threshold.
# 3.64 splits the synthetic corpus ~50/50 at every test SF with the nearest
# document 1.7e-5 away from the boundary — 8 orders of magnitude above
# cross-engine float drift, so the kept-count is hash-stable.
LM_TRAIN_SOURCE = "src0"
LM_ADD_K = 0.5
LM_NLL_KEEP = 3.64


def _bigram_pairs(col) -> F.Column:
    """array<struct<prev,w>> of adjacent token pairs — tokenize once
    (let-bound, see functions.text._let), build pairs by index so no
    intermediate gram strings are allocated."""

    def build(toks):
        m = F.size(toks) - 1
        return F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                lambda i: F.struct(
                    F.element_at(toks, i.cast("int")).alias("prev"),
                    F.element_at(toks, (i + 1).cast("int")).alias("w"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<prev:string,w:string>>"))

    return T._let(T.tokenize(col), build)


def train_bigram_lm(docs: DataFrame, train_source: str = LM_TRAIN_SOURCE):
    """(bigram_counts, unigram_counts, vocab_size_df) from the trusted
    slice. vocab_size_df is a 1-row aggregate (joined back by broadcast)."""
    train = docs.where(F.col("source") == train_source)
    train_pairs = train.select(F.explode(_bigram_pairs(F.col("text"))).alias("bg"))
    bg_counts = train_pairs.groupBy(
        F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w")
    ).agg(F.count("*").alias("c_bg"))
    ug_counts = (
        train.select(F.explode(T.tokenize("text")).alias("prev"))
        .groupBy("prev")
        .agg(F.count("*").alias("c_ug"))
    )
    vocab = ug_counts.agg(F.count("*").alias("v"))
    return bg_counts, ug_counts, vocab


def score_docs_with_lm(
    docs: DataFrame,
    bg_counts: DataFrame,
    ug_counts: DataFrame,
    vocab: DataFrame,
) -> DataFrame:
    """Score `docs` under an ALREADY-TRAINED add-k bigram LM — the apply
    half, factored out so the streaming admission gate can train once
    (static) and score per micro-batch. Documents with <2 tokens have no
    bigrams and drop out (CCNet drops them too — nothing to score)."""
    pairs = docs.select(
        "doc_id",
        "source",
        F.explode(_bigram_pairs(F.col("text"))).alias("bg"),
    )
    smoothed = (
        F.coalesce(F.col("c_bg"), F.lit(0)) + F.lit(LM_ADD_K)
    ) / (F.coalesce(F.col("c_ug"), F.lit(0)) + F.lit(LM_ADD_K) * (F.col("v") + 1))
    return (
        pairs.select("doc_id", "source", F.col("bg.prev").alias("prev"), F.col("bg.w").alias("w"))
        .join(bg_counts, ["prev", "w"], "left")
        .join(ug_counts, ["prev"], "left")
        .join(F.broadcast(vocab))
        .select("doc_id", "source", F.log(smoothed).alias("logp"))
        .groupBy("doc_id", "source")
        .agg((-F.avg("logp")).alias("nll"), F.count("*").cast("bigint").alias("n_bigrams"))
    )


def score_perplexity(docs: DataFrame, train_source: str = LM_TRAIN_SOURCE) -> DataFrame:
    """Per-document average negative log-likelihood (nats/bigram) under the
    add-k bigram LM trained on `train_source`, for every doc OUTSIDE the
    training slice. avg NLL is monotone with perplexity (ppl = exp(nll));
    the exp is left to the caller so the filter threshold stays in
    ulp-stable log space."""
    bg_counts, ug_counts, vocab = train_bigram_lm(docs, train_source)
    return score_docs_with_lm(
        docs.where(F.col("source") != train_source), bg_counts, ug_counts, vocab
    )


# Shared oracle CTE: the DuckDB twin of train_bigram_lm + score_docs_with_lm
# (both registered LM queries derive from it, so the model definition can
# never drift between the batch filter and the streaming admission gate).
_SCORED_CTE = f"""
    WITH toksv AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
    bigrams AS (
      SELECT doc_id, source, t[i + 1] AS prev, t[i + 2] AS w
      FROM toksv, UNNEST(generate_series(0, greatest(len(t) - 2, -1))) AS u(i)
    ),
    bg AS (
      SELECT prev, w, count(*) AS c_bg FROM bigrams
      WHERE source = '{LM_TRAIN_SOURCE}' GROUP BY 1, 2
    ),
    ug AS (
      SELECT tok AS prev, count(*) AS c_ug
      FROM (SELECT unnest(t) AS tok FROM toksv WHERE source = '{LM_TRAIN_SOURCE}')
      GROUP BY 1
    ),
    v AS (SELECT count(*) AS v FROM ug),
    scored AS (
      SELECT b.doc_id, b.source,
             -avg(ln((coalesce(c_bg, 0) + {LM_ADD_K})
                     / (coalesce(c_ug, 0) + {LM_ADD_K} * (v + 1)))) AS nll
      FROM bigrams b
      LEFT JOIN bg ON b.prev = bg.prev AND b.w = bg.w
      LEFT JOIN ug ON b.prev = ug.prev
      CROSS JOIN v
      WHERE b.source <> '{LM_TRAIN_SOURCE}'
      GROUP BY 1, 2
    )
"""


@query(
    "llm_perplexity_filter",
    oracle=f"""
    {_SCORED_CTE}
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN nll <= {LM_NLL_KEEP} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           round(avg(nll), 2) AS avg_nll
    FROM scored GROUP BY source ORDER BY source
    """,
)
def llm_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity gate: per-source keep counts under the
    bigram-LM threshold + the mean NLL quality signal per source."""
    scored = score_perplexity(_t(spark, sf_dir, "documents"))
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("nll") <= LM_NLL_KEEP, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.round(F.avg("nll"), 2).alias("avg_nll"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Domain tagging: keyword lexicon → per-doc argmax domain → composition.
# --------------------------------------------------------------------------

# Domain → marker terms over the synthetic corpus vocabulary. Disjoint by
# construction (a production lexicon need not be — the argmax handles
# overlap); ties break alphabetically-first, zero hits → 'general', the
# same deterministic fold as functions.text.lang_id.
DOMAIN_LEXICON: dict[str, tuple[str, ...]] = {
    "joins": ("join", "merge", "hash", "key"),
    "queryops": ("filter", "sort", "agg", "group", "query", "order"),
    "storage": ("scan", "table", "column", "row", "part"),
    "streaming": ("stream", "window", "batch", "line"),
}


def tag_domains(docs: DataFrame) -> DataFrame:
    """(doc_id, source, domain): argmax lexicon-hit domain per document.

    Plan shape: token explode in the scan stage → broadcast equi-join on
    the term (the lexicon is model config, explicitly `F.broadcast`) →
    per-(doc, domain) count → per-doc argmax via a window over ≤|domains|
    rows, partitioned by doc_id (never global) → left join back so
    zero-hit documents tag 'general'.
    """
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


def _lexicon_values_sql() -> str:
    return ", ".join(
        f"('{term}', '{domain}')"
        for domain, terms in sorted(DOMAIN_LEXICON.items())
        for term in terms
    )


@query(
    "llm_domain_tagging",
    oracle=f"""
    WITH lexicon(term, domain) AS (VALUES {_lexicon_values_sql()}),
    toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    hits AS (
      SELECT doc_id, domain, count(*) AS hits
      FROM toks JOIN lexicon USING (term) GROUP BY 1, 2
    ),
    best AS (
      SELECT doc_id, domain FROM (
        SELECT doc_id, domain,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, domain) AS rk
        FROM hits
      ) WHERE rk = 1
    )
    SELECT d.source, coalesce(b.domain, 'general') AS domain,
           count(*)::BIGINT AS n_docs
    FROM documents d LEFT JOIN best b USING (doc_id)
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def llm_domain_tagging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition report: per-source document counts by argmax
    lexicon domain (the data-card breakdown a 100 TB corpus publishes)."""
    tagged = tag_domains(_t(spark, sf_dir, "documents"))
    return (
        tagged.groupBy("source", "domain")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("source", "domain")
    )


# --------------------------------------------------------------------------
# Streaming perplexity admission: the CCNet gate as a live ingest job.
# --------------------------------------------------------------------------

_STREAM_PPL_CACHE: dict[str, str] = {}


def _stream_ppl_materialize(spark: SparkSession, sf_dir: str) -> str:
    """Drain the document stream through the LM admission gate once per
    (process, sf_dir); returns the admitted-docs parquet path."""
    import os

    from .. import tmpdirs
    from ..streaming import stream_documents
    from ..streaming.run import await_or_raise

    path = _STREAM_PPL_CACHE.get(sf_dir)
    if path is not None and os.path.isdir(path):
        return path
    out = tmpdirs.mkdtemp(prefix="k3s_stream_ppl_") + "/admitted"
    ck = tmpdirs.mkdtemp(prefix="k3s_stream_ppl_ck_")
    # Train ONCE from the static trusted slice; a production job persists
    # these two tables and re-reads them, here they stay lazy DataFrames
    # re-joined per micro-batch (tiny at test SF).
    bg_counts, ug_counts, vocab = train_bigram_lm(_t(spark, sf_dir, "documents"))

    def admit_batch(bdf, batch_id: int) -> None:
        scored = score_docs_with_lm(
            bdf.where(F.col("source") != LM_TRAIN_SOURCE), bg_counts, ug_counts, vocab
        )
        (
            scored.where(F.col("nll") <= LM_NLL_KEEP)
            .select("doc_id", "source", "nll")
            .write.mode("append")
            .parquet(out)
        )

    q = (
        stream_documents(spark, sf_dir)
        .writeStream.foreachBatch(admit_batch)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    await_or_raise(q)
    _STREAM_PPL_CACHE[sf_dir] = out
    return out


@query(
    "stream_perplexity_admission",
    oracle=f"""
    {_SCORED_CTE}
    SELECT source,
           count(*)::BIGINT AS n_admitted,
           CAST(coalesce(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                             % 1000000000), 0) AS BIGINT) AS admitted_sig
    FROM scored WHERE nll <= {LM_NLL_KEEP}
    GROUP BY source ORDER BY source
    """,
)
def stream_perplexity_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perplexity gate as a REAL streaming ingest job: document shards
    stream in (checkpointed file source, exactly-once per shard), each
    micro-batch is scored in foreachBatch against the STATIC bigram LM
    and only docs under the NLL threshold append to the admitted corpus.

    Admission depends only on (doc, static model) — never on co-batched
    neighbors — so the result is batch-split-invariant and the batch
    filter's scored set is this query's oracle verbatim (same rollup,
    same membership digest). State is NONE (stateless given the model):
    the job runs forever at constant memory; per-batch cost is the batch
    scorer's on the batch alone.

    Scale: at 100 TB the model tables persist once (parquet/txn table)
    instead of recomputing lazily, and the bigram-stream joins broadcast
    the model under AQE exactly as in llm_perplexity_filter."""
    from ..operators.dedup import portable_hash60

    admitted = spark.read.parquet(_stream_ppl_materialize(spark, sf_dir))
    return (
        admitted.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_admitted"),
            F.coalesce(
                F.sum(portable_hash60(F.col("doc_id").cast("string")) % 1_000_000_000),
                F.lit(0),
            )
            .cast("bigint")
            .alias("admitted_sig"),
        )
        .orderBy("source")
    )
