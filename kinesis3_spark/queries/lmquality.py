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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

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


# CONTRACT (ADVICE r12, shared with dataquality's _PSI_BUCKETS and
# _QC_MODELS below): the sf_dir key must uniquely identify the on-disk
# relation for the life of the session; regenerating data under the same
# path in-session serves stale persisted counts — clear the registry then.
# Persisted model tables, one per (sf_dir, tier) — the "model persists
# once" production shape the module scale notes promise, realized for the
# registered queries via the keyed-registry discipline (queries/dedup.py
# _GRAM_INDEX): without it every invocation re-derives the tri/bi/unigram
# counts from the train slice (4-5 extra scans; measured 4.34 -> 3.26 s
# for the trigram gate at sf0.1). Tables are bounded by the trusted
# slice's vocabulary. The 1-row totals/vocab aggregates stay lazy (they
# read the persisted count tables).
_LM_MODELS: dict[tuple, tuple] = {}


def bigram_model_for(spark: SparkSession, sf_dir: str):
    key = (sf_dir, "bigram")
    if key not in _LM_MODELS:
        bg, ug, vocab = train_bigram_lm(_t(spark, sf_dir, "documents"))
        _LM_MODELS[key] = (bg.persist(), ug.persist(), vocab)
    return _LM_MODELS[key]


def backoff_model_for(spark: SparkSession, sf_dir: str):
    """Builds the trigram tier ON TOP of the bigram registry's persisted
    bg/ug handles (review r12 #4 — a second independent persist of the
    same count tables would re-accumulate exactly the cache duplication
    the registry exists to prevent); only the trigram counts are new."""
    key = (sf_dir, "trigram")
    if key not in _LM_MODELS:
        bg, ug, _vocab = bigram_model_for(spark, sf_dir)
        docs = _t(spark, sf_dir, "documents")
        tg, _bg2, _ug2, totals = train_backoff_lm(docs, bg_ug=(bg, ug))
        _LM_MODELS[key] = (tg.persist(), bg, ug, totals)
    return _LM_MODELS[key]


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
    bigram-LM threshold + the mean NLL quality signal per source. The
    model tables come from the per-sf_dir persisted registry (train
    once, score many — the production lifecycle; r12)."""
    bg, ug, vocab = bigram_model_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    scored = score_docs_with_lm(
        docs.where(F.col("source") != LM_TRAIN_SOURCE), bg, ug, vocab
    )
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
# Trigram stupid-backoff LM (VERDICT r11 'Next round' #6): the same CCNet
# gate with a real n-gram model — Brants et al. 2007's stupid backoff,
# the scheme built FOR corpus-scale MapReduce counting (no discounting
# state, just raw counts and a fixed back-off factor):
#   S(w3|w1 w2) = c(w1 w2 w3)/c(w1 w2)            if the trigram is seen
#               = a * c(w2 w3)/c(w2)              else if the bigram is
#               = a^2 * (c(w3)+k)/(N + k*(V+1))   else (add-k unigram base,
#                                                  so OOV stays finite)
# with a = 0.4 (the paper constant). Training is THREE map-side-combined
# count aggregates over the trusted slice (tri/bi/unigram); scoring is one
# corpus pass joined against the three bounded model tables.
# --------------------------------------------------------------------------

LM_BACKOFF = 0.4    # Brants et al. 2007's alpha
LM_TRI_KEEP = 4.283  # see llm_perplexity_filter_trigram docstring


def _trigram_triples(col) -> F.Column:
    """array<struct<w1,w2,w3>> of adjacent token triples (index-built like
    _bigram_pairs; docs under 3 tokens yield an empty array and drop)."""

    def build(toks):
        m = F.size(toks) - 2
        return F.when(
            m >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(m, F.lit(1))),
                lambda i: F.struct(
                    F.element_at(toks, i.cast("int")).alias("w1"),
                    F.element_at(toks, (i + 1).cast("int")).alias("w2"),
                    F.element_at(toks, (i + 2).cast("int")).alias("w3"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
        )

    return T._let(T.tokenize(col), build)


def train_backoff_lm(
    docs: DataFrame, train_source: str = LM_TRAIN_SOURCE, bg_ug=None
):
    """(tg_counts, bg_counts, ug_counts, totals) from the trusted slice.
    totals is a 1-row (n_tokens, v) aggregate joined back by broadcast.
    The bi/unigram tables are train_bigram_lm's verbatim (one model
    definition across the bigram and trigram gates); pass ``bg_ug`` to
    reuse already-built (e.g. persisted-registry) handles."""
    if bg_ug is not None:
        bg_counts, ug_counts = bg_ug
    else:
        bg_counts, ug_counts, _vocab = train_bigram_lm(docs, train_source)
    train = docs.where(F.col("source") == train_source)
    tg_counts = (
        train.select(F.explode(_trigram_triples(F.col("text"))).alias("tg"))
        .groupBy(
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
        .agg(F.count("*").alias("c_tg"))
    )
    totals = ug_counts.agg(
        F.sum("c_ug").alias("n_tokens"), F.count("*").alias("v")
    )
    return tg_counts, bg_counts, ug_counts, totals


def score_docs_with_backoff_lm(
    docs: DataFrame,
    tg_counts: DataFrame,
    bg_counts: DataFrame,
    ug_counts: DataFrame,
    totals: DataFrame,
) -> DataFrame:
    """Per-doc avg negative log-score under the trained stupid-backoff
    trigram LM — the apply half (train once, score many), like
    score_docs_with_lm. Docs with <3 tokens have no trigrams and drop.

    Plan: ONE corpus trigram pass (explode in the scan stage) left-joined
    against the three model tables — trigram on (w1,w2,w3), the context
    bigram on (w1,w2), the back-off bigram on (w2,w3), the back-off
    unigram on (w2), the base unigram on (w3) — all bounded by the
    trusted slice (AQE broadcasts them when they fit), then one doc-keyed
    aggregate. No shuffle is corpus-width except the final (doc_id) agg."""
    trips = docs.select(
        "doc_id", "source", F.explode(_trigram_triples(F.col("text"))).alias("tg")
    ).select(
        "doc_id",
        "source",
        F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"),
        F.col("tg.w3").alias("w3"),
    )
    ctx = bg_counts.select(
        F.col("prev").alias("w1"), F.col("w").alias("w2"), F.col("c_bg").alias("c_ctx")
    )
    bg23 = bg_counts.select(
        F.col("prev").alias("w2"), F.col("w").alias("w3"), F.col("c_bg").alias("c_bg23")
    )
    ug2 = ug_counts.select(F.col("prev").alias("w2"), F.col("c_ug").alias("c_ug2"))
    ug3 = ug_counts.select(F.col("prev").alias("w3"), F.col("c_ug").alias("c_ug3"))
    a = F.lit(LM_BACKOFF)
    k = F.lit(LM_ADD_K)
    s = (
        F.when(
            F.coalesce(F.col("c_tg"), F.lit(0)) > 0,
            F.col("c_tg") / F.col("c_ctx"),
        )
        .when(
            F.coalesce(F.col("c_bg23"), F.lit(0)) > 0,
            a * F.col("c_bg23") / F.col("c_ug2"),
        )
        .otherwise(
            a
            * a
            * (F.coalesce(F.col("c_ug3"), F.lit(0)) + k)
            / (F.col("n_tokens") + k * (F.col("v") + 1))
        )
    )
    return (
        trips.join(tg_counts, ["w1", "w2", "w3"], "left")
        .join(ctx, ["w1", "w2"], "left")
        .join(bg23, ["w2", "w3"], "left")
        .join(ug2, ["w2"], "left")
        .join(ug3, ["w3"], "left")
        .join(F.broadcast(totals))
        .select("doc_id", "source", F.log(s).alias("logp"))
        .groupBy("doc_id", "source")
        .agg(
            (-F.avg("logp")).alias("nll"),
            F.count("*").cast("bigint").alias("n_trigrams"),
        )
    )


def score_perplexity_trigram(
    docs: DataFrame, train_source: str = LM_TRAIN_SOURCE
) -> DataFrame:
    """Per-document avg negative log-score (nats/trigram) under the
    stupid-backoff trigram LM trained on `train_source`, for every doc
    outside the training slice."""
    tg, bg, ug, totals = train_backoff_lm(docs, train_source)
    return score_docs_with_backoff_lm(
        docs.where(F.col("source") != train_source), tg, bg, ug, totals
    )


_TRI_SCORED_CTE = f"""
    WITH toksv AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
    trigrams AS (
      SELECT doc_id, source, t[i + 1] AS w1, t[i + 2] AS w2, t[i + 3] AS w3
      FROM toksv, UNNEST(generate_series(0, greatest(len(t) - 3, -1))) AS u(i)
    ),
    tg AS (
      SELECT w1, w2, w3, count(*) AS c_tg FROM trigrams
      WHERE source = '{LM_TRAIN_SOURCE}' GROUP BY 1, 2, 3
    ),
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
    tot AS (SELECT sum(c_ug) AS n_tokens, count(*) AS v FROM ug),
    tri_scored AS (
      SELECT tr.doc_id, tr.source,
             -avg(ln(CASE
               WHEN coalesce(c_tg, 0) > 0 THEN c_tg * 1.0 / c_ctx
               WHEN coalesce(c_bg23, 0) > 0
                 THEN {LM_BACKOFF} * c_bg23 / c_ug2
               ELSE {LM_BACKOFF} * {LM_BACKOFF} * (coalesce(c_ug3, 0) + {LM_ADD_K})
                    / (n_tokens + {LM_ADD_K} * (v + 1))
             END)) AS nll
      FROM trigrams tr
      LEFT JOIN tg ON tr.w1 = tg.w1 AND tr.w2 = tg.w2 AND tr.w3 = tg.w3
      LEFT JOIN (SELECT prev AS w1, w AS w2, c_bg AS c_ctx FROM bg) ctx
        ON tr.w1 = ctx.w1 AND tr.w2 = ctx.w2
      LEFT JOIN (SELECT prev AS w2, w AS w3, c_bg AS c_bg23 FROM bg) b23
        ON tr.w2 = b23.w2 AND tr.w3 = b23.w3
      LEFT JOIN (SELECT prev AS w2, c_ug AS c_ug2 FROM ug) u2 ON tr.w2 = u2.w2
      LEFT JOIN (SELECT prev AS w3, c_ug AS c_ug3 FROM ug) u3 ON tr.w3 = u3.w3
      CROSS JOIN tot
      WHERE tr.source <> '{LM_TRAIN_SOURCE}'
      GROUP BY 1, 2
    )
"""


@query(
    "llm_perplexity_filter_trigram",
    oracle=f"""
    {_TRI_SCORED_CTE}
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(CASE WHEN nll <= {LM_TRI_KEEP} THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           round(avg(nll), 2) AS avg_nll
    FROM tri_scored GROUP BY source ORDER BY source
    """,
)
def llm_perplexity_filter_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet gate with a trigram stupid-backoff LM (VERDICT r11
    agenda #6) — per-source keep counts + mean NLL, same rollup as the
    bigram gate so the two model tiers are directly comparable. The keep
    threshold LM_TRI_KEEP=4.283 sits mid-gap with the nearest document
    >= 1.4e-3 nats away across ALL test SFs' score unions (measured;
    ~11 orders above cross-engine double drift — the LM_NLL_KEEP
    discipline) and splits sf0.01 48/52; at sf0.1 the trusted slice is
    10x larger, trigram coverage rises, and the gate keeps ~99.6%
    (still dropping ~19 docs — non-vacuous at every SF). Direction
    pinned in tests/test_lmquality.py: in-distribution text scores
    under shuffled text. Model tables from the per-sf_dir persisted
    registry (train once, score many — measured 4.34 -> 3.26 s at
    sf0.1 vs re-deriving per invocation)."""
    tg, bg, ug, totals = backoff_model_for(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    scored = score_docs_with_backoff_lm(
        docs.where(F.col("source") != LM_TRAIN_SOURCE), tg, bg, ug, totals
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("nll") <= LM_TRI_KEEP, 1).otherwise(0))
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

    Plan shape (OPTIMIZATION_r15, guide §2.4): the lexicon is 4 domains of
    ≤6 terms — model config, not data — so the per-doc argmax is computed
    entirely IN THE SCAN STAGE with array built-ins: one tokenize, one
    `size(filter(toks, t ∈ terms))` occurrence count per domain, and the
    (hits desc, domain asc) argmax as `array_min` over (-hits, domain)
    structs. Zero shuffles and zero token fan-out, vs the r14 shape's
    explode → broadcast lexicon join → groupBy(doc, domain) exchange →
    per-doc window exchange → join-back. Tie-break and the zero-hit →
    'general' fold are unchanged (struct comparison is lexicographic, so
    min(-hits, domain) = max hits then alphabetical; hits of a NULL text
    come back as size(NULL) = -1, which the `< 0` guard also folds to
    'general', matching the old no-explode-rows behaviour).
    """
    with_toks = docs.select("doc_id", "source", T.tokenize("text").alias("__toks"))
    return with_toks.select(
        "doc_id", "source", domain_expr(F.col("__toks")).alias("domain")
    )


def domain_expr(toks: Column) -> Column:
    """The argmax-domain column over an ALREADY-TOKENIZED array — shared
    by tag_domains and pipeline_dataset_card's fused composition rollup.
    Callers must bind `toks` to a materialized projection column (not the
    raw tokenize expression) so the regexp split is not duplicated per
    domain."""

    def _hits(terms: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*terms)))

    best = F.array_min(
        F.array(
            *[
                F.struct(
                    (-_hits(terms)).alias("neg_hits"),
                    F.lit(domain).alias("domain"),
                )
                for domain, terms in sorted(DOMAIN_LEXICON.items())
            ]
        )
    )
    return F.when(best["neg_hits"] < 0, best["domain"]).otherwise(F.lit("general"))


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


def write_admitted_batch(admitted: DataFrame, out: str, batch_id: int) -> None:
    """Idempotent per-batch sink (r12 advice fix): the batch's admitted
    rows land in their own deterministic batch_id partition via dynamic
    partition overwrite, so a RETRIED micro-batch (foreachBatch is
    at-least-once) replaces its partition instead of double-appending —
    the composition is exactly-once at the sink. Pinned by
    tests/test_lmquality.py::test_admitted_batch_write_is_idempotent."""
    (
        admitted.select("doc_id", "source", "nll")
        .withColumn("batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out)
    )


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
    # Train ONCE from the static trusted slice via the persisted model
    # registry — each micro-batch re-joins the SAME cached tables (the
    # production shape; r12).
    bg_counts, ug_counts, vocab = bigram_model_for(spark, sf_dir)

    def admit_batch(bdf, batch_id: int) -> None:
        scored = score_docs_with_lm(
            bdf.where(F.col("source") != LM_TRAIN_SOURCE), bg_counts, ug_counts, vocab
        )
        write_admitted_batch(scored.where(F.col("nll") <= LM_NLL_KEEP), out, batch_id)

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
    stream in (checkpointed file source), each micro-batch is scored in
    foreachBatch against the STATIC bigram LM and only docs under the NLL
    threshold land in the admitted corpus. The sink is exactly-once: each
    batch dynamic-overwrites its own batch_id partition (deterministic
    output per batch), so foreachBatch's at-least-once replay cannot
    double-admit a row.

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


# --------------------------------------------------------------------------
# Model-based quality classifier (round 12): the fastText-style filter of
# the GPT-3/LLaMA pretraining recipes — train a linear classifier to
# distinguish the trusted slice from the rest of the crawl, score every
# document, keep the high-scoring tail. Here: hashed bag-of-words
# (HashingTF, 4096 buckets) + MLlib LogisticRegression (the distributed
# LBFGS fit — Spark's own ML tier doing what it exists for), scored
# corpus-wide in one pass. The classifier COMPLEMENTS the n-gram LM
# gates: the LM scores fluency, the classifier scores similarity-to-
# reference — CCNet ships both.
# --------------------------------------------------------------------------

_QC_FEATURES = 4096
_QC_AUC_FLOOR_X100 = 65  # binned AUC >= 0.65; measured 0.82 at sf0.01
_QC_BINS = 1000


def binned_auc(scored: DataFrame, label_col: str, score_col: str,
               bins: int = _QC_BINS):
    """AUC from a score HISTOGRAM (the production shape at corpus scale —
    exact rank-AUC needs a global sort; binning needs one map-side-
    combined rollup of |bins| rows): AUC = sum over ascending bins of
    pos_in * (neg_below + neg_in/2) / (P*N), ties-within-bin handled by
    the half term. Returns a 1-row DataFrame (auc double)."""
    from pyspark.sql.window import Window

    b = F.least(
        F.floor(F.col(score_col) * bins).cast("int"), F.lit(bins - 1)
    )
    hist = (
        scored.groupBy(b.alias("bin"))
        .agg(
            F.sum(F.col(label_col)).alias("pos_in"),
            F.sum(1 - F.col(label_col)).alias("neg_in"),
        )
    )
    # scale-ok: input is the |bins|-row histogram rollup, never the corpus
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "pos_in",
        "neg_in",
        F.coalesce(F.sum("neg_in").over(w), F.lit(0.0)).alias("neg_below"),
    )
    return cum.agg(
        (
            F.sum(F.col("pos_in") * (F.col("neg_below") + F.col("neg_in") / 2))
            / (F.sum("pos_in") * F.sum("neg_in"))
        ).alias("auc")
    )


# Fitted-model registry. CONTRACT (shared by _LM_MODELS and dataquality's
# _PSI_BUCKETS): the key is the sf_dir path, which is assumed to uniquely
# identify the on-disk relation for the life of the session — regenerating
# data under the same path in-session requires clearing the registry
# (ADVICE r12: a reused key silently serves the first caller's fit).
# Values are PLAIN PYTHON FLOATS (coefficients + intercept), never a
# JVM-backed MLlib model object: the r12 full-suite flake ([STAGE_
# MATERIALIZATION_MULTIPLE_FAILURES] / `Task not serializable`) came from
# re-planning a cached LogisticRegressionModel.transform against a
# long-lived session; a literal coefficient array cannot carry stale JVM
# state into a later plan.
_QC_MODELS: dict[str, tuple[list[float], float]] = {}


def _qc_bucket(tok) -> Column:
    """Hashed-feature bucket for one token: pmod(murmur3(tok), N). The SAME
    expression feeds training (explode → count per bucket) and scoring
    (element_at into the literal coefficient array), so the two sides index
    identically by construction — no dependence on HashingTF's internal
    hash, which differs from SQL `hash()` byte handling."""
    return F.pmod(F.hash(tok), F.lit(_QC_FEATURES)).cast("int")


def fit_quality_classifier(docs: DataFrame) -> tuple[list[float], float]:
    """Distributed LBFGS fit (MLlib LogisticRegression) of trusted-slice vs
    rest over hashed bag-of-words counts; returns (coefficients, intercept)
    as plain Python floats — the model leaves MLlib at the fit boundary.

    Training plan: token explode → (doc, bucket) count (map-side combined)
    → per-doc bucket→count map → dense _QC_FEATURES array → vector. The
    dense assembly is training-only (scoring never materializes it); at
    real corpus scale the fastText-filter recipe trains on a bounded
    labeled sample anyway, so `docs` is the boundable input."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    feat = docs.select(
        "doc_id",
        T.tokenize("text").alias("toks"),
        (F.col("source") == LM_TRAIN_SOURCE).cast("double").alias("label"),
    )
    counts = (
        feat.select("doc_id", "label", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "label", _qc_bucket(F.col("tok")).alias("bucket"))
        .agg(F.count("*").cast("double").alias("cnt"))
        .groupBy("doc_id", "label")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("bucket", "cnt"))
            ).alias("m")
        )
    )
    X = counts.select(
        "label",
        array_to_vector(
            F.transform(
                F.sequence(F.lit(0), F.lit(_QC_FEATURES - 1)),
                lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0)),
            )
        ).alias("features"),
    )
    model = LogisticRegression(
        maxIter=20, regParam=0.01, featuresCol="features", labelCol="label"
    ).fit(X)
    return [float(c) for c in model.coefficients.toArray()], float(model.intercept)


def score_quality_classifier(
    docs: DataFrame, coefs: list[float], intercept: float
) -> DataFrame:
    """(doc_id, source, label, p): sigmoid(intercept + Σ_tok coef[bucket])
    per document. Pure scan-stage column expressions — the coefficient
    vector is ONE literal array node (the bounded-literal discipline of the
    domain lexicon above), the per-token fold is F.aggregate, and no MLlib
    object enters the plan, so the scoring path is immune to the cached-
    model serialization flake this replaced (VERDICT r12 next-round #1)."""
    coef_lit = F.lit([float(c) for c in coefs])
    margin = F.aggregate(
        T.tokenize("text"),
        F.lit(float(intercept)),
        lambda acc, t: acc + F.element_at(coef_lit, _qc_bucket(t) + 1),
    )
    return docs.select(
        "doc_id",
        "source",
        (F.col("source") == LM_TRAIN_SOURCE).cast("double").alias("label"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))).alias("p"),
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-once-score-many wrapper over the documents table: fit cached
    per sf_dir as plain floats, scoring one corpus pass."""
    fitted = _QC_MODELS.get(sf_dir)
    if fitted is None:
        fitted = fit_quality_classifier(_t(spark, sf_dir, "documents"))
        _QC_MODELS[sf_dir] = fitted
    coefs, intercept = fitted
    return score_quality_classifier(_t(spark, sf_dir, "documents"), coefs, intercept)


@query(
    "llm_quality_classifier",
    oracle=f"""
    SELECT count(*)::BIGINT AS n_docs,
           sum(CASE WHEN source = '{LM_TRAIN_SOURCE}' THEN 1 ELSE 0 END)::BIGINT
             AS n_pos,
           1 AS auc_ok, 1 AS direction_ok
    """
    + "FROM documents",
)
def llm_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fastText-style quality gate, banded-oracle form (an LBFGS fit
    is not SQL-expressible): n_docs / n_pos exact vs the oracle's own
    counts; auc_ok = binned AUC of the classifier against the trusted-
    slice label >= 0.65 (a broken feature map or collapsed fit drops
    toward 0.5); direction_ok = mean trusted-slice score strictly above
    the rest. Since r13 the scoring path contains NO MLlib object — the
    fit exits MLlib as plain-float coefficients and scoring is a literal-
    array fold in the scan stage (see quality_classifier_scores; removes
    the r12 cached-model serialization flake by construction). Planted
    separable/inseparable corpora are pytest-pinned through the
    production fit/score pair (tests/test_lmquality.py)."""
    scored = quality_classifier_scores(spark, sf_dir)
    base = scored.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("label").cast("bigint").alias("n_pos"),
        F.avg(F.when(F.col("label") == 1.0, F.col("p"))).alias("pos_mean"),
        F.avg(F.when(F.col("label") == 0.0, F.col("p"))).alias("neg_mean"),
    )
    auc = binned_auc(scored, "label", "p")
    return base.crossJoin(auc).select(
        "n_docs",
        "n_pos",
        (F.col("auc") * 100 >= _QC_AUC_FLOOR_X100).cast("int").alias("auc_ok"),
        (F.col("pos_mean") > F.col("neg_mean")).cast("int").alias("direction_ok"),
    )
