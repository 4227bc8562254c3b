"""Sampling operators: Bernoulli table sample and stratified sampleBy.

Training pipelines subsample constantly (eval slices, ablation corpora,
per-source mixing ratios). Spark's `sample`/`sampleBy` are seeded and
executor-local — each task samples its own split with no shuffle and no
coordination, which is exactly the shape that scales: sampling 100 TB costs
one scan, zero exchanges.

Randomness can't be replayed in another engine, so the oracle checks what
IS deterministic: the exact population counts per stratum, plus an
`in_band` flag asserting the sample landed within a >5-sigma tolerance of
the target fraction (the `agg_percentile_approx_within_band` pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import _t
from . import query

SEED = 7


@query(
    "sample_bernoulli_band",
    oracle="SELECT count(*)::BIGINT AS n_orders, 1 AS in_band FROM orders",
)
def sample_bernoulli_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% Bernoulli sample of orders; flag |sample/n - 0.2| <= 0.05 (the
    sf0.01 population is 15k rows -> sigma ~ 0.0033, so the band is ~15x
    sigma — deterministic-in-practice without fixing Spark's RNG stream)."""
    o = _t(spark, sf_dir, "orders")
    full = o.agg(F.count("*").alias("n_orders"))
    samp = o.sample(fraction=0.2, seed=SEED).agg(F.count("*").alias("n_s"))
    in_band = (F.abs(F.col("n_s") * 100 - F.col("n_orders") * 20) <= F.col("n_orders") * 5)
    return full.crossJoin(samp).select(
        "n_orders", in_band.cast("int").alias("in_band")
    )


@query(
    "sample_stratified_by_lang",
    oracle="""
    SELECT lang, count(*)::BIGINT AS n_docs, 1 AS in_band
    FROM documents GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified 50% per language: equalizes source mix regardless of how
    skewed the corpus is. The distinct-strata collect is a handful of rows
    (languages, not documents) — driver-side by design, like IVF centroid
    seeding. Band: |sampled/n - 0.5| <= 0.15 (~3 sigma at 100 docs/lang)."""
    d = _t(spark, sf_dir, "documents")
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    s = d.sampleBy("lang", {lg: 0.5 for lg in langs}, seed=SEED)
    full = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    samp = s.groupBy("lang").agg(F.count("*").alias("n_s"))
    in_band = (
        F.abs(F.col("n_s") * 100 - F.col("n_docs") * 50) <= F.col("n_docs") * 15
    )
    return (
        full.join(samp, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce(in_band.cast("int"), F.lit(0)).alias("in_band"),
        )
    )


@query(
    "sample_cap_per_source",
    oracle="""
    SELECT doc_id, source
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                        doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 50
    """,
)
def sample_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source document cap (Common-Crawl-style per-domain
    caps in training-data curation): keep the 50 docs per source ranked by
    a portable 60-bit md5 hash of the id — an exact, engine-reproducible
    'random' subset, unlike seeded RNG sampling (which no other engine can
    replay — see the band-checked queries above). One window pass
    partitioned by source; at 100 TB the hash rank can be pre-materialized
    and the cap becomes a filter, no sort at query time."""
    from ..operators.dedup import portable_hash60

    d = _t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy(
        portable_hash60(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 50)
        .select("doc_id", "source")
    )


@query(
    "sample_source_mixture",
    oracle="""
    WITH w AS (
      SELECT source, count(*) AS n_docs, sqrt(sum(n_chars)) AS wt
      FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(wt) AS sum_wt FROM w),
    tgt AS (
      SELECT source, n_docs,
             CAST(floor(200 * wt / (SELECT sum_wt FROM tot)) AS BIGINT) AS target
      FROM w
    ),
    ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT,
                        doc_id
             ) AS rk
      FROM documents
    )
    SELECT r.source,
           t.target,
           count(*)::BIGINT AS taken,
           CAST(sum(('0x' || substr(md5(r.doc_id::VARCHAR), 1, 15))::BIGINT
                    % 1000000000) AS BIGINT) AS picks_sum
    FROM ranked r JOIN tgt t USING (source)
    WHERE r.rk <= t.target
    GROUP BY r.source, t.target
    ORDER BY r.source
    """,
)
def sample_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted source mixing (the data-mixture step of a
    pretraining pipeline, alpha = 0.5 over per-source character mass):
    per-source budgets are floor-allocated from a 200-doc total, and each
    source's budget is filled by the same portable md5 rank as
    sample_cap_per_source — fully deterministic, engine-reproducible, no
    seeded RNG. The per-source weight table is |sources| rows (broadcast);
    the only big-data pass is the rank window partitioned by source, and
    the picks_sum checksum proves the SELECTED DOC SET matches, not just the
    counts. At 100 TB: identical shape, with the rank pre-materialized so
    the mixture is a filter join."""
    from ..operators.dedup import portable_hash60
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    w = d.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sqrt(F.sum("n_chars")).alias("wt")
    )
    tgt = (
        # scale-ok: input is the per-source rollup — |sources| rows (~6)
        w.withColumn("sum_wt", F.sum("wt").over(Window.partitionBy()))
        .select(
            "source",
            F.floor(F.lit(200) * F.col("wt") / F.col("sum_wt"))
            .cast("bigint")
            .alias("target"),
        )
    )
    rk_w = Window.partitionBy("source").orderBy(
        portable_hash60(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.withColumn("rk", F.row_number().over(rk_w)).select(
        "doc_id", "source", "rk"
    )
    picked = ranked.join(F.broadcast(tgt), "source").where(
        F.col("rk") <= F.col("target")
    )
    return (
        picked.groupBy("source", "target")
        .agg(
            F.count("*").cast("bigint").alias("taken"),
            # order-independent SET checksum with CONSTANT agg state: the
            # previous md5-of-sorted-collect_list held every picked id in
            # the aggregation buffer — at 100 TB a hot source's pick list
            # is the OOM. sum of (portable-hash mod 1e9) commutes, costs
            # one long per group, and any set difference shifts it.
            F.sum(
                portable_hash60(F.col("doc_id").cast("string")) % 1_000_000_000
            )
            .cast("bigint")
            .alias("picks_sum"),
        )
        .orderBy("source")
    )


@query(
    "sample_weighted_es",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             -ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 1.0)
                 / (1152921504606846976.0 + 1.0)) / n_chars AS ekey
      FROM documents
    )
    SELECT doc_id, source, n_chars
    FROM keyed ORDER BY ekey, doc_id LIMIT 100
    """,
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement via exponential keys
    (Efraimidis–Spirakis A-ES): each doc draws key = -ln(u)/w with w =
    n_chars and u a portable 60-bit md5 uniform — the k smallest keys ARE
    a weighted sample, and because u is hash-derived (not seeded RNG) any
    engine replays the identical sample (the sample_cap_per_source
    discipline, extended to weights).

    Scale shape: key computation rides the scan; the top-k cut is
    orderBy+limit → TakeOrderedAndProject (map-side partial top-k per
    partition, k rows to the driver-side final — never a global sort).
    This is THE one-pass distributed weighted sampler: no total weight
    pre-pass, no rejection loop, merge-safe across partitions. Ordering
    compares doubles from identical IEEE inputs; adjacent keys differ at
    ~1e-3 relative scale, astronomically above the 1-ulp ln() libm
    divergence, and doc_id breaks exact ties."""
    d = _t(spark, sf_dir, "documents")
    from ..operators.dedup import portable_hash60

    u = (portable_hash60(F.col("doc_id").cast("string")) + 1.0) / (
        float(1 << 60) + 1.0
    )
    ekey = -F.log(u) / F.col("n_chars")
    return (
        d.select("doc_id", "source", "n_chars", ekey.alias("ekey"))
        .orderBy("ekey", "doc_id")
        .limit(100)
        .select("doc_id", "source", "n_chars")
    )


# Target mixture for the token-budget planner: 4 boosted sources at 10%
# each, the remaining 16 share the rest uniformly (ppm, sums to 1e6) —
# the hand-set per-source shares a pretraining mix declares (LLaMA-style
# "wikipedia x2.5 epochs" tables reduce to exactly this arithmetic).
_MIX_BOOSTED = ("src0", "src1", "src2", "src3")
_MIX_BOOST_PPM = 100_000
_MIX_REST_PPM = (1_000_000 - 4 * _MIX_BOOST_PPM) // 16  # 37_500
# total training-token budget for the plan (10M — ~20x this corpus's
# tokens, so boosted sources need multiple epochs: the interesting case)
_MIX_BUDGET = 10_000_000


@query(
    "llm_mixture_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT source,
             CAST(sum(len({{toks}})) AS BIGINT) AS n_tokens
      FROM (SELECT source, text FROM documents)
      GROUP BY source
    ),
    planned AS (
      SELECT source, n_tokens,
             CAST(CASE WHEN source IN ('src0','src1','src2','src3')
                  THEN {_MIX_BOOST_PPM} ELSE {_MIX_REST_PPM} END
                  AS BIGINT) AS share_ppm
      FROM t
    )
    SELECT source, n_tokens, share_ppm,
           CAST(share_ppm * {_MIX_BUDGET} // 1000000 AS BIGINT)
             AS tokens_drawn,
           CAST((share_ppm * {_MIX_BUDGET} // 1000000) * 1000000
                // n_tokens AS BIGINT) AS epochs_ppm,
           CAST((share_ppm * {_MIX_BUDGET} // 1000000) * 1000000
                // n_tokens > 1000000 AS INT) AS oversampled
    FROM planned ORDER BY source
    """.replace(
        "{toks}",
        "string_split_regex(regexp_replace(lower(text),"
        " '^\\s+|\\s+$', '', 'g'), '\\s+')",
    ),
)
def llm_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix token budgeting: given hand-set per-source target
    shares (ppm) and a total token budget, compute per source the
    tokens to draw and the implied EPOCH COUNT over that source
    (epochs_ppm > 1e6 = the source must be upsampled / repeated — the
    LLaMA/Pile mixture tables' "epochs" column, derived instead of
    eyeballed). Everything is exact integer arithmetic (ppm shares,
    integer division) so the plan is reproducible and engine-portable —
    the planner output IS the contract a sampling job executes.

    Scale: one token-count scan with map-side combine into a 20-row
    rollup; the share table is a literal broadcast. The downstream
    executor of this plan is sample_temperature_mixture's seeded
    per-task sampling — no coordination, no shuffle."""
    from ..functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    share = F.when(
        F.col("source").isin(*_MIX_BOOSTED), F.lit(_MIX_BOOST_PPM)
    ).otherwise(F.lit(_MIX_REST_PPM))
    planned = counts.withColumn("share_ppm", share.cast("bigint"))
    # SQL `div` = exact bigint division (double `/`+floor loses exactness
    # past 2^53 — at a LLaMA-scale token budget the docstring invokes,
    # share*budget reaches ~6e17; review r10-2nd #3). Products stay
    # under 2^63 up to ~9e13-token budgets at 1e5-ppm shares.
    planned = planned.withColumn(
        "tokens_drawn",
        F.expr(
            f"share_ppm * CAST({_MIX_BUDGET} AS BIGINT) div 1000000"
        ).cast("bigint"),
    ).withColumn(
        "epochs_ppm",
        F.expr("tokens_drawn * CAST(1000000 AS BIGINT) div n_tokens")
        .cast("bigint"),
    )
    return (
        planned.select(
            "source", "n_tokens", "share_ppm", "tokens_drawn",
            "epochs_ppm",
            (F.col("epochs_ppm") > 1_000_000).cast("int")
            .alias("oversampled"),
        )
        .orderBy("source")
    )
