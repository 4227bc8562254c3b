"""End-to-end corpus preparation pipeline as ONE registered, oracle-checked
query: quality gate → exact dedup → benchmark decontamination →
per-source cap → train/holdout split, composed exactly as a production
100 TB pretraining-data build would chain them.

Every stage reuses the SAME semantics its standalone query certifies
(`llm_quality_filter_rules`, `dedup_exact_groups`, `llm_decontaminate_13gram`,
`sample_cap_per_source`, `llm_train_holdout_split`) — this query certifies
the COMPOSITION: stage order, survivor flow, and the determinism of the
final selected set (per-cell md5 digest over the kept doc_ids, not just
counts).

Shuffle budget at scale (one pass each, nothing quadratic):
  1. quality gate — scan-stage predicate, zero exchange;
  2. exact dedup — one shuffle keyed on the md5 text fingerprint
     (rank-only window → WindowGroupLimit, map-side discard);
  3. decontam — gram explode streams map-side into a semi join whose
     bench side AQE broadcasts when small (runtime-sized, decontam.py),
     then a doc_id anti join on the survivors' partitioning;
  4. cap — one rank window partitioned by source;
  5. split + digest — final |sources × 2| cell aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import ngram_hashes
from ..operators.dedup import portable_hash60
from .decontam import _DUCK_TOKS
from .lmquality import _lexicon_values_sql
from .relational import _t
from . import query

_CAP = 30


@query(
    "pipeline_llm_corpus_prep",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, n_chars, text,
             len(string_split(text, ' ')) AS wc,
             length(text) AS chars,
             len(list_distinct(string_split(text, ' '))) AS uniq,
             (' ' || text || ' ') LIKE '% the %' AS has_stop
      FROM documents WHERE source <> 'src0'
    ),
    q AS (
      SELECT doc_id, source, n_chars, text FROM base
      WHERE wc BETWEEN 20 AND 80
        AND 3 * wc <= chars - wc + 1 AND chars - wc + 1 <= 8 * wc
        AND has_stop AND 2 * uniq >= wc
    ),
    d1 AS (
      SELECT doc_id, source, n_chars, text FROM (
        SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM q
      ) WHERE rn = 1
    ),
    toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM d1),
    bench_toks AS (
      SELECT {_DUCK_TOKS} AS t FROM documents WHERE source = 'src0'
    ),
    bench AS (
      SELECT DISTINCT array_to_string(t[i + 1 : i + 13], ' ') AS gram
      FROM bench_toks, UNNEST(generate_series(0, greatest(len(t) - 13, -1))) AS u(i)
    ),
    flagged AS (
      SELECT DISTINCT g.doc_id FROM (
        SELECT doc_id, array_to_string(t[i + 1 : i + 13], ' ') AS gram
        FROM toks, UNNEST(generate_series(0, greatest(len(t) - 13, -1))) AS u(i)
      ) g JOIN bench USING (gram)
    ),
    d2 AS (
      SELECT * FROM d1 WHERE doc_id NOT IN (SELECT doc_id FROM flagged)
    ),
    capped AS (
      SELECT doc_id, source, n_chars FROM (
        SELECT *, row_number() OVER (
          PARTITION BY source
          ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id
        ) AS rk FROM d2
      ) WHERE rk <= {_CAP}
    )
    SELECT source,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                THEN 'train' ELSE 'holdout' END AS split,
           count(*)::BIGINT AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                    % 1000000000) AS BIGINT) AS picks_sum
    FROM capped
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def pipeline_llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("source") != "src0")

    # 1. Quality gate (identical predicates to llm_quality_filter_rules).
    toks = F.split(F.col("text"), " ")
    wc = F.size(toks)
    chars = F.length("text")
    uniq = F.size(F.array_distinct(toks))
    keep = (
        wc.between(20, 80)
        & (3 * wc <= chars - wc + 1)
        & (chars - wc + 1 <= 8 * wc)
        & F.concat(F.lit(" "), F.col("text"), F.lit(" ")).like("% the %")
        & (2 * uniq >= wc)
    )
    # OPTIMIZATION_r14 (guide §2.3): `q` is consumed by BOTH the gram
    # explode and the anti join; the duplicated subtree was map-only but
    # re-ran the split/array_distinct quality predicates (the CPU cost
    # of this stage) per alias. Persist the filtered slice per call
    # (survivor rows only; ContextCleaner reaps it with the plan) so the
    # quality gate is evaluated once.
    q = (
        corpus.where(keep)
        .select("doc_id", "source", "n_chars", "text")
        .persist()
    )

    # 2./3. swapped vs the oracle's CTE order (result-identical): duplicate
    # texts share their contamination status, so decontaminating BEFORE the
    # exact dedup keeps the same min-doc_id survivor per fingerprint group
    # (a group is either fully flagged or fully clean). The payoff is
    # plan-shaped: `q` — the subtree consumed by BOTH the gram explode and
    # the anti join (Catalyst computes it twice; no subtree reuse across
    # join sides, SCALE.md round-4 lesson) — is a map-only scan+filter
    # here, so the duplication re-scans but never re-shuffles; ordered the
    # oracle's way, the duplicated subtree would contain the fingerprint
    # window's exchange.
    grams = q.select("doc_id", F.explode(ngram_hashes(F.col("text"), 13)).alias("gh"))
    bench = (
        docs.where(F.col("source") == "src0")
        .select(F.explode(ngram_hashes(F.col("text"), 13)).alias("gh"))
        .distinct()
    )
    flagged = grams.join(bench, "gh", "left_semi").select("doc_id").distinct()
    clean = q.join(flagged, "doc_id", "left_anti")

    # Exact dedup: min doc_id per text fingerprint (rank-only window →
    # WindowGroupLimit applies), over the decontaminated set.
    w_fp = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    d2 = (
        clean.withColumn("rn", F.row_number().over(w_fp))
        .where(F.col("rn") == 1)
        .drop("rn")
    )

    # 4. Deterministic per-source cap by the portable md5 rank.
    w_cap = Window.partitionBy("source").orderBy(
        portable_hash60(F.col("doc_id").cast("string")), "doc_id"
    )
    capped = (
        d2.withColumn("rk", F.row_number().over(w_cap))
        .where(F.col("rk") <= _CAP)
        .select("doc_id", "source", "n_chars")
    )

    # 5. Hash split + per-cell set digest.
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < "c", "train"
    ).otherwise("holdout")
    return (
        capped.groupBy("source", split.alias("split"))
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            # constant-state set checksum (see sampling.source_mixture):
            # collect_list held the whole per-cell pick set in agg state.
            F.sum(
                portable_hash60(F.col("doc_id").cast("string")) % 1_000_000_000
            )
            .cast("bigint")
            .alias("picks_sum"),
        )
        .orderBy("source", "split")
    )


# --------------------------------------------------------------------------
# Dataset card: the publishable composition report of the corpus — one
# (section, key, n) artifact unioning the stats every data card carries.
# --------------------------------------------------------------------------


@query(
    "pipeline_dataset_card",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, lang, {_DUCK_TOKS} AS t FROM documents
    ),
    size_rows AS (
      SELECT 'size' AS section, 'docs' AS key, count(*)::BIGINT AS n FROM documents
      UNION ALL
      SELECT 'size', 'tokens', CAST(sum(len(t)) AS BIGINT) FROM toks
    ),
    lang_rows AS (
      SELECT 'lang' AS section, lang AS key, count(*)::BIGINT AS n
      FROM documents GROUP BY lang
    ),
    domain_rows AS (
      SELECT 'domain' AS section, domain AS key, count(*)::BIGINT AS n FROM (
        SELECT d.doc_id, coalesce(b.domain, 'general') AS domain
        FROM documents d LEFT JOIN (
          SELECT doc_id, domain FROM (
            SELECT doc_id, domain,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY hits DESC, domain) AS rk
            FROM (
              SELECT doc_id, domain, count(*) AS hits
              FROM (SELECT doc_id, unnest(t) AS term FROM toks) tk
              JOIN (VALUES {{LEX}}) AS lexicon(term, domain) USING (term)
              GROUP BY 1, 2
            )
          ) WHERE rk = 1
        ) b USING (doc_id)
      ) GROUP BY domain
    ),
    dup_rows AS (
      SELECT 'dedup' AS section, 'exact_dup_docs' AS key,
             CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n
      FROM (
        SELECT md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp
        FROM toks
      )
    )
    SELECT section, key, n FROM (
      SELECT * FROM size_rows
      UNION ALL SELECT * FROM lang_rows
      UNION ALL SELECT * FROM domain_rows
      UNION ALL SELECT * FROM dup_rows
    ) ORDER BY section, key
    """.replace("{LEX}", _lexicon_values_sql()),
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card's composition tables as ONE artifact: corpus size
    (docs, tokens), language distribution, lexicon-domain distribution,
    and the exact-duplicate count — each section reusing the exact
    semantics its standalone query certifies (text.tokenize,
    lmquality.tag_domains, functions.text.fingerprint), so this query
    certifies the COMPOSED report, not new logic.

    Scale: each section is an independent bounded-output aggregate over
    the corpus (a report build, not a hot path — sections share the scan
    via Spark's columnar cache when the card is built alongside the prep
    pipeline); the union of |sections| tiny frames is driver-negligible."""
    from ..functions import text as T
    from .lmquality import domain_expr

    docs = _t(spark, sf_dir, "documents")
    fp = T.fingerprint(F.col("text"))
    # OPTIMIZATION_r15 (guide §1.2/§2.3): with the domain argmax now a
    # scan-stage expression (lmquality.domain_expr), the size, lang and
    # domain sections all fold into ONE tiny (lang, domain) rollup —
    # one tokenize pass, one low-cardinality map-side-combined exchange —
    # persisted per call and re-aggregated three ways (integer-exact:
    # sums of group counts/token-sums == the old global/per-lang/
    # per-domain aggregates). Only the exact-dup count still needs its
    # own pass: a global COUNT(DISTINCT md5) cannot be derived from a
    # (lang, domain) rollup. 3 corpus scans, 2 tokenizes (r14 shape) →
    # 2 scans, 1 tokenize.
    base = docs.select("lang", T.tokenize("text").alias("__toks"))
    rollup = (
        base.select(
            "lang",
            domain_expr(F.col("__toks")).alias("domain"),
            F.size("__toks").alias("ntok"),
        )
        .groupBy("lang", "domain")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("ntok").cast("bigint").alias("ntoks"),
        )
        .persist()
    )
    dup_rows = docs.agg(
        (F.count("*") - F.count_distinct(fp)).cast("bigint").alias("n")
    ).select(
        F.lit("dedup").alias("section"), F.lit("exact_dup_docs").alias("key"), "n"
    )
    size_rows = rollup.agg(
        F.sum("n").cast("bigint").alias("docs"),
        F.sum("ntoks").cast("bigint").alias("tokens"),
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
            )
        ).alias("r")
    ).select("r.section", "r.key", "r.n")
    lang_rows = rollup.groupBy(F.col("lang").alias("key")).agg(
        F.sum("n").cast("bigint").alias("n")
    ).select(F.lit("lang").alias("section"), "key", "n")
    domain_rows = rollup.groupBy(F.col("domain").alias("key")).agg(
        F.sum("n").cast("bigint").alias("n")
    ).select(F.lit("domain").alias("section"), "key", "n")
    return (
        size_rows.unionByName(dup_rows)
        .unionByName(lang_rows)
        .unionByName(domain_rows)
        .orderBy("section", "key")
    )
