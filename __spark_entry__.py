"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The registry itself lives in ``kinesis3_spark.queries`` (one module per
SURVEY.md §2b family); this file only adapts it to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3 shape: 3-way join + agg + top-k) on sf0.001."""
    from kinesis3_spark.queries import QUERIES

    return QUERIES["q3_shipping_priority"](spark, SF0001)


# The driver oracle-checks the FIRST 50 entries of queries() per round.
# Rounds 2-3 checked the same 50 (relational/scalar/temporal/dedup/
# similarity + 2 llmtext) — all green and protected locally by
# tests/test_oracle_parity.py, which checks all 122 every run. This window
# rotates the 50 never-officially-checked families to the front (VERDICT r3
# "Next round" #2): TPC-H Q4-Q22, llm_*, stream_*/metrics_*, pipeline_*,
# upsert, UDFs, variant, physical sketches, sampling.
_WINDOW_R4 = [
    "text_quality_scores",
    "text_ngram_top20",
    "pipeline_ingest_projection",
    "pipeline_utm_attribution",
    "upsert_last_writer_wins",
    "stream_tumbling_counts",
    "stream_sliding_value_stats",
    "stream_session_windows",
    "stream_dedup_replay",
    "stream_stateful_user_totals",
    "metrics_stats_snapshot",
    "stream_stream_click_attribution",
    "metrics_ewma_rates",
    "stream_static_enrich",
    "udf_pandas_revenue",
    "udf_zscore_applyinpandas",
    "q4_priority_exists",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q9_profit_by_nation_year",
    "q10_returned_top_customers",
    "q13_order_count_distribution",
    "q14_promo_revenue_ratio",
    "q15_top_revenue_supplier",
    "q17_small_qty_avg_yearly",
    "q18_large_volume_customers",
    "q22_dormant_high_balance",
    "subquery_min_price_per_brand",
    "subquery_nested_in_suppliers",
    "join_exists_last_shipper",
    "q8_national_market_share",
    "q11_important_part_value",
    "q12_late_shipping_priority",
    "q16_supplier_count_by_part",
    "q19_disjunctive_revenue",
    "llm_decontaminate_13gram",
    "llm_tfidf_top_terms",
    "llm_train_holdout_split",
    "llm_quality_filter_rules",
    "llm_pii_redaction_events",
    "llm_token_length_histogram",
    "recursive_date_spine",
    "llm_pack_sequences",
    "variant_json_suite",
    "join_bucketed_colocated",
    "agg_hll_distinct_band",
    "agg_cms_heavy_hitters_band",
    "agg_hll_mergeable_union",
    "sample_bernoulli_band",
    "sample_stratified_by_lang",
]

# Never-checked queries that don't fit the 50-window this round; placed
# right after it so any window widening covers them before re-checking the
# already-green 50. Rotate these to the front next round.
_SECONDARY = [
    "multimodal_payload_stats",
    "multimodal_image_features",
    "agg_grouping_sets",
    "agg_percentile_approx_within_band",
    "agg_salted_skew",
    "join_right_outer_orders",
    "agg_corr_regression",
    "agg_bitwise_keys",
    "agg_median_interpolated",
    "dedup_fuzzy_blocked_pairs",
    "profile_orders_columns",
    "merge_scd2_customer_orders",
    "pivot_status_by_priority",
    "unpivot_lineitem_totals",
    "subquery_scalar_above_1p5x_avg",
    "win_ntile_pctrank_cumedist",
    "agg_listagg_nations",
    "agg_count_if_bools",
    "agg_argmax_customer",
    "join_nullsafe_status_counts",
    "win_nth_value_third",
    "sort_nulls_last_top20",
]


def _ordered(names: dict) -> list[str]:
    front = [n for n in _WINDOW_R4 + _SECONDARY if n in names]
    return front + [n for n in names if n not in set(front)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from kinesis3_spark.queries import QUERIES

    return {n: QUERIES[n] for n in _ordered(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys absent here are rows-only."""
    from kinesis3_spark.queries import ORACLE

    return {n: ORACLE[n] for n in _ordered(ORACLE)}
