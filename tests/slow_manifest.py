"""Centralized slow-test manifest (round 15, VERDICT r14 "Next round" #1).

The driver's verification budget truncated the FULL 772-test suite in
round 14 (VERIFY_r14.tests_ok=false at ~74%% with zero failures — a
timeout, not a regression). The default pytest profile therefore
deselects the tests below (every test whose measured call time exceeded
8 s in the round-15 full-suite profile — 63 of 772 tests carrying ~56%%
of the suite's 43-minute wall clock), bringing the default run to
~19 minutes. NOTHING is deleted: `pytest -m ""` (or -m "slow or not
slow") still runs the full suite, and the round log records a full-suite
green run before the final commit. Durations: /tmp-profiled 2026-08-17,
quiet 32-core host, sf0.001.

Queries whose oracle-parity param lands here keep their coverage through
the driver's 50-query correctness rotation (__spark_entry__ fronts
changed/unchecked queries) and the builder's full driver-replica sweep.
"""

SLOW_TESTS = {
    "test_oracle_parity.py::test_query_matches_oracle[dedup_winnowing_fingerprints]",  # 171.0s
    "test_similarity.py::test_semdedup_cell_count_derives_from_corpus_size",  # 83.6s
    "test_txn_datasource.py::test_stream_rate_limit_restart_batch_is_bounded",  # 65.8s
    "test_properties.py::test_exact_substring_span_invariants",  # 48.4s
    "test_statestore.py::test_rocksdb_drains_match_default_provider",  # 47.3s
    "test_txn_datasource.py::test_stream_rate_limit_caps_files_per_trigger",  # 40.1s
    "test_sinks.py::test_txn_bin_packing_rewrites_only_small_files",  # 39.7s
    "test_oracle_parity.py::test_query_matches_oracle[llm_split_contamination_audit]",  # 33.4s
    "test_similarity.py::test_semdedup_finds_planted_dups_within_cells",  # 32.8s
    "test_sinks.py::test_txn_clustered_compaction_tightens_zone_maps",  # 30.4s
    "test_oracle_parity.py::test_query_matches_oracle[dedup_keep_best_per_cluster]",  # 30.1s
    "test_oracle_parity.py::test_query_matches_oracle[llm_leakage_safe_split]",  # 28.4s
    "test_oracle_parity.py::test_query_matches_oracle[dedup_connected_components]",  # 27.4s
    "test_similarity.py::test_neardup_finds_planted_pairs",  # 26.4s
    "test_sinks.py::test_count_rows_is_metadata_exact_across_dml_lifecycle",  # 24.6s
    "test_streaming.py::test_continuous_rollup_matches_batch",  # 24.5s
    "test_sinks.py::test_merge_manifest_stream_cdc_with_deletes",  # 23.1s
    "test_lm_property.py::test_psi_nonnegative_and_zero_on_self",  # 22.9s
    "test_oracle_parity.py::test_query_matches_oracle[dedup_drop_neardup]",  # 22.5s
    "test_analytics_planted.py::test_ks_identical_vs_shifted_distributions",  # 22.4s
    "test_dedup_recall.py::test_leakage_safe_split_groups_never_straddle",  # 22.0s
    "test_txn_generated.py::test_generated_zone_maps_prune_derived_predicates",  # 21.4s
    "test_packing.py::test_chunk_layout_properties",  # 20.7s
    "test_app.py::test_stats_surfaces_stream_state_metrics",  # 20.2s
    "test_txn_checkpoint.py::test_vacuum_trims_floor_and_history_stays_identical",  # 19.3s
    "test_txn_checkpoint.py::test_history_identical_with_and_without_checkpoint",  # 18.9s
    "test_fullouter_property.py::test_full_outer_matches_bruteforce",  # 18.6s
    "test_lm_property.py::test_lm_scorer_matches_python_reference",  # 18.5s
    "test_merge_property.py::test_merge_matches_python_model",  # 18.4s
    "test_txn_datasource.py::test_pushdown_prunes_files_and_stays_exact",  # 17.5s
    "test_txn_checkpoint.py::test_auto_checkpoint_written_every_interval",  # 17.3s
    "test_stateful.py::test_state_carries_across_batches",  # 17.2s
    "test_bpe.py::test_bpe_loop_matches_pure_python_reference_on_random_corpora",  # 16.7s
    "test_multimodal.py::test_resize_roundtrip",  # 16.3s
    "test_sql_surface.py::test_txntable_sql_view_pushdown_prunes_through_pure_sql",  # 15.1s
    "test_txn_protocol.py::test_protocol_refusal_is_not_swallowed_as_reaped_history",  # 15.0s
    "test_txn_checkpoint.py::test_vacuum_reaps_historical_files_via_checkpoint_refs",  # 14.1s
    "test_txn_dv.py::test_randomized_op_sequences_match_dict_model",  # 14.1s
    "test_lmquality.py::test_quality_classifier_cache_holds_plain_floats_not_model",  # 14.0s
    "test_txn_checkpoint.py::test_checkpoint_loss_degrades_to_full_walk",  # 13.6s
    "test_sequence_ops.py::test_duckdb_re2_count_matches_python",  # 13.3s
    "test_fullouter_property.py::test_right_outer_is_full_outer_minus_unmatched_purchases",  # 13.1s
    "test_lmquality.py::test_quality_classifier_separates_planted_vocabularies",  # 13.0s
    "test_txn_checkpoint.py::test_history_reads_bounded_manifests_after_checkpoint",  # 12.4s
    "test_txn_checkpoint.py::test_vacuum_prunes_refs_for_deleted_paths",  # 12.1s
    "test_colmap_property.py::test_random_alter_chains_match_name_model",  # 11.9s
    "test_oracle_parity.py::test_query_matches_oracle[graph_knn_edges_recall_band]",  # 11.3s
    "test_txn_datasource.py::test_medallion_bronze_silver_end_to_end",  # 11.2s
    "test_txn_datasource.py::test_fail_on_mapping_change_ignores_rename_outside_range",  # 10.8s
    "test_txn_protocol.py::test_writer_refuses_unknown_manifest_keys",  # 10.6s
    "test_txn_datasource.py::test_stream_fail_on_mapping_change_is_strict",  # 10.4s
    "test_txn_datasource.py::test_writer_zone_maps_prune_reads",  # 10.3s
    "test_txn_datasource.py::test_stream_rate_limit_counts_dv_and_removed_slices",  # 10.2s
    "test_similarity.py::test_ivf_recall_on_planted_pairs",  # 10.2s
    "test_properties.py::test_parse_cookies_matches_python",  # 10.1s
    "test_dedup_scale.py::test_lsh_bucket_cap_drops_flood_keeps_neardups",  # 9.5s
    "test_properties.py::test_ngrams_matches_python",  # 9.5s
    "test_txn_concurrency.py::test_two_writers_interleaved_merges_converge",  # 9.3s
    "test_properties.py::test_tokenize_matches_python_split",  # 9.3s
    "test_properties.py::test_url_codec_roundtrip",  # 9.3s
    "test_txn_concurrency.py::test_random_crash_points_converge_via_repair",  # 9.2s
    "test_txn_datasource.py::test_stream_change_feed_emits_inserts_and_deletes",  # 8.8s
    "test_sinks.py::test_txn_uncommitted_version_residue_is_not_readable",  # 8.8s
}
