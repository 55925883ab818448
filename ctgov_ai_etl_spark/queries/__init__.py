"""Query catalog: every operator from SURVEY.md §2.3 as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable registered
with an optional ANSI-SQL oracle string that DuckDB runs on the same
parquet tables.  The driver (and ``tools/check_oracle.py``) compares
row count + schema + order-insensitive value hash, so every query
aliases computed columns identically on both sides and keeps float
results either exact (integer-cents arithmetic for money aggregates)
or rounded coarsely enough that both engines agree bit-for-bit.
"""

from ctgov_ai_etl_spark.queries.registry import REGISTRY, QuerySpec, query

# The driver walks ``queries()`` in registration order and checks the
# first ~40-50 per round, so ``load_all`` re-orders the registry each
# round to put queries with no (or stale) driver evidence first.
#
# Round-8 priority, continuing the rotation (the belt-and-braces LOCAL
# full-catalog sweep — CORRECTNESS_FULL_local_r0*.json — runs on top):
#   block 0a — the 18 queries NEW in the round-8 continuation session
#     (clamped balance x3 strategies, BFS layers, Q3/Q5 composites,
#     transition matrix, attribution batch+streaming, k-anonymity,
#     feature scaling, SCD2 PIT join, equi-depth histogram, two-stage
#     top-k, Benford, dyadic EWMA, systematic sampling, entity
#     resolution);
#   block 0b — the 23 queries new earlier in round 8 (interval
#     banding and overlap joins, streaming CMS build, capped
#     sessionization, MAD outliers, chunk-global dedup, CMS and KMV
#     sketches, LOO target encoding, fixed histogram, PSI drift, ring
#     negative sampling);
#   block 1 — queries whose implementation or oracle CHANGED this
#     round (session-oracle tie ordering, multipass grouping-sets
#     empty-input semantics, split-fraction rounding);
#   block 2 — the queries whose latest driver evidence is r5 or
#     older (not sampled in CORRECTNESS_r06/r07), alphabetical;
#   everything else (r6/r7-green, unchanged) follows alphabetically.
_PRIORITY = (
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "sql_text_star_join",
    "stat_gini_concentration",
    "fn_bitwise_family",
    "tpch_q18_top_customers",
    "stat_chi_square",
    "stat_ab_ttest",
    "ml_linear_regression_exact",
    "search_phrase_positions",
    "stream_run_topk_window",
    "ts_downsample_ohlc",
    "win_median_rolling",
    "stream_run_ohlc",
    "ts_clamped_cumsum",
    "ts_clamped_cumsum_chunked",
    "stream_run_running_balance",
    "graph_bfs_layers",
    "tpch_q3_priority",
    "tpch_q5_local_supplier",
    "seq_transition_matrix",
    "attribution_last_touch",
    "stream_run_attribution",
    "dq_k_anonymity",
    "feature_scale_standard",
    "join_temporal_scd2",
    "agg_histogram_equidepth",
    "win_topk_two_stage",
    "dq_benford",
    "ts_ewma_window",
    "sample_systematic",
    "pipeline_entity_resolution",
    "join_interval_binned",
    "ts_sessionize_capped",
    "anomaly_mad",
    "dedup_chunks_global",
    "sketch_cms_freq",
    "sketch_kmv_intersect",
    "feature_target_encode_loo",
    "agg_histogram_fixed",
    "dq_drift_psi",
    "sample_negatives_ring",
    "join_interval_overlap",
    "stream_run_cms_sketch",
    "stream_run_interval_join",
    "agg_mode_deterministic",
    "dq_sequence_gaps",
    "win_time_range_frame",
    "pipeline_curate_chunks",
    "fn_hash_family",
    "agg_corr_exact",
    "join_asof_tolerance",
    "win_streak_longest",
    "join_null_safe",
    "stream_run_capped_sessions",
    "stream_session_window",
    "stream_run_session_window",
    "agg_grouping_sets_multi",
    "split_group_aware",
    "agg_filtered_conditional",
    "agg_global",
    "agg_grouping_sets",
    "agg_percentiles",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_stats_moments",
    "cdc_snapshot_diff",
    "cluster_kmeans",
    "csv_scan_roundtrip",
    "ctgov_flatten_parity",
    "ctgov_pipeline_e2e",
    "curriculum_order",
    "dedup_embedding_blocked",
    "dedup_embedding_cosine",
    "dedup_exact_group",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "distinct_rows",
    "essie_predicates",
    "essie_search_text",
    "filter_in_set",
    "filter_like_regex",
    "filter_range_bool",
    "fn_array_family",
    "fn_datetime_family",
    "fn_math_family",
    "fn_null_family",
    "fn_partial_date_normalize",
    "fn_string_family",
    "graph_pagerank",
    "incremental_agg_refresh",
    "inline_values_table",
    "join_anti",
    "join_broadcast_star",
    "join_bucket_colocated",
    "join_cross",
    "join_full_outer",
    "join_inner_equi",
    "join_left_outer",
    "join_range_nonequi",
    "join_right_outer",
    "join_semi",
    "limit_offset",
    "llm_classify_bucket_cap",
    "llm_classify_cost_cap",
    "llm_classify_documents",
    "maintenance_zorder",
    "merge_upsert_orders",
    "mm_binary_plumbing",
    "mm_decode_features",
    "mm_frame_sample",
    "orc_scan_roundtrip",
    "parquet_schema_evolution",
    "partition_pruned_scan",
    "pipeline_curate",
    "proj_rename_nested",
    "sample_stratified",
    "scan_project_filter",
    "search_bm25",
    "search_hybrid_rrf",
    "set_except_all",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_ivf_trained",
    "sim_topk_lsh",
    "sim_topk_pq",
    "skew_salted_agg",
    "skew_salted_join",
    "sort_limit_deterministic",
    "sort_nulls_ordering",
    "stream_run_upsert",
    "text_chunked",
    "text_fingerprint",
    "text_langid_quality",
    "text_pack_sequences",
    "text_tfidf_top_term",
    "text_token_stats",
    "text_top_tokens",
    "ts_resample_ffill",
    "udtf_tokenize",
    "when_otherwise_buckets",
    "win_rank_family",
    "win_topk_per_group",
)
_PRIORITY_POS = {n: i for i, n in enumerate(_PRIORITY)}


def load_all() -> dict[str, QuerySpec]:
    """Import every query module, then order the registry driver-first.

    Order: new-this-round (never checked) -> changed-this-round (old
    evidence stale by construction) -> round-1-latest evidence
    (stalest, cheapest first) -> round-2-latest -> the r3-green rest.
    """
    from ctgov_ai_etl_spark.queries import (  # noqa: F401
        relational,
        scalars,
        windows,
        udfs,
        scans,
        scale,
        semantic,
        parity,
        stream_batch,
        multimodal,
        graph,
        analytics,
        product,
    )

    def rank(name: str) -> tuple[int, str]:
        pos = _PRIORITY_POS.get(name)
        if pos is not None:
            return (pos, "")
        return (len(_PRIORITY), name)

    ghosts = [n for n in _PRIORITY if n not in REGISTRY]
    assert not ghosts, (
        f"_PRIORITY names missing from REGISTRY: {ghosts} — the "
        "rotation bookkeeping must never advertise unimplemented "
        "queries (ADVICE r5)"
    )
    ordered = sorted(REGISTRY, key=lambda n: rank(n))
    if list(REGISTRY) != ordered:
        reordered = {name: REGISTRY[name] for name in ordered}
        REGISTRY.clear()
        REGISTRY.update(reordered)
    return REGISTRY
