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
# Round-9 priority, continuing the rotation (the belt-and-braces LOCAL
# full-catalog sweep — CORRECTNESS_FULL_local_r0*.json — runs on top):
#   block 0 — the 40 queries NEW in round 9 (real-codec multimodal
#     decode, product analytics: time-boxed + streaming funnel, RFM,
#     Kaplan-Meier, path sequences; frontier ops: Pareto skyline,
#     basket affinity, weighted median, hierarchy rollup, CUSUM, KS
#     drift, embedding covariance, sliding distinct, l-diversity,
#     uniqueness profile, correlated-avg filter, robust scaling,
#     unionByName drift, seasonal-naive backtest, and the five
#     remaining fixture-expressible TPC-H shapes Q4/Q6/Q13/Q17/Q19);
#   block 1 — queries whose implementation or oracle CHANGED in round
#     9 (the two HUGEINT oracle casts, null-ts session oracles,
#     single-space tokenization alignment, equi-depth floor-div,
#     uniform_hash_rank persist, chunked-balance broadcast drop);
#   block 2 — the queries whose latest driver evidence is r4/r5
#     (not sampled since), stalest first (also re-verified locally
#     this round via tools/check_oracle.py — see COVERAGE.md);
#   everything else (r6-r8-green, unchanged) follows alphabetically.
_PRIORITY = (
    # -- block 0a: waves 10-17 (newest, no sf0.1 artifact yet)
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q15_top_supplier",
    "tpch_q22_idle_rich_customers",
    "text_bpe_merge_rank",
    "emb_quantize_int8",
    "maintenance_zonemap_prune",
    "mm_resize_real",
    "mm_frame_sample_real",
    "stat_winsorized_mean",
    "stat_sprt",
    "text_url_canonicalize",
    "stream_run_sprt",
    "sample_balanced_classes",
    "pipeline_web_corpus",
    "mm_audio_downsample",
    "fn_url_family",
    "join_asof_nearest",
    "ops_burn_rate",
    "text_html_extract",
    "maintenance_compact_binpack",
    "agg_bitmap_distinct_days",
    "stream_run_bitmap_days",
    "mm_dedup_phash",
    "stream_run_burn_rate",
    "gov_audit_chain",
    "mm_video_scene_cuts",
    "stream_run_audit_chain",
    "filter_like_regex",
    "stream_run_stream_join_outer",
    "agg_bitmap_streaks",
    "stat_mann_whitney",
    "agg_bitmap_cohort_retention",
    # -- block 0b: round-9 waves 1-9 (covered by the committed
    #    CORRECTNESS_SF01_r09_new.json sf0.1 artifact)
    "mm_decode_real",
    "funnel_within_window",
    "stream_run_funnel",
    "rfm_segmentation",
    "survival_km",
    "path_top_sequences",
    "pareto_frontier",
    "basket_pair_affinity",
    "agg_weighted_median",
    "hierarchy_rollup",
    "anomaly_cusum",
    "dq_drift_ks",
    "emb_covariance_matrix",
    "win_distinct_sliding",
    "dq_l_diversity",
    "dq_uniqueness_profile",
    "filter_correlated_avg",
    "feature_scale_robust",
    "set_union_by_name",
    "ts_forecast_seasonal_naive",
    "tpch_q4_priority_check",
    "tpch_q6_forecast_revenue",
    "tpch_q13_custdist",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "attribution_linear",
    "ts_max_concurrency",
    "fn_regex_family",
    "gov_right_to_erasure",
    "agg_ratio_to_report",
    "seq_user_churn",
    "ops_rate_limit",
    "stream_run_rate_limit",
    "agg_percentile_disc",
    "seq_audience_overlap",
    "dq_skew_report",
    "win_rolling_corr",
    "pipeline_churn_digest",
    "mm_decode_audio",
    "mm_decode_video",
    # -- block 1: changed in round 9
    "seq_transition_matrix",
    "dq_benford",
    "stream_run_capped_sessions",
    "ts_sessionize_capped",
    "sketch_cms_freq",
    "dedup_chunks_global",
    "pipeline_curate_chunks",
    "agg_histogram_equidepth",
    "sample_negatives_ring",
    "ts_clamped_cumsum_chunked",
    "text_chunked",
    # -- block 2: stalest driver evidence (r4/r5), oldest first
    "agg_grouping_sets",
    "agg_rollup",
    "cdc_snapshot_diff",
    "cluster_kmeans",
    "curriculum_order",
    "dedup_embedding_blocked",
    "dedup_embedding_cosine",
    "distinct_rows",
    "essie_predicates",
    "essie_search_text",
    "filter_in_set",
    "filter_range_bool",
    "fn_array_family",
    "fn_math_family",
    "fn_null_family",
    "fn_partial_date_normalize",
    "fn_string_family",
    "graph_pagerank",
    "incremental_agg_refresh",
    "inline_values_table",
    "join_anti",
    "join_bucket_colocated",
    "join_cross",
    "join_full_outer",
    "join_right_outer",
    "join_semi",
    "limit_offset",
    "llm_classify_bucket_cap",
    "parquet_schema_evolution",
    "proj_rename_nested",
    "scan_project_filter",
    "set_except_all",
    "set_intersect",
    "set_union_all",
    "set_union_distinct",
    "sim_topk_ivf_trained",
    "sim_topk_pq",
    "sort_limit_deterministic",
    "sort_nulls_ordering",
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
