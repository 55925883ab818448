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
# ROTATION RULE (codified after the r9 lesson, VERDICT r9 #1):
#   previously-DRIVER-RED (fixed but never driver-re-confirmed)
#   > changed this round > changed last round but never re-sampled
#   > new this round > stalest driver evidence, oldest round first.
# The r9 mistake was placing 66 new entries ahead of the two queries
# the r8 driver itself had flagged red — the driver's ~50-query
# window never reached its own reds.  Reds lead, always.
#
# Round-11 priority (the belt-and-braces LOCAL full-catalog sweep —
# CORRECTNESS_FULL_local_r*.json — runs on top).  The r10 verdict
# asked for a PURE stale-evidence head this round, presuming zero
# changed/new queries; the r11 ADVICE fixes touched two queries and
# the round added new ones, so the codified rule above still leads
# with those (changed > new), and the stale r4 cohort fills the rest
# of the driver's ~50-name window — the r5/r6 cohorts follow for the
# next rounds' windows.  Every prior _PRIORITY block (r10's reds/
# changed/new) is driver-green in CORRECTNESS_r10.json and rotates
# out to the registry tail.
_PRIORITY = (
    # Round-12 priority.  The r11 verdict asked for an almost-pure
    # stale-refresh head (item 1): 25 registered queries had NEVER
    # been driver-sampled, 23 still carried r4 evidence, 42 carried
    # r5 (all F11-green in the local full sweep, so this is evidence
    # freshness, not correctness risk).  The codified rule still
    # leads with reds (none) and changed-this-round, then the stale
    # cohorts: never-sampled > r4 > r5.
    # -- block 0: CHANGED by the r12 ADVICE fixes (CUPED exact
    #    per-variant integer sums; GIF disposal/transparency guards;
    #    attribution join-frame aliases)
    "stat_cuped",
    "mm_decode_gif",
    "attribution_time_decay",
    # -- block 1: NEW in round 12 (names appended as each lands —
    #    the ghost assertion below keeps the list honest)
    "stream_run_decontam",
    "graph_hits",
    "ml_ndcg_mrr",
    "ts_sax_symbols",
    "ml_naive_bayes",
    "mm_audio_features",
    "feature_hash_vectorize",
    "gov_dp_histogram",
    "stat_bh_fdr",
    "stat_levene_bf",
    "cluster_silhouette",
    # -- block 1b: NEW in the round-12 continuation session (same
    #    rule: new-this-round queries lead the stale cohorts)
    "text_blocklist_filter",
    "stream_run_blocklist",
    "text_ngram_novelty",
    "sample_dsir_importance",
    "split_time_series_cv",
    "graph_personalized_pagerank",
    "ml_gbdt_stumps",
    "geo_polygon_contains",
    "ts_dtw_pairs",
    "dq_entropy_profile",
    "stream_run_dsir_gate",
    "attribution_markov_removal",
    "ml_logistic_histogram",
    "feature_woe_iv",
    "stat_permutation_test",
    "text_zipf_slope",
    "sim_ivf_recall_eval",
    "stat_mcnemar",
    "mm_audio_dft8",
    "stat_anova_f",
    "dedup_lsh_recall_eval",
    "graph_random_walks",
    "cluster_dbscan_grid",
    "emb_matryoshka_recall",
    "udf_arrow_scalar",
    "pipeline_select_corpus",
    "ts_max_drawdown",
    "sample_neyman_allocation",
    "graph_walk_skipgram_pairs",
    "ml_offpolicy_ips",
    "anomaly_volume_days",
    "stream_run_volume_alert",
    # -- block 2: never driver-sampled (alphabetical)
    "agg_corr_exact",
    "agg_percentile_disc",
    "agg_ratio_to_report",
    "dq_skew_report",
    "feature_scale_robust",
    "fn_regex_family",
    "gov_right_to_erasure",
    "join_asof_tolerance",
    "join_null_safe",
    "mm_decode_audio",
    "mm_decode_video",
    "ops_rate_limit",
    "pipeline_churn_digest",
    "seq_audience_overlap",
    "set_union_by_name",
    "stream_run_rate_limit",
    "tpch_q13_custdist",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q4_priority_check",
    "tpch_q6_forecast_revenue",
    "ts_forecast_seasonal_naive",
    "ts_max_concurrency",
    "win_rolling_corr",
    "win_streak_longest",
    # -- block 3: stalest driver evidence (r4), alphabetical
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
    "stream_run_upsert",
    "ts_resample_ffill",
    "when_otherwise_buckets",
    "win_rank_family",
    # -- block 4: r5-latest driver evidence, alphabetical
    "agg_filtered_conditional",
    "agg_global",
    "agg_percentiles",
    "agg_pricing_summary",
    "agg_stats_moments",
    "csv_scan_roundtrip",
    "ctgov_flatten_parity",
    "ctgov_pipeline_e2e",
    "dedup_exact_group",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "fn_datetime_family",
    "join_broadcast_star",
    "join_inner_equi",
    "join_left_outer",
    "join_range_nonequi",
    "llm_classify_cost_cap",
    "llm_classify_documents",
    "maintenance_zorder",
    "merge_upsert_orders",
    "mm_binary_plumbing",
    "mm_decode_features",
    "mm_frame_sample",
    "orc_scan_roundtrip",
    "partition_pruned_scan",
    "pipeline_curate",
    "sample_stratified",
    "search_bm25",
    "search_hybrid_rrf",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "skew_salted_agg",
    "skew_salted_join",
    "text_fingerprint",
    "text_langid_quality",
    "text_pack_sequences",
    "text_tfidf_top_term",
    "text_token_stats",
    "text_top_tokens",
    "udtf_tokenize",
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
        geo,
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
