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
    # -- block 0: CHANGED by the r11 ADVICE fixes (NULL-propagating
    #    checksum canonicalization; abs() modulo in the JPEG fixture)
    "dq_dataset_checksum",
    "mm_decode_jpeg",
    # -- block 1: NEW in round 11 (names appended as each lands —
    #    the ghost assertion below keeps the list honest)
    "mm_decode_jpeg_progressive",
    "geo_grid_rollup",
    "geo_geohash_join",
    "geo_fence_transitions",
    "stat_kendall_tau",
    "stat_theil_sen",
    "dq_t_closeness",
    "ml_isotonic_regression",
    "ts_motif_ssd",
    "sample_priority_weighted",
    "stream_run_geo_fence",
    "ts_changepoint_binseg",
    "sample_kcenter_coreset",
    "ml_decision_stump",
    "fn_uuid_deterministic",
    "mm_decode_gif",
    "text_rake_keywords",
    "stat_cuped",
    "survival_nelson_aalen",
    "mm_decode_bmp",
    "ml_roc_curve",
    "ml_calibration_ece",
    "stat_power_mde",
    "stream_run_priority_sample",
    "join_array_overlap",
    "attribution_time_decay",
    "stat_cohens_kappa",
    "ml_bradley_terry",
    # -- block 2: stalest driver evidence (r4, never re-sampled
    #    since), alphabetical; the r5 cohort follows in the registry
    #    tail ordering below
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
    "stream_run_upsert",
    "ts_resample_ffill",
    "when_otherwise_buckets",
    "win_rank_family",
    # -- block 3: r5-latest driver evidence, alphabetical
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
        round10,
        round11,
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
