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
# first ~40-50 per round (r1: 44, r2: 38, r3: 50), so ``load_all``
# re-orders the registry each round to put queries with no (or stale)
# driver evidence first.
#
# Round-4 priority, per VERDICT.md r3 items 1 and 3 (rotate
# oldest-verified-first; no query's latest evidence older than two
# rounds):
#   block 0 — queries NEW this round (never driver-checked);
#   block 1 — queries whose implementation or oracle CHANGED this
#     round (their older green rows no longer describe today's code:
#     the embedding tier was re-registered/re-quantized, the jaccard
#     family's dictionary encoding was rebuilt);
#   block 2 — the 44 queries whose latest hash-check is round 1,
#     cheapest first so a time-budgeted window re-greens the most
#     (the r3 done-condition: ≥40 of these);
#   block 3 — the remaining round-2-latest queries, cheapest first;
#   everything else (r3-green, unchanged) follows alphabetically.
_PRIORITY = (
    # -- block 0: new in r4, never driver-checked -------------------
    "sim_topk_ivf_trained",
    "llm_classify_bucket_cap",
    "parquet_schema_evolution",
    "stream_run_upsert",
    "dedup_keep_best",
    "graph_pagerank",
    "cdc_snapshot_diff",
    "cluster_kmeans",
    "sim_topk_pq",
    "maintenance_zorder",
    "incremental_agg_refresh",
    "join_bucket_colocated",
    "ts_resample_ffill",
    "curriculum_order",
    # -- block 1: impl/oracle changed in r4 -------------------------
    # (dedup_components is omitted: its only change is inside
    # jaccard_token_pairs, which dedup_jaccard_pairs verifies with the
    # same pair set, and the identically-oracled dedup_components_star
    # has round-3 evidence)
    "dedup_embedding_cosine",  # re-registered over a bounded slice
    "dedup_embedding_blocked",  # trained-64 quantizer constants
    "dedup_jaccard_pairs",  # singleton-free dictionary encoding
    "dedup_jaccard_bigram",  # singleton-free dictionary encoding
    # -- block 2: latest evidence is round 1 (stalest), cheap first -
    "essie_search_text",
    "filter_in_set",
    "sort_nulls_ordering",
    "proj_rename_nested",
    "filter_like_regex",
    "fn_null_family",
    "limit_offset",
    "filter_range_bool",
    "essie_predicates",
    "sort_limit_deterministic",
    "scan_project_filter",
    "join_cross",
    "set_union_all",
    "fn_array_family",
    "join_semi",
    "join_right_outer",
    "agg_grouping_sets",
    "agg_collect_set",
    "set_union_distinct",
    "join_anti",
    "win_rank_family",
    "fn_math_family",
    "distinct_rows",
    "when_otherwise_buckets",
    "fn_string_family",
    "join_full_outer",
    "agg_filtered_conditional",
    "set_intersect",
    "inline_values_table",
    "set_except_all",
    "agg_rollup",
    "fn_partial_date_normalize",
    "fn_datetime_family",
    "agg_count_distinct",
    "merge_upsert_orders",
    "join_left_outer",
    "agg_cube",
    "join_range_nonequi",
    "agg_global",
    "agg_approx_count_distinct",
    "agg_pricing_summary",
    "join_broadcast_star",
    "join_inner_equi",
    "win_topk_per_group",
    # -- block 3: latest evidence is round 2, cheap first -----------
    "mm_binary_plumbing",
    "text_fingerprint",
    "text_token_stats",
    "mm_frame_sample",
    "text_pack_sequences",
    "mm_decode_features",
    "dedup_exact_group",
    "udtf_tokenize",
    "ctgov_flatten_parity",
    "agg_stats_moments",
    "csv_scan_roundtrip",
    "sample_stratified",
    "skew_salted_agg",
    "agg_percentiles",
    "text_chunked",
    "ctgov_pipeline_e2e",
    "search_bm25",
    "orc_scan_roundtrip",
    "partition_pruned_scan",
    "skew_salted_join",
    "agg_approx_quantile",
    "search_hybrid_rrf",
    "text_tfidf_top_term",
    "llm_classify_cost_cap",
    "sim_topk_lsh",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "llm_classify_documents",
    "pipeline_curate",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "text_langid_quality",
    "text_top_tokens",
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
    )

    def rank(name: str) -> tuple[int, str]:
        pos = _PRIORITY_POS.get(name)
        if pos is not None:
            return (pos, "")
        return (len(_PRIORITY), name)

    ordered = sorted(REGISTRY, key=lambda n: rank(n))
    if list(REGISTRY) != ordered:
        reordered = {name: REGISTRY[name] for name in ordered}
        REGISTRY.clear()
        REGISTRY.update(reordered)
    return REGISTRY
