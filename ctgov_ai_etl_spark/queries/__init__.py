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
# Round-5 priority, per VERDICT.md r4 item 1 (clear the last
# verification debt: all 46 queries whose latest evidence is r1/r2
# fit in ONE 50-query window):
#   block 0 — queries NEW this round (never driver-checked):
#     cdc_time_travel, sample_reservoir, graph_triangle_count;
#   block 1 — queries whose OUTPUT changed this round:
#     maintenance_zorder (Morton code widened from 16 to 32 bits per
#     dimension per ADVICE.md, so bucket boundaries moved).  Plan-only
#     or output-identical fixes stay out of this block on purpose:
#     dedup_embedding_cosine (broadcast hint), join_bucket_colocated
#     (unique metastore names), incremental_agg_refresh (eqNullSafe on
#     a non-null shipped key) all produce byte-identical results, and
#     dedup_components keeps the same components/oracle under the
#     star-default switch — it is in block 2 below anyway;
#   block 2 — the 46 stale queries (12 r1-latest + 34 r2-latest),
#     cheapest first so a time-budgeted window re-greens the most;
#   everything else (r3/r4-green, unchanged) follows alphabetically.
_PRIORITY = (
    # -- block 0: new in r5, never driver-checked -------------------
    "cdc_time_travel",
    "sample_reservoir",
    "graph_triangle_count",
    # -- block 1: output changed in r5 ------------------------------
    "maintenance_zorder",
    # -- block 2: the 46 stale queries, cheap first (BENCH_r04) -----
    "mm_binary_plumbing",
    "text_fingerprint",
    "text_token_stats",
    "mm_frame_sample",
    "text_pack_sequences",
    "mm_decode_features",
    "fn_datetime_family",
    "agg_count_distinct",
    "merge_upsert_orders",
    "join_left_outer",
    "ctgov_flatten_parity",
    "sample_stratified",
    "udtf_tokenize",
    "agg_cube",
    "dedup_exact_group",
    "agg_stats_moments",
    "join_range_nonequi",
    "skew_salted_agg",
    "text_top_tokens",
    "csv_scan_roundtrip",
    "search_bm25",
    "text_chunked",
    "text_langid_quality",
    "agg_approx_quantile",
    "agg_global",
    "agg_percentiles",
    "orc_scan_roundtrip",
    "skew_salted_join",
    "win_topk_per_group",
    "llm_classify_cost_cap",
    "llm_classify_documents",
    "partition_pruned_scan",
    "text_tfidf_top_term",
    "search_hybrid_rrf",
    "join_inner_equi",
    "join_broadcast_star",
    "agg_pricing_summary",
    "agg_approx_count_distinct",
    "pipeline_curate",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_topk_bruteforce",
    "ctgov_pipeline_e2e",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_components",
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
