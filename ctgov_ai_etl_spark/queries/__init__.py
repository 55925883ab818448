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
# first ~50 per round (CORRECTNESS_r01 = first 50, _r02 = next 50), so
# ``load_all`` re-orders the registry each round to put queries with no
# (or stale) driver evidence first.
#
# Round-3 priority, per VERDICT.md r2 items 3 and 5:
#   block 0 — 20 queries that have NEVER had a CORRECTNESS row (all
#     round-2 additions), cheapest first;
#   block 1 — the 9 rows red in CORRECTNESS_r02 (events-loader
#     AnalysisException / corrupted stream timestamps), now fixed by the
#     dtype-adaptive loader and needing green evidence;
#   block 2 — the 4 r1-green queries that load events and silently
#     regressed when the storage dtype changed (green-on-paper only);
#   block 3 — everything with green r1/r2 evidence that still holds.
_PRIORITY = (
    # -- block 0: never driver-checked ------------------------------
    "text_pii_redact",
    "text_repetition",
    "sample_mixture",
    "decontam_ngram",
    "text_token_bpe",
    "fn_try_family",
    "fn_variant_family",
    "udf_map_in_arrow",
    "agg_approx_top_k",
    "agg_hll_sketch_merge",
    "binary_file_scan",
    "text_scan_roundtrip",
    "join_bloom_semi",
    "win_rank_distributed",
    "stream_run_stream_join",
    "dedup_components_star",
    "win_first_last",
    "set_intersect_all",
    "pivot_status_matrix",
    "unpivot_stack",
    "sim_topk_ivf_partitioned",  # new in r3
    "stream_run_stateful_auto",  # new in r3
    "text_gopher_rules",  # new in r3
    "dedup_substring_spans",  # new in r3
    "shuffle_training_order",  # new in r3
    "pipeline_curate_full",  # new in r3
    "stream_run_rest_source",  # new in r3
    "xml_scan_roundtrip",  # new in r3
    "json_corrupt_records",  # new in r3
    "text_perplexity_proxy",  # new in r3
    "dedup_incremental",  # new in r3
    "maintenance_compact_files",  # new in r3
    # -- block 1: red in CORRECTNESS_r02, fixed this round ----------
    "essie_search_nested_struct",
    "json_scan_roundtrip",
    "udf_pandas_scalar",
    "udf_grouped_map",
    "udf_grouped_agg",
    "stream_tumbling_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_run_tumbling",
    # -- block 2: r1-green but events-loading (silent regression) ---
    "join_asof",
    "fn_json_map_family",
    "win_lag_lead",
    "win_sliding_frame",
    # -- window filler: events-adjacent queries whose r2 green rows
    #    predate the dtype fix on some code paths (cheap re-confirms)
    "stream_run_dedup",
    "stream_run_stateful",
    "stream_run_static_join",
    "win_running_sum",
    "scd2_history",
    # -- window filler 2: the heavyweight headline family — green in
    #    r2, listed so a ~50-query window refreshes their hash evidence
    #    under this round's loader changes
    "dedup_minhash_lsh",
    "sim_topk_ivf",
    "search_hybrid_rrf",
    "pipeline_curate",
    "llm_classify_documents",
    "ctgov_pipeline_e2e",
)
_PRIORITY_POS = {n: i for i, n in enumerate(_PRIORITY)}


def load_all() -> dict[str, QuerySpec]:
    """Import every query module, then order the registry driver-first.

    Order: never-driver-checked round-2 additions -> queries red in
    CORRECTNESS_r02 (events loader, fixed this round) -> silently
    regressed r1-green events queries -> the rest (green evidence
    already on file).
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
