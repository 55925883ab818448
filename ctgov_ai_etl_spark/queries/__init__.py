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
# first ~40-50 per round (r1: 44, r2: 38, r3: 50, r4: 47, r5: 50), so
# ``load_all`` re-orders the registry each round to put queries with
# no (or stale) driver evidence first.
#
# Round-6 priority, per VERDICT.md r5 item 6 (keep the rotation
# honest: after r6 no query's latest evidence should be older than
# r4).  Evidence histogram after r5: 50 r5-latest, 47 r4, 49 r3.
#   block 0 — queries NEW this round (never driver-checked):
#     cdc_time_travel, sample_reservoir, graph_triangle_count —
#     implemented this round (they were phantom _PRIORITY names in
#     r5; VERDICT r5 "What's wrong" 1) — plus the new r6
#     capabilities: embed_random_projection (JL), the SemDeDup tiers
#     (pairwise prune / group-exact / incremental / streaming),
#     lm_bigram_score, dedup_sorted_neighborhood,
#     quality_linear_score, sample_temperature,
#     text_boilerplate_lines, sim_topk_ivfpq,
#     pipeline_curate_semantic, skew_key_profile,
#     stream_run_quality_filter, text_hash_embedding, graph_kcore,
#     dedup_snm_multipass;
#   block 1 — the 49 r3-latest queries, cheapest first (merged
#     BENCH_r01-r05 timings) so a time-budgeted window re-greens the
#     most; no query's OUTPUT changed this round (the k-means reseed
#     and reservoir n_hint paths are opt-in parameters off the
#     oracle-checked defaults), so there is no changed-output block;
#   everything else (r4/r5-green, unchanged) follows alphabetically.
_PRIORITY = (
    # -- block 0: new in r6, never driver-checked -------------------
    "cdc_time_travel",
    "sample_reservoir",
    "graph_triangle_count",
    "embed_random_projection",
    "dedup_semantic_prune",
    "lm_bigram_score",
    "dedup_sorted_neighborhood",
    "quality_linear_score",
    "dedup_semantic_groups",
    "sample_temperature",
    "dedup_semantic_incremental",
    "text_boilerplate_lines",
    "stream_run_semantic_admission",
    "sim_topk_ivfpq",
    "pipeline_curate_semantic",
    "skew_key_profile",
    "stream_run_quality_filter",
    "text_hash_embedding",
    "graph_kcore",
    "dedup_snm_multipass",
    # -- block 1: the 49 r3-latest queries, cheap first -------------
    "binary_file_scan",
    "unpivot_stack",
    "text_token_bpe",
    "essie_search_nested_struct",
    "stream_sliding_window",
    "set_intersect_all",
    "win_sliding_frame",
    "agg_hll_sketch_merge",
    "win_running_sum",
    "udf_pandas_scalar",
    "win_lag_lead",
    "text_scan_roundtrip",
    "udf_map_in_arrow",
    "stream_tumbling_window",
    "json_corrupt_records",
    "text_gopher_rules",
    "scd2_history",
    "pivot_status_matrix",
    "xml_scan_roundtrip",
    "stream_session_window",
    "win_first_last",
    "fn_variant_family",
    "text_perplexity_proxy",
    "join_asof",
    "fn_json_map_family",
    "json_scan_roundtrip",
    "text_pii_redact",
    "shuffle_training_order",
    "fn_try_family",
    "udf_grouped_agg",
    "text_repetition",
    "maintenance_compact_files",
    "sample_mixture",
    "win_rank_distributed",
    "stream_run_static_join",
    "stream_run_tumbling",
    "join_bloom_semi",
    "stream_run_dedup",
    "sim_topk_ivf_partitioned",
    "stream_run_stateful_auto",
    "stream_run_rest_source",
    "stream_run_stream_join",
    "decontam_ngram",
    "udf_grouped_map",
    "dedup_substring_spans",
    "stream_run_stateful",
    "pipeline_curate_full",
    "dedup_incremental",
    "dedup_components_star",
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
