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
    # Round-15 priority.  Codified rule (r9 lesson): previously-
    # DRIVER-RED (fixed, awaiting driver re-confirmation) > changed
    # this round > new this round > stalest driver evidence, oldest
    # cohort first.  No driver-reds this round (r14 sample 50/50
    # green).  The r14 window consumed the r4 stragglers and 34 of
    # the r5 cohort; the stale floor is the 8-name r5 remainder,
    # then the 45-name r6 cohort — this window leads with the two
    # changed oracles, the one new query, the r5 remainder, and as
    # much of r6 as fits the driver's ~50-name sample (the last few
    # r6 names roll to r16).  Every r14 block (driver-green in
    # CORRECTNESS_r14.json) rotates to the tail.
    # -- block 0: CHANGED this round (zip/warcgz oracles: local-
    #    header stride now computed as 30 + len(name) + size instead
    #    of the hardcoded 41, ADVICE r14; same answers on current
    #    fixtures — re-confirm under the driver's DuckDB)
    "zip_scan_entries",
    "warcgz_scan_records",
    # -- block 1: NEW in round 15 (ISO-BMFF box walk, RIFF/WAVE walk,
    #    PDF xref/object walk)
    "mm_video_mp4_boxes",
    "mm_audio_wav_meta",
    "doc_pdf_meta",
    # -- block 2: r5-latest driver evidence (the 8-name remainder
    #    the r14 window didn't reach)
    "text_fingerprint",
    "text_langid_quality",
    "text_pack_sequences",
    "text_tfidf_top_term",
    "text_token_stats",
    "text_top_tokens",
    "udtf_tokenize",
    "win_topk_per_group",
    # -- block 3: r6-latest driver evidence (whole cohort,
    #    alphabetical; the tail past the driver's window rolls to
    #    the r16 head)
    "agg_hll_sketch_merge",
    "binary_file_scan",
    "cdc_time_travel",
    "dedup_semantic_incremental",
    "dedup_semantic_prune",
    "dedup_snm_multipass",
    "dedup_sorted_neighborhood",
    "embed_random_projection",
    "essie_search_nested_struct",
    "fn_json_map_family",
    "fn_try_family",
    "fn_variant_family",
    "graph_triangle_count",
    "join_asof",
    "json_corrupt_records",
    "json_scan_roundtrip",
    "lm_bigram_score",
    "pipeline_curate_semantic",
    "pivot_status_matrix",
    "quality_linear_score",
    "sample_reservoir",
    "sample_temperature",
    "scd2_history",
    "set_intersect_all",
    "shuffle_training_order",
    "sim_topk_ivfpq",
    "stream_run_quality_filter",
    "stream_session_window",
    "stream_sliding_window",
    "stream_tumbling_window",
    "text_boilerplate_lines",
    "text_gopher_rules",
    "text_hash_embedding",
    "text_pii_redact",
    "text_scan_roundtrip",
    "text_token_bpe",
    "udf_grouped_agg",
    "udf_map_in_arrow",
    "udf_pandas_scalar",
    "unpivot_stack",
    "win_first_last",
    "win_lag_lead",
    "win_running_sum",
    "win_sliding_frame",
    "xml_scan_roundtrip",
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
