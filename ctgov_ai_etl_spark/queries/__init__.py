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
    # Round-14 priority.  Codified rule (r9 lesson): previously-
    # DRIVER-RED (fixed, awaiting driver re-confirmation) > changed
    # this round > new this round > stalest driver evidence, oldest
    # cohort first.  The r13 window consumed the 21 never-sampled
    # names and 19 of the r4 cohort; what remains stale is 4 r4
    # stragglers + the 42-name r5 cohort — this window consumes all of
    # them, moving the stale-evidence floor to r6.  Every r13 block
    # (driver-green in CORRECTNESS_r13.json) rotates to the tail.
    # -- block 0: the r13 driver-RED, fixed this round (raw
    #    array<string> output joined to a portable CSV string)
    "fn_regex_family",
    # -- block 1: CHANGED this round (pipeline_entity_resolution:
    #    oracle rewritten to deletion-blocking + pointer-jump CC;
    #    sketch_hll_registers / stream_run_hll: hll_registers now
    #    validates its parameter domain — same default behavior)
    "pipeline_entity_resolution",
    "sketch_hll_registers",
    "stream_run_hll",
    # -- block 2: NEW in round 14 (MP3 frame-header metadata, WARC
    #    container walk, H.264 Annex-B/SPS metadata)
    "mm_audio_mp3_meta",
    "warc_scan_records",
    "mm_video_h264_meta",
    "pipeline_crawl_ingest",
    "tar_scan_members",
    "wds_sample_groups",
    "warcgz_scan_records",
    "zip_scan_entries",
    # -- block 3: r4-latest driver evidence (the 4 stragglers)
    "stream_run_upsert",
    "ts_resample_ffill",
    "when_otherwise_buckets",
    "win_rank_family",
    # -- block 4: r5-latest driver evidence (whole cohort, alphabetical)
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
