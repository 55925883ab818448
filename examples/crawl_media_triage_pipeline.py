"""Runnable crawl-acquisition + media-triage pipeline example.

Wires the round-14 container/metadata operators into the shape a
100 TB multimodal crawl actually starts with: walk the WARC
containers, keep the HTTP-200 text, dedup it, and triage the media
sidecars by METADATA ONLY — duration/bitrate for audio,
resolution/level/IDR density for video — before a single expensive
decode is spent.

    WARC walk            CDX-style record index (byte offsets, types,
                         statuses) — warc_scan_records
      -> text ingest     HTTP-200 bodies, quality-gated, exact-dedup
                         with deterministic keeper —
                         pipeline_crawl_ingest
      -> audio triage    MP3 frame-header metadata (duration,
                         bitrate, padding counts) — mm_audio_mp3_meta
      -> video triage    H.264 SPS metadata (dimensions via the crop
                         rule, level, IDR density) — mm_video_h264_meta
      -> triage report   what survives each gate, and why

Every stage is an oracle-paired catalog query; this example composes
their DataFrames (no .collect() until the final small reports).

Run:  python examples/crawl_media_triage_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("crawl-media-triage")
    reg = load_all()
    out: dict = {}

    # 1. container walk: the record index a crawl archive is read by
    idx = reg["warc_scan_records"].fn(spark, sf_dir)
    by_type = {
        r["warc_type"]: r["n"]
        for r in idx.groupBy("warc_type").agg(F.count("*").alias("n")).collect()
    }
    ok_rate = idx.agg(
        F.round(
            F.avg((F.col("http_status") == 200).cast("double")), 4
        ).alias("r")
    ).collect()[0]["r"]
    out["records_by_type"] = by_type
    out["http_200_rate_of_all_records"] = ok_rate
    print(f"1. WARC index: {by_type}, status-200 share {ok_rate}")

    # 2. text acquisition: gated + deduped bodies with keeper election
    ingest = reg["pipeline_crawl_ingest"].fn(spark, sf_dir)
    stats = ingest.agg(
        F.count("*").alias("unique_bodies"),
        F.sum("n_copies").cast("long").alias("gated_bodies"),
        F.sum((F.col("n_copies") > 1).cast("long")).alias("dup_groups"),
    ).collect()[0]
    out["ingest"] = {k: stats[k] for k in stats.asDict()}
    print(
        f"2. ingest: {stats['gated_bodies']} gated bodies -> "
        f"{stats['unique_bodies']} unique ({stats['dup_groups']} dup groups)"
    )

    # 3. audio triage: keep >= 0.5 s AND >= 96 kbps — metadata only,
    #    zero decodes spent on the rejects (the synthetic clips run
    #    0.12-0.86 s, so the gate bites; a real corpus would use
    #    15 s+)
    audio = reg["mm_audio_mp3_meta"].fn(spark, sf_dir)
    audio_kept = audio.filter(
        (F.col("duration_us") >= 500_000) & (F.col("bitrate_kbps") >= 96)
    )
    a_tot, a_keep = audio.count(), audio_kept.count()
    out["audio_triage"] = {"total": a_tot, "kept": a_keep}
    print(f"3. audio triage: {a_keep}/{a_tot} clips pass duration+bitrate")

    # 4. video triage: keep >= 128x128 at level >= 30 with an IDR —
    #    resolution/level straight from the SPS bits
    video = reg["mm_video_h264_meta"].fn(spark, sf_dir)
    video_kept = video.filter(
        (F.col("width") >= 128)
        & (F.col("height") >= 128)
        & (F.col("level_idc") >= 30)
        & (F.col("n_idr") >= 1)
    )
    v_tot, v_keep = video.count(), video_kept.count()
    out["video_triage"] = {"total": v_tot, "kept": v_keep}
    print(f"4. video triage: {v_keep}/{v_tot} streams pass res+level gates")

    # 5. joined triage report: documents whose text survived dedup AS
    #    KEEPER and whose media passed both triages — the rows worth
    #    sending to the expensive decode tier
    keepers = ingest.select(
        F.col("keeper_doc_id").alias("doc_id")
    ).distinct()
    both = (
        keepers.join(audio_kept.select("doc_id"), "doc_id")
        .join(video_kept.select("doc_id"), "doc_id")
        .count()
    )
    out["decode_tier_candidates"] = both
    print(f"5. decode-tier candidates (text keeper + AV pass): {both}")
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
