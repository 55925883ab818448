"""Runnable telemetry / observability pipeline example.

Wires the round-8 temporal and sketch operators into the canonical
event-stream workflow:

    feed completeness audit      sequence gaps over the id order
      -> sessionization          30-min gap + 1-h duration cap
      -> incident enrichment     interval banding join (no BNLJ)
      -> traffic sketches        count-min cells + KMV user overlap
      -> robust outliers         median/MAD per event type

Run:  python examples/telemetry_observability_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.operators.intervals import (  # noqa: E402
    capped_sessions,
    interval_point_join,
)
from ctgov_ai_etl_spark.operators.sketches import (  # noqa: E402
    cms_build,
    kmv_sketch,
    kmv_union_intersection,
)
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402
from ctgov_ai_etl_spark.tables import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("telemetry-observability")
    events = load_table(spark, sf_dir, "events")

    # 1. completeness: how many id-sequence gaps does the feed carry?
    from pyspark.sql import Window as W

    w = W.orderBy("event_id")
    gaps = (
        events.select(
            "event_id", F.lag("event_id").over(w).alias("prev_id")
        )
        .filter(F.col("event_id") - F.col("prev_id") > 1)
        .count()
    )

    # 2. sessionize: inactivity gap 30 min, hard cap 1 h
    sessions = capped_sessions(
        events, "user_id", "ts", "event_id", gap_seconds=1800,
        cap_seconds=3600,
    )
    n_sessions = (
        sessions.select("user_id", "session_id", "subsession_id")
        .distinct()
        .count()
    )

    # 3. enrich purchases with the incident windows they fell into
    incidents = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("hi"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    affected = interval_point_join(
        purchases, incidents, "purchase_ts", "lo", "hi", bin_seconds=600
    ).count()

    # 4. sketches: per-user traffic cells + click/view audience overlap
    cms_cells = cms_build(
        events.select(F.col("user_id").cast("string").alias("item")),
        "item",
        depth=3,
        width=16,
    ).count()
    overlap = kmv_union_intersection(
        kmv_sketch(
            events.filter(F.col("event_type") == "click").select("user_id"),
            "user_id",
            64,
        ),
        kmv_sketch(
            events.filter(F.col("event_type") == "view").select("user_id"),
            "user_id",
            64,
        ),
        64,
    ).collect()[0]

    # 5. robust outliers: MAD-based, heavy-tail safe (shared operator
    # — the same definition the audited anomaly_mad query runs)
    from ctgov_ai_etl_spark.operators.quality import mad_outliers

    n_outliers = mad_outliers(
        events, "event_type", "value", keep_cols=["event_id"], threshold=3.5
    ).count()

    out = {
        "sequence_gaps": gaps,
        "sessions": n_sessions,
        "purchases_in_incident_windows": affected,
        "cms_cells": cms_cells,
        "est_click_view_overlap": float(overlap["est_inter"]),
        "mad_outliers": n_outliers,
    }
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
