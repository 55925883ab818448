"""Runnable telemetry / observability pipeline example.

Wires the round-8 temporal and sketch operators — plus the round-9
bitmap analytics and sequential-test monitor — into the canonical
event-stream workflow:

    feed completeness audit      sequence gaps over the id order
      -> sessionization          30-min gap + 1-h duration cap
      -> incident enrichment     interval banding join (no BNLJ)
      -> traffic sketches        count-min cells + KMV user overlap
      -> robust outliers         median/MAD per event type
      -> bitmap retention        cohort matrix with NO self-join:
                                 each user's activity is one int64
                                 (bit i = active day i); cohort =
                                 lowest set bit, day-k retention =
                                 one shifted bit test
      -> SPRT drift monitor      Wald sequential test on the
                                 high-value-event rate, exact int64
                                 log-likelihood walk

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

    # 6. retention WITHOUT a self-join: 64-day activity bitmaps.
    # One partial-aggregated bit_or per user, then pure bit math —
    # the 100 TB replacement for joining the activity table against
    # itself per (cohort, horizon) cell.  The 0..63 window guard is
    # explicit because Spark wraps out-of-range shifts mod 64.
    from ctgov_ai_etl_spark.functions.exact import fdiv

    off = (fdiv(F.unix_micros("ts"), 86_400_000_000) - 19_723).cast("int")
    # purchase activity spreads first-touch across the month (an
    # all-events bitmap would collapse every cohort to day 0)
    bitmaps = (
        events.filter(
            F.col("ts").isNotNull() & (F.col("event_type") == "purchase")
        )
        .select("user_id", off.alias("off"))
        .filter(F.col("off").between(0, 63))
        .groupBy("user_id")
        .agg(
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), off)")).alias("b")
        )
    )
    retention = (
        bitmaps.select(
            F.expr("bit_count((b & -b) - 1)").alias("cohort_day"), "b"
        )
        .groupBy("cohort_day")
        .agg(
            F.count("*").alias("n_users"),
            F.sum(
                F.expr(
                    "CASE WHEN cohort_day + 7 <= 63 THEN "
                    "shiftright(b, CAST(cohort_day + 7 AS INT)) & 1 END"
                )
            ).alias("ret_d7"),
        )
        .collect()
    )
    d7_retained = sum(int(r["ret_d7"] or 0) for r in retention)

    # 7. SPRT drift monitor: is the high-value-event rate 0.6 (H1)
    # or 0.4 (H0)?  Wald's sequential test as an exact int64
    # log-likelihood random walk (micro-log literals), decided at
    # the FIRST boundary crossing — the always-on monitor that reads
    # a fraction of the data a fixed-horizon test would.
    from pyspark.sql import Window as W2

    c1, c0, bound = 405_465, -405_465, 2_944_439  # ln-ratios * 1e6
    wo = W2.partitionBy("event_type").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    walk = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "event_type",
        F.sum(
            F.when(F.round(F.col("value") * 100) > 5000, c1).otherwise(c0)
        )
        .over(wo.rowsBetween(W2.unboundedPreceding, W2.currentRow))
        .alias("llr"),
    )
    decisions = (
        walk.filter((F.col("llr") >= bound) | (F.col("llr") <= -bound))
        .select("event_type")
        .distinct()
        .count()
    )

    out = {
        "sequence_gaps": gaps,
        "sessions": n_sessions,
        "purchases_in_incident_windows": affected,
        "cms_cells": cms_cells,
        "est_click_view_overlap": float(overlap["est_inter"]),
        "mad_outliers": n_outliers,
        "cohort_cells": len(retention),
        "d7_retained_users": d7_retained,
        "sprt_decided_types": decisions,
    }
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(*sys.argv[1:2])
