"""Runnable product-analytics pipeline example.

Wires the round-9 operators into the growth-analytics workflow a
consumer-product team runs weekly:

    acquisition funnel        time-boxed view->click->purchase chain
      -> engagement cohorts   weekly retention triangle
      -> behavior paths       top session event paths
      -> monetization         RFM quintile segmentation (exact cents)
      -> churn curve          Kaplan-Meier signup->error survival
      -> health monitors      CUSUM drift alarms + exact two-sample
                              KS + uniqueness/l-diversity gates

Run:  python examples/product_analytics_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("product-analytics")
    reg = load_all()
    out: dict = {}

    # 1. acquisition: who converts within a week per step?
    funnel = {
        r["step_name"]: (r["n_users"], r["conv_ppm"])
        for r in reg["funnel_within_window"].fn(spark, sf_dir).collect()
    }
    out["funnel_steps"] = len(funnel)
    out["funnel_view_users"] = funnel.get("view", (0, 0))[0]
    out["funnel_purchase_ppm"] = funnel.get("purchase", (0, 0))[1]

    # 2. engagement: does week-over-week retention hold?
    cohorts = reg["retention_cohorts"].fn(spark, sf_dir)
    out["cohort_cells"] = cohorts.count()

    # 3. behavior: the dominant session paths
    paths = reg["path_top_sequences"].fn(spark, sf_dir).collect()
    out["top_paths"] = len(paths)
    out["busiest_path_sessions"] = paths[0]["n_sessions"] if paths else 0

    # 4. monetization: who is worth a win-back campaign?
    rfm = reg["rfm_segmentation"].fn(spark, sf_dir)
    # lapsed whales: best monetary quintile, worst recency quintile
    out["lapsed_whales"] = rfm.filter(
        (F.col("m_q") == 1) & (F.col("r_q") == 5)
    ).count()
    out["rfm_customers"] = rfm.count()

    # 5. churn: how fast do signups hit their first error?
    km = reg["survival_km"].fn(spark, sf_dir).collect()
    out["km_event_times"] = len(km)
    out["km_final_survival"] = (
        min(km, key=lambda r: -r["dur_us"])["survival"] if km else 1.0
    )

    # 6. health: drift alarms and governance gates
    cusum = reg["anomaly_cusum"].fn(spark, sf_dir)
    out["cusum_alarms"] = cusum.filter(F.col("alarm")).count()
    ks = reg["dq_drift_ks"].fn(spark, sf_dir).collect()[0]
    out["ks_ppm"] = ks["ks_ppm"]
    ldiv = reg["dq_l_diversity"].fn(spark, sf_dir)
    out["l_diversity_at_risk"] = ldiv.filter(F.col("at_risk")).count()
    prof = reg["dq_uniqueness_profile"].fn(spark, sf_dir).collect()
    out["profiled_columns"] = len(prof)

    for key, val in out.items():
        print(f"{key}: {val}")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
