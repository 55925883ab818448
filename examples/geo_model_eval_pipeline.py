"""Runnable geospatial + model-evaluation pipeline example.

Wires the round-11 operators into the workflow a location-aware
scoring product runs nightly:

    geotagging                 md5 micro-degree points -> geohash5
      -> tile pyramid          zoom 1-3 prefix rollup (one pass)
      -> proximity pairs       9-cell bucketed epsilon-join (no
                               cartesian anywhere)
      -> movement alerts       per-user tile transitions (lag)
      -> score calibration     isotonic minimax fit over buckets
      -> model quality         ROC/AUC from exact integer trapezoids
                               + expected calibration error in ppm
      -> training sample       priority sampling (w/u, md5 uniform)
                               with Horvitz-Thompson weights
      -> drift sentinel        binary-segmentation changepoints on
                               the daily volume series

Run:  python examples/geo_model_eval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("geo-model-eval")
    q = load_all()

    tiles = q["geo_grid_rollup"].fn(spark, sf_dir)
    n_tiles = tiles.count()

    pairs = q["geo_geohash_join"].fn(spark, sf_dir)
    n_pairs = pairs.count()

    alerts = q["geo_fence_transitions"].fn(spark, sf_dir)
    n_alerts = alerts.count()

    iso = q["ml_isotonic_regression"].fn(spark, sf_dir)
    curve = sorted(
        (r["bucket"], r["iso_rate"]) for r in iso.collect()
    )
    fits = [c[1] for c in curve]
    assert fits == sorted(fits), "isotonic fit must be monotone"

    roc = q["ml_roc_curve"].fn(spark, sf_dir)
    auc = roc.first()["auc"]

    ece = q["ml_calibration_ece"].fn(spark, sf_dir).first()["ece_ppm"]

    sample = q["sample_priority_weighted"].fn(spark, sf_dir)
    n_sample = sample.count()
    ht_total = sample.agg({"ht_cents": "sum"}).first()[0]

    splits = q["ts_changepoint_binseg"].fn(spark, sf_dir)
    n_splits = splits.count()

    out = {
        "n_tiles": n_tiles,
        "n_pairs": n_pairs,
        "n_alerts": n_alerts,
        "n_curve_points": len(curve),
        "auc": auc,
        "ece_ppm": ece,
        "n_sample": n_sample,
        "ht_total_cents": int(ht_total),
        "n_changepoints": n_splits,
    }
    print(out)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
