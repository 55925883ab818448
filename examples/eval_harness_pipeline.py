"""Runnable evaluation-harness pipeline example.

Wires the round-12 operators into the workflow a model-quality /
data-governance team runs after every training-data refresh:

    ingest gate          streaming decontamination (reject docs
                         sharing benchmark 8-grams at ingest)
    -> featurize         vocabulary-free hashing trick (32 buckets,
                         L2-normalized)
    -> classify          multinomial naive Bayes confusion matrix
    -> rank quality      nDCG@10 + MRR per query group
    -> crawl seeds       HITS hubs/authorities over the link graph
    -> cluster quality   simplified silhouette per cluster
    -> stats QA          Brown-Forsythe variance check, BH-FDR over
                         the hypothesis family
    -> publish           DP Laplace histogram release

Run:  python examples/eval_harness_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("eval-harness")
    q = load_all()

    contaminated = q["stream_run_decontam"].fn(spark, sf_dir)
    n_contaminated = contaminated.count()

    feats = q["feature_hash_vectorize"].fn(spark, sf_dir)
    n_cells = feats.count()

    confusion = q["ml_naive_bayes"].fn(spark, sf_dir).collect()
    n_scored = sum(r["n_docs"] for r in confusion)

    rank = q["ml_ndcg_mrr"].fn(spark, sf_dir)
    agg = rank.agg({"ndcg10": "avg", "rr_micro": "avg"}).first()
    mean_ndcg, mean_rr = agg[0], agg[1] / 1e6

    hits = q["graph_hits"].fn(spark, sf_dir)
    top_hub = hits.orderBy(hits.hub_micro.desc(), "node").first()

    sil = q["cluster_silhouette"].fn(spark, sf_dir).collect()
    worst_cluster = min(sil, key=lambda r: r["mean_sil6"])

    levene = q["stat_levene_bf"].fn(spark, sf_dir).first()
    fdr = q["stat_bh_fdr"].fn(spark, sf_dir)
    n_rejected = fdr.filter(fdr.rejected == 1).count()

    release = q["gov_dp_histogram"].fn(spark, sf_dir)
    n_released = release.count()

    out = {
        "n_contaminated": n_contaminated,
        "n_feature_cells": n_cells,
        "n_scored_docs": n_scored,
        "mean_ndcg10": round(mean_ndcg, 4),
        "mean_mrr": round(mean_rr, 4),
        "top_hub_node": top_hub["node"],
        "worst_cluster_sil": worst_cluster["mean_sil6"],
        "levene_w": levene["w_stat"],
        "fdr_rejected": n_rejected,
        "n_released_cells": n_released,
    }
    print(out)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
