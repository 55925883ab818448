"""Runnable corpus-selection pipeline example.

Wires the round-12 continuation operators into the data-selection
workflow a pretraining corpus build runs per crawl snapshot:

    safety gate           blocklist filter (broadcast term semi-join)
      -> target fit       DSIR hashed-ngram importance weights, top-k
      -> novelty screen   bigram first-occurrence novelty per doc
      -> corpus health    Zipf rank-frequency slope (power-law check)
      -> seed expansion   personalized PageRank from the trusted slice
      -> index audit      IVF recall@5 vs exact neighbors
      -> split design     rolling-origin CV folds (leak-free eval)
      -> ab readout       permutation test + Markov removal credit

Run:  python examples/corpus_selection_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("corpus-selection")
    q = load_all()

    gate = q["text_blocklist_filter"].fn(spark, sf_dir)
    n_docs = gate.count()
    n_blocked = gate.filter("blocked").count()
    assert 0 < n_blocked < n_docs, "gate must pass some, block some"

    picked = q["sample_dsir_importance"].fn(spark, sf_dir)
    n_picked = picked.count()

    nov = q["text_ngram_novelty"].fn(spark, sf_dir)
    mean_novelty_ppm = int(
        nov.agg({"novelty_ppm": "avg"}).first()[0]
    )

    zipf = q["text_zipf_slope"].fn(spark, sf_dir).first()
    assert zipf["slope_milli"] < 0, "rank-frequency must decay"

    ppr = q["graph_personalized_pagerank"].fn(spark, sf_dir)
    n_reached = ppr.filter("rank_micro > 0").count()

    recall = q["sim_ivf_recall_eval"].fn(spark, sf_dir)
    mean_recall_ppm = int(recall.agg({"recall_ppm": "avg"}).first()[0])

    folds = q["split_time_series_cv"].fn(spark, sf_dir).collect()
    trains = [r["n_train"] for r in sorted(folds, key=lambda r: r["fold"])]
    assert trains == sorted(trains), "CV window must grow"

    perm = q["stat_permutation_test"].fn(spark, sf_dir).first()
    markov = q["attribution_markov_removal"].fn(spark, sf_dir)
    top_channel = markov.orderBy(
        markov.removal_ppm.desc(), "channel"
    ).first()["channel"]

    out = {
        "n_docs": n_docs,
        "n_blocked": n_blocked,
        "n_dsir_picked": n_picked,
        "mean_novelty_ppm": mean_novelty_ppm,
        "zipf_slope_milli": zipf["slope_milli"],
        "n_seed_reached": n_reached,
        "mean_ivf_recall_ppm": mean_recall_ppm,
        "n_cv_folds": len(folds),
        "perm_p_ppm": perm["p_ppm"],
        "top_markov_channel": top_channel,
    }
    print(out)
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
