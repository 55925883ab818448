"""Runnable cross-modal curation example (the round-6 operator set).

The text side gates documents, the embedding side semantically
deduplicates them, and the mixture stage rebalances what survives:

    boilerplate line removal            corpus-level line counts
      -> linear quality classifier      zero-shuffle inference
      -> bigram-LM scoring              train-small / score-big
      -> SemDeDup retention             centroid blocks + keep policy
      -> temperature mixture sample     sqrt-weights, md5 filter
      -> feature-hashed embeddings      for corpora WITHOUT vectors

Run:  python examples/semantic_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.operators.limits import (  # noqa: E402
    mixture_fractions,
    stratified_sample,
    temperature_weights,
)
from ctgov_ai_etl_spark.operators.quality import (  # noqa: E402
    bigram_lm_score,
    linear_quality_score,
    remove_boilerplate_lines,
)
from ctgov_ai_etl_spark.operators.similarity import (  # noqa: E402
    semantic_prune,
    seeded_centroids,
)
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402
from ctgov_ai_etl_spark.tables import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.01") -> dict:
    spark = get_spark("semantic-curation-example")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    # 1. corpus-level boilerplate removal, then drop blanked docs
    cleaned = remove_boilerplate_lines(docs, min_docs=3).filter(
        F.col("clean_text") != ""
    )

    # 2. text-quality gates: classifier keep-flag + bigram-LM cut
    keep = linear_quality_score(docs).filter(F.col("keep")).select("doc_id")
    lm = bigram_lm_score(docs).filter(F.col("avg_logprob") >= -10.0).select(
        "doc_id"
    )

    # 3. semantic dedup via the aligned embedding table
    retained = semantic_prune(
        emb, seeded_centroids(k=64, dim=64), threshold=0.3
    ).select(F.col("vec_id").alias("doc_id"))

    curated = (
        docs.select("doc_id", "lang")
        .join(cleaned.select("doc_id"), "doc_id")
        .join(keep, "doc_id")
        .join(lm, "doc_id")
        .join(retained, "doc_id")
    )

    # 4. temperature-rebalanced sample of the curated corpus
    langs = ["de", "en", "es", "fr", "zh"]
    w = temperature_weights(curated, "lang", langs, alpha=0.5)
    n = curated.count()
    fracs = mixture_fractions(curated, "lang", w, n // 2)
    sample = stratified_sample(curated, "lang", fracs, "doc_id")

    n_curated, n_docs, n_sample = curated.count(), docs.count(), sample.count()
    print("curated:", n_curated, "of", n_docs)
    sample.groupBy("lang").count().orderBy("lang").show()
    # Returned for the smoke test (tests/test_examples.py).
    return {"n_docs": n_docs, "n_curated": n_curated, "n_sample": n_sample}


if __name__ == "__main__":
    main(*sys.argv[1:])
