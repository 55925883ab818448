"""Runnable end-to-end training-data curation example.

Wires the engine's LLM-pipeline operators into the canonical corpus
workflow:

    score (lang-id, quality)           map-side expressions
      -> near-dup pairs (MinHash-LSH)  2 narrow shuffles
      -> duplicate clusters            connected components
      -> keep one doc per cluster      deterministic min-id keeper
      -> stratified sample by lang     map-side md5 filter
      -> token statistics              final corpus accounting

Run:  python examples/training_data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from ctgov_ai_etl_spark.functions.text import (  # noqa: E402
    lang_id,
    quality_score,
    token_count,
)
from ctgov_ai_etl_spark.operators.dedup import (  # noqa: E402
    connected_components,
    minhash_lsh_pairs,
)
from ctgov_ai_etl_spark.operators.limits import stratified_sample  # noqa: E402
from ctgov_ai_etl_spark.session import get_spark  # noqa: E402
from ctgov_ai_etl_spark.tables import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("training-data-pipeline")
    docs = load_table(spark, sf_dir, "documents")

    # 1. score + gate (pure expressions, no shuffle)
    scored = docs.select(
        "doc_id", "text", "lang", "source",
        lang_id(F.col("text")).alias("lang_guess"),
        quality_score(F.col("text")).alias("quality"),
    )
    gated = scored.filter(F.col("quality") >= 0.5)

    # 2. near-dup pairs -> clusters -> one keeper per cluster
    pairs = minhash_lsh_pairs(
        gated, "doc_id", "text",
        num_hashes=64, bands=8, shingle_k=1, threshold=0.8, shingle="token",
    )
    comp = connected_components(gated.select("doc_id"), pairs, id_col="doc_id")
    keepers = gated.join(
        comp.filter(F.col("doc_id") == F.col("component")).select("doc_id"), "doc_id"
    )

    # 3. rebalance the mixture by language (deterministic, auditable)
    sampled = stratified_sample(
        keepers, "lang", {"en": 0.8, "de": 1.0, "zh": 1.0}, key_col="doc_id",
        default=0.5,
    )

    # 4. corpus accounting
    stats = sampled.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum(token_count(F.col("text"))).alias("tokens"),
    )

    n_in, n_kept, n_out = docs.count(), keepers.count(), sampled.count()
    print(f"input docs:        {n_in}")
    print(f"after dedup:       {n_kept}")
    print(f"after sampling:    {n_out}")
    stats.orderBy("lang").show()
    # Returned for the smoke test (tests/test_examples.py) — the
    # printed report stays the human-facing output.
    return {"n_in": n_in, "n_kept": n_kept, "n_out": n_out}


if __name__ == "__main__":
    main(*sys.argv[1:2])
