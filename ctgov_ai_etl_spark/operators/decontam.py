"""Benchmark decontamination: flag training documents that share
token n-grams with an evaluation/benchmark set.

Standard training-data hygiene (the reference has no equivalent — this
extends the curation family alongside dedup/quality/PII): any training
document containing a long-enough n-gram from a held-out benchmark is
contaminated and must be dropped or audited before training.

Scale shape: the benchmark side is tiny relative to the corpus
(eval sets are MBs; the corpus is TBs), so its distinct shingle set is
**broadcast** and the contamination test is a map-side hash probe over
the exploded training shingles — the 100 TB corpus is never shuffled
wholesale.  The only exchange is the per-doc aggregation of the
(rare) surviving matches.  All expressions are built-in (codegen'd);
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.functions.text import tokens


def ngram_shingles(toks: Column, n: int = 8) -> Column:
    """All ``n``-token shingles (stride 1) of a token array, each
    joined with single spaces; empty array when the doc is shorter
    than ``n`` (``sequence`` would count DOWN on a negative span, so
    the guard is mandatory, not cosmetic)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    return F.when(F.size(toks) >= n, sh).otherwise(
        F.array().cast("array<string>")
    )


def flag_contaminated(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_hits) for every training document sharing >=1 distinct
    ``n``-gram with the benchmark corpus.

    The broadcast join runs BEFORE any distinct/aggregate, so the
    non-matching explosion (the overwhelming majority at scale) is
    filtered map-side and only true matches reach the single per-doc
    shuffle.  Anti-joining the result against ``train`` yields the
    decontaminated corpus.
    """
    from ctgov_ai_etl_spark.operators.limits import spread_to_parallelism

    train, bench = spread_to_parallelism(train), spread_to_parallelism(bench)
    bench_shingles = (
        bench.select(
            F.explode(ngram_shingles(tokens(F.col(text_col)), n)).alias("s")
        )
        .distinct()
    )
    train_shingles = train.select(
        F.col(id_col),
        F.explode(ngram_shingles(tokens(F.col(text_col)), n)).alias("s"),
    )
    return (
        train_shingles.join(F.broadcast(bench_shingles), "s")
        .groupBy(id_col)
        .agg(F.countDistinct("s").cast("int").alias("n_hits"))
    )
