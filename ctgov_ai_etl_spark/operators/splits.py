"""Leakage-safe dataset splitting for training pipelines.

A random row-level train/test split LEAKS when near-duplicate
documents land on opposite sides: the model sees the test answer at
train time and eval numbers inflate (the classic contamination bug
every LLM data pipeline re-discovers).  The fix is to split by
duplicate GROUP, not by row — every member of a near-dup cluster goes
to the same side.

``group_aware_split`` composes the engine's existing primitives:
  near-dup pairs (any generator) → connected components
  (operators/dedup.py) → md5 hash bucket of the COMPONENT id
  (operators/limits.py:hash_bucket — engine-reproducible, stable
  under repartitioning) → side assignment.

Scale shape: one CC resolution (bucketed pair generation, narrow
label rows) plus one broadcast-free map-side bucket expression — the
split itself adds ZERO shuffles beyond the dedup clustering the
pipeline already runs.  Determinism: md5(component) makes the split a
pure function of the corpus content, replayable bit-for-bit by any
engine (the DuckDB oracle recomputes it from the same closure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.operators.limits import hash_bucket


def group_aware_split(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Assign every row of ``df`` to 'train' or 'test' such that all
    rows sharing a connected component land on the SAME side.

    ``components`` is (``id_col``, component) — the output of
    ``connected_components`` / ``connected_components_star``;
    singleton rows absent from it keep themselves as their group (the
    CC operators already emit self-labeled singletons, so a full CC
    result needs no fill — the left join + coalesce here is a guard
    for callers passing only the dup subset).

    Returns ``df`` + (component, split) where split ∈ {train, test}.
    The side comes from ``hash_bucket(component) < test_fraction``:
    deterministic, engine-reproducible, and stable as the corpus
    grows — adding documents never flips an existing group's side
    unless a new duplicate bridge MERGES two groups (in which case
    the merged group takes the min-id component's side, exactly what
    leakage safety requires).
    """
    if not 0.0 <= test_fraction <= 1.0:
        raise ValueError(f"test_fraction must be in [0, 1], got {test_fraction}")
    comp = components.select(
        F.col(id_col), F.col("component").alias("__component")
    )
    # round(), not int(): truncation under-shoots fractions whose
    # binary float product lands just below the integer (0.29 * 10000
    # = 2899.999… → 2899), shorting the advertised test share by a
    # bucket.  Rounding hits the advertised fraction for all inputs.
    cut = round(test_fraction * n_buckets)
    out = (
        df.join(comp, id_col, "left")
        .withColumn(
            "component", F.coalesce("__component", F.col(id_col))
        )
        .drop("__component")
    )
    return out.withColumn(
        "split",
        F.when(
            hash_bucket(F.col("component"), n_buckets) < cut, F.lit("test")
        ).otherwise(F.lit("train")),
    )
