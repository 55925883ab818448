"""Skew-mitigation operators: salting for hot keys (SURVEY.md §2.3
'Partitioning & shuffle'; the 100 TB insurance AQE can't always
provide).

Both operators produce results IDENTICAL to their unsalted forms —
the oracle queries prove it — while bounding the largest shuffle
partition to ~1/n_salts of the hot key's volume:

- **salted aggregation**: aggregate on (key, salt) first (spreads the
  hot key over n_salts reducers), then combine the partials on key.
  This is what map-side partial aggregation already does for algebraic
  aggregates; the explicit form matters for holistic aggregates
  (collect/distinct counts) and demonstrates the shape.
- **salted join**: give each fact row a deterministic salt, replicate
  the (small) skewed-dimension side n_salts times, join on
  (key, salt). The hot key's rows land on n_salts different reducers
  instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_col(unique_col: str, n_salts: int):
    """Deterministic salt derived from a unique column (stable across
    runs/partitionings, unlike rand())."""
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salts)).alias("__salt")


def salted_agg_sum_count(
    df: DataFrame, key: str, measure_cents, unique_col: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase (salted) sum/count per key; identical result to a
    plain groupBy."""
    partial = (
        df.withColumn("__salt", salt_col(unique_col, n_salts))
        .groupBy(key, "__salt")
        .agg(
            F.sum(measure_cents).alias("__c"),
            F.count("*").alias("__n"),
        )
    )
    return partial.groupBy(key).agg(
        (F.sum("__c").cast("double") / 100).alias("sum_measure"),
        F.sum("__n").alias("n_rows"),
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join of a fact table against a small dimension
    whose key distribution in the fact side is hot. The dimension is
    exploded ×n_salts (it's small — that's why it's the replicated
    side) and the join key becomes (key, salt)."""
    salted_fact = fact.withColumn("__salt", salt_col(unique_col, n_salts))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    )
    return salted_fact.join(replicated_dim, [key, "__salt"]).drop("__salt")
