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


def key_skew_profile(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Key-distribution diagnostics — the operational pre-step that
    decides WHEN the salted operators in this module are worth their
    extra shuffle: per-key row counts summarized into the skew facts a
    pipeline owner actually reads (total keys, total rows, max/top-N
    key mass, and the max/mean imbalance ratio a 'hot reducer' check
    thresholds on).

    Returns ONE row: (n_keys, n_rows, max_key_count, topn_count,
    topn_frac_pm, imbalance_pm) with the fractions in exact
    parts-per-million integers (top-N mass / total; max key count /
    mean key count).  Cost: one partially-aggregated count per key +
    one top-N (TakeOrderedAndProject-shaped, never a global sort) —
    cheap enough to run ahead of every heavy join on fresh data."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(
        F.count("*").alias("c")
    )
    topn = counts.orderBy(F.col("c").desc(), F.col("k").asc()).limit(top_n)
    agg = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_key_count"),
    )
    t = topn.agg(F.sum("c").alias("topn_count"))
    return agg.crossJoin(t).select(
        "n_keys",
        "n_rows",
        "max_key_count",
        "topn_count",
        F.expr("topn_count * 1000000 div n_rows").alias("topn_frac_pm"),
        # Route the product through decimal(38,0) (the convention used
        # by connected_components' convergence sums): at the 100 TB
        # scale this targets (n_keys ~1e9, max_key_count ~1e6) the
        # int64 product max_key_count * n_keys * 1e6 overflows — throws
        # under ANSI mode, silently wraps otherwise.
        F.expr(
            "CAST(CAST(max_key_count AS DECIMAL(38,0))"
            " * n_keys * 1000000 div n_rows AS BIGINT)"
        ).alias("imbalance_pm"),
    )
