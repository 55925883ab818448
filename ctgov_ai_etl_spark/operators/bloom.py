"""Bloom-filter semi-join pruning — the runtime-filter pattern.

At 100 TB the expensive part of ``fact SEMI JOIN dim`` is shuffling
the fact side; when the dim side is selective, most shuffled fact rows
die in the join.  Engines fix this with a runtime filter: summarize
the dim keys into a bloom filter, ship it to the fact scan, and drop
non-members BEFORE the exchange.  Spark's own ``bloom_filter_agg`` /
``InjectRuntimeFilter`` machinery is internal, so this operator builds
the same thing from public expressions:

1. dim side: k salted xxhash64 positions per key → per-position
   (word, bit) masks → ``bit_or`` aggregate into ≤ m/64 words — a
   partial-aggregated shuffle of AT MOST m/64 narrow rows;
2. the word table collects to the driver (m bits = m/8 bytes; 2^20
   bits = 128 KB — the same driver hop Spark's subquery runtime
   filters make) and enters the fact plan as ONE array<long> literal;
3. fact side: map-side membership test (k bit probes) BEFORE any
   shuffle, then the exact semi-join drops bloom false positives.

False negatives are impossible (every inserted key sets its bits), so
the final semi-join result is exactly the unfiltered semi-join —
which is what the DuckDB oracle replays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k salted hash positions in [0, m_bits) for ``key``."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def bloom_build(dim_keys: DataFrame, key_col: str, m_bits: int, k: int) -> list[int]:
    """Bloom words (little-endian array of m_bits/64 signed longs) for
    the distinct values of ``dim_keys.key_col``; distributed bit_or
    aggregation, driver receives only the word table."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    masks = F.array(
        *[
            F.struct(
                (p / 64).cast("int").alias("w"),
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                ).alias("m"),
            )
            for p in _positions(F.col(key_col), m_bits, k)
        ]
    )
    rows = (
        dim_keys.select(F.explode(masks).alias("wm"))
        .select(F.col("wm.w").alias("w"), F.col("wm.m").alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("m"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["m"]
    return words


def bloom_might_contain(key: Column, words: list[int], k: int) -> Column:
    """Membership predicate against a built filter — a pure map-side
    expression (one array literal + k bit probes), no join, no
    shuffle."""
    m_bits = len(words) * 64
    lit_words = F.expr(
        "array(" + ",".join(f"{w}L" for w in words) + ")"
    )
    tests = [
        F.element_at(lit_words, (p / 64).cast("int") + 1).bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), (p % 64).cast("int"))
        )
        != 0
        for p in _positions(key, m_bits, k)
    ]
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 17,
    k: int = 5,
) -> DataFrame:
    """``fact`` rows whose key appears in ``dim`` — exact left-semi
    semantics, with a bloom pre-filter applied to the fact side
    map-side (before any exchange) so only probable members reach the
    semi-join shuffle.  With m = 2^17 bits and k = 5 the false-positive
    rate at 10k dim keys is < 1e-4: the shuffle carries ~the true
    matches, the residual false positives die in the exact join."""
    words = bloom_build(dim.select(dim_key), dim_key, m_bits, k)
    pruned = fact.filter(bloom_might_contain(F.col(fact_key), words, k))
    return pruned.join(
        dim.select(F.col(dim_key).alias(fact_key)).dropDuplicates([fact_key]),
        fact_key,
        "left_semi",
    )
