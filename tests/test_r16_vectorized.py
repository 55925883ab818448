"""Round-16 optimization internals: the vectorized numpy rewrites must
be BIT-IDENTICAL to the JVM expression forms they replaced.

- _minhash_sig_udf vs the array_min(transform(...)) permutation fold
  (exact int64 arithmetic, NULL/empty contracts included).
- _centroid_dots_udf vs the aggregate(zip_with(...)) double fold:
  np.cumsum accumulates strictly left-to-right, so the last prefix
  sum must reproduce the identical double sequence.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def _expr_sigs(spark, rows, num_hashes):
    """The pre-r16 JVM expression form, verbatim."""
    from ctgov_ai_etl_spark.operators.dedup import _P, _hash_params

    df = spark.createDataFrame(rows, "id int, bh array<long>")
    sigs = [
        F.array_min(
            F.transform(
                F.col("bh"), lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(_P))
            )
        )
        for a, b in _hash_params(num_hashes)
    ]
    return {
        r["id"]: r["sig"]
        for r in df.select("id", F.array(*sigs).alias("sig")).collect()
    }


def test_minhash_sig_udf_bit_equal(spark):
    from ctgov_ai_etl_spark.operators.dedup import _P, _minhash_sig_udf

    rng = np.random.RandomState(7)
    rows = [
        (i, [int(x) for x in rng.randint(0, _P, size=rng.randint(1, 40))])
        for i in range(200)
    ]
    # contract rows: empty array and NULL array both yield [NULL]*n
    rows.append((9000, []))
    rows.append((9001, None))
    num_hashes = 64
    want = _expr_sigs(spark, rows, num_hashes)
    df = spark.createDataFrame(rows, "id int, bh array<long>")
    got = {
        r["id"]: r["sig"]
        for r in df.select(
            "id", _minhash_sig_udf(num_hashes)(F.col("bh")).alias("sig")
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], f"sig mismatch for id {k}"
    assert got[9000] == [None] * num_hashes
    assert got[9001] == [None] * num_hashes


def test_cumsum_is_sequential():
    """Pin the numpy property the rewrites rely on: cumsum's last
    element equals an explicit left-to-right Python fold, bit for bit,
    including on magnitude mixes where pairwise summation differs."""
    rng = np.random.RandomState(3)
    for _ in range(50):
        x = rng.randn(64) * np.logspace(-10, 10, 64)[rng.permutation(64)]
        acc = np.float64(0.0)
        for v in x:
            acc = acc + np.float64(v)
        assert np.cumsum(x)[-1].tobytes() == acc.tobytes()


def test_centroid_dots_udf_bit_equal(spark):
    from ctgov_ai_etl_spark.operators.similarity import (
        _centroid_dots_udf,
        dot,
        seeded_centroids,
    )

    cents = seeded_centroids(k=16, dim=32)
    rng = np.random.RandomState(5)
    rows = [(i, rng.randn(32).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, v array<double>")
    exprs = [
        dot(F.col("v"), F.array(*[F.lit(x) for x in c])).alias(f"d{j}")
        for j, c in enumerate(cents)
    ]
    jvm = {r["id"]: [r[f"d{j}"] for j in range(len(cents))]
           for r in df.select("id", *exprs).collect()}
    py = {
        r["id"]: r["ds"]
        for r in df.select(
            "id", _centroid_dots_udf(cents)(F.col("v")).alias("ds")
        ).collect()
    }
    for k, v in jvm.items():
        for j, (x, y) in enumerate(zip(v, py[k])):
            assert np.float64(x).tobytes() == np.float64(y).tobytes(), (
                f"centroid dot mismatch id {k} cent {j}"
            )
