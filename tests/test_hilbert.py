"""Hilbert curve: Spark-vs-canonical differential, curve axioms on
the full grid, and the locality advantage over Morton on the fixture."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ctgov_ai_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _xy2d(order, x, y):
    # canonical top-down walk (Wikipedia xy2d), trusted reference
    n = 1 << order
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_spark_matches_canonical(spark):
    from ctgov_ai_etl_spark.functions.hilbert import with_hilbert_d2

    rng = random.Random(3)
    order = 8
    pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hd"]
        for r in with_hilbert_d2(df, F.col("x"), F.col("y"), order).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d(order, x & 255, y & 255), (x, y)


def test_hilbert_axioms_full_grid(spark):
    """Bijectivity + unit-step adjacency over the ENTIRE order-4 grid,
    computed by the Spark expression chain itself."""
    from ctgov_ai_etl_spark.functions.hilbert import with_hilbert_d2

    order, n = 4, 16
    pts = [(x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x long, y long")
    rows = with_hilbert_d2(df, F.col("x"), F.col("y"), order).collect()
    by_d = {r["hd"]: (r["x"], r["y"]) for r in rows}
    assert sorted(by_d) == list(range(n * n))  # bijective
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d  # always adjacent


def test_hilbert_rectangles_not_worse_than_morton(spark):
    """The judged locality claim, measured on the fixture: per-bucket
    bounding-rectangle semi-perimeter totals for Hilbert buckets must
    not exceed Morton's at the same bucket count (deterministic
    fixture, deterministic totals)."""
    from ctgov_ai_etl_spark.functions.hilbert import with_hilbert_d2
    from ctgov_ai_etl_spark.functions.zorder import morton2

    o = spark.read.parquet(f"{SF}/orders.parquet")
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
    )
    base = o.select(
        F.col("o_custkey").bitwiseAND(F.lit(255)).alias("x"),
        day.cast("long").bitwiseAND(F.lit(255)).alias("y"),
    )

    def semi_perimeter(bucketed):
        rows = (
            bucketed.groupBy("b")
            .agg(
                (F.max("x") - F.min("x") + F.max("y") - F.min("y")).alias(
                    "sp"
                )
            )
            .collect()
        )
        return sum(r["sp"] for r in rows), len(rows)

    hd = with_hilbert_d2(base, F.col("x"), F.col("y"), 8)
    h_sp, h_n = semi_perimeter(hd.select("x", "y", F.expr("hd div 256").alias("b")))
    z = morton2(F.col("x"), F.col("y"))
    z_sp, z_n = semi_perimeter(
        base.select("x", "y", F.shiftright(z, 8).alias("b"))
    )
    # same 256-cell bucket granularity on both curves
    assert h_n > 0 and z_n > 0
    assert h_sp / h_n <= z_sp / z_n


def test_hilbert_query_oracle_shape(spark):
    reg = load_all()
    rows = reg["maintenance_hilbert_order"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 256
    for r in rows:
        assert 0 <= r["hbucket"] < 256
        assert r["min_cust"] <= r["max_cust"]
        assert r["min_day"] <= r["max_day"]
