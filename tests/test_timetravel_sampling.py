"""Round-6 operators: CDC time travel, reservoir sampling, triangle
counting, and k-means empty-cluster reseeding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from ctgov_ai_etl_spark.operators.graph import triangle_count
from ctgov_ai_etl_spark.operators.limits import (
    reservoir_sample,
    weighted_reservoir_sample,
)
from ctgov_ai_etl_spark.operators.merge import (
    apply_change_feed,
    snapshot_diff,
    time_travel,
)


# ------------------------------------------------------- time travel


def _versions(spark):
    """Three hand-built snapshots exercising I, D, and U at each step."""
    v0 = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 30, "b")], "k INT, val INT, s STRING"
    )
    # v1: delete 2, update 3, insert 4
    v1 = spark.createDataFrame(
        [(1, 10, "a"), (3, 31, "b"), (4, 40, "c")], "k INT, val INT, s STRING"
    )
    # v2: delete 1, update 4 (NULL transition), insert 5
    v2 = spark.createDataFrame(
        [(3, 31, "b"), (4, None, "c"), (5, 50, "d")], "k INT, val INT, s STRING"
    )
    return v0, v1, v2


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_apply_change_feed_reconstructs_target(spark):
    v0, v1, _ = _versions(spark)
    feed = snapshot_diff(v0, v1, ["k"], ["val", "s"])
    assert _rows(apply_change_feed(v0, feed, ["k"], ["val", "s"])) == _rows(v1)


def test_time_travel_every_version(spark):
    v0, v1, v2 = _versions(spark)
    feeds = [
        snapshot_diff(v0, v1, ["k"], ["val", "s"]),
        snapshot_diff(v1, v2, ["k"], ["val", "s"]),
    ]
    for want, ver in ((v0, 0), (v1, 1), (v2, 2)):
        got = time_travel(v0, feeds, ["k"], ["val", "s"], version=ver)
        assert _rows(got) == _rows(want), f"version {ver}"
    # default = latest
    assert _rows(time_travel(v0, feeds, ["k"], ["val", "s"])) == _rows(v2)


def test_time_travel_version_out_of_range(spark):
    v0, v1, _ = _versions(spark)
    feeds = [snapshot_diff(v0, v1, ["k"], ["val", "s"])]
    with pytest.raises(ValueError):
        time_travel(v0, feeds, ["k"], ["val", "s"], version=2)
    with pytest.raises(ValueError):
        time_travel(v0, feeds, ["k"], ["val", "s"], version=-1)


# -------------------------------------------------- reservoir sample


def test_reservoir_exact_k_and_partition_stable(spark):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select("o_orderkey")
    a = {r.o_orderkey for r in reservoir_sample(o, 20, "o_orderkey").collect()}
    b = {
        r.o_orderkey
        for r in reservoir_sample(o.repartition(13), 20, "o_orderkey").collect()
    }
    assert len(a) == 20 and a == b


def test_reservoir_prefilter_matches_exact(spark):
    """The n_hint map-side prefilter is a prefix of the same md5
    ordering, so it must select the identical bottom-k set."""
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select("o_orderkey")
    exact = {r.o_orderkey for r in reservoir_sample(o, 20, "o_orderkey").collect()}
    pre = {
        r.o_orderkey
        for r in reservoir_sample(
            o, 20, "o_orderkey", n_hint=1500, margin=8
        ).collect()
    }
    assert pre == exact


def test_reservoir_salt_gives_independent_draw(spark):
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select("o_orderkey")
    a = {r.o_orderkey for r in reservoir_sample(o, 50, "o_orderkey").collect()}
    b = {
        r.o_orderkey
        for r in reservoir_sample(o, 50, "o_orderkey", salt="b").collect()
    }
    assert len(b) == 50 and a != b


def test_weighted_reservoir_prefers_heavy_rows(spark):
    rows = [(i, 1000.0 if i < 20 else 1.0) for i in range(400)]
    df = spark.createDataFrame(rows, "id INT, w DOUBLE")
    got = weighted_reservoir_sample(df, 20, "id", "w")
    heavy = sum(1 for r in got.collect() if r.w > 1.0)
    # 20 of 400 rows hold weight 1000 vs 1: A-ES puts nearly all of
    # them in a k=20 sample; ≥ 14 leaves room for hash luck.
    assert got.count() == 20 and heavy >= 14


def test_weighted_reservoir_rejects_nonpositive_weight(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 0.0)], "id INT, w DOUBLE")
    with pytest.raises(Exception, match="non-positive weight"):
        weighted_reservoir_sample(df, 2, "id", "w").collect()


# ------------------------------------------------------ triangles


def test_triangle_count_k4_with_noise(spark):
    """K4 on {1,2,3,4}: four triangles, each vertex in exactly 3.
    Self-loops, reversed duplicates, and multi-edges must not change
    counts; the dangling vertex 5 never appears."""
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    noise = [(2, 2), (2, 1), (3, 1), (4, 5), (1, 2), (1, 2)]
    df = spark.createDataFrame(k4 + noise, "src INT, dst INT")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_path_graph_empty(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(10)], "src INT, dst INT")
    assert triangle_count(df).count() == 0


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    """Degree-oriented counts == O(n³) brute force on a pseudo-random
    graph (deterministic arithmetic edges, no RNG)."""
    n = 30
    edges = [
        ((i * 7 + 3) % n, (i * i + 5 * i) % n) for i in range(120)
    ]
    und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    expect: dict[int, int] = {}
    nodes = sorted({x for e in und for x in e})
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            for c in nodes[nodes.index(b) + 1 :]:
                if (a, b) in und and (b, c) in und and (a, c) in und:
                    for x in (a, b, c):
                        expect[x] = expect.get(x, 0) + 1
    df = spark.createDataFrame(edges, "src INT, dst INT")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == expect


# ------------------------------------------------- k-means reseed


def test_kmeans_reseed_keeps_k_stable_on_duplicate_seeds(spark):
    """Two identical seed vectors: the default path collapses to one
    cluster (ties assign everything to the lowest cid, the other
    empties and vanishes); reseed=True repairs it from the farthest
    point and k survives."""
    from ctgov_ai_etl_spark.operators.clustering import kmeans_lloyd

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [10.0, 10.0]),
        (3, [10.5, 10.5]),
        (4, [-5.0, 8.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")
    plain = kmeans_lloyd(df, k=2, rounds=1)
    repaired = kmeans_lloyd(df, k=2, rounds=1, reseed=True)
    assert plain.select("cid").distinct().count() == 1
    assert repaired.select("cid").distinct().count() == 2


def test_kmeans_reseed_noop_when_no_empty_clusters(spark):
    """With healthy clusters the reseed path is bit-identical to the
    default (the oracle-checked plan)."""
    from ctgov_ai_etl_spark.operators.clustering import kmeans_lloyd

    e = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    a = sorted(map(tuple, kmeans_lloyd(e, k=4, rounds=1).collect()))
    b = sorted(map(tuple, kmeans_lloyd(e, k=4, rounds=1, reseed=True).collect()))
    assert a == b
