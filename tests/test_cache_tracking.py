"""Tracked-persist registry (operators/cache.py): operators register
their internal persists so long-lived sessions can release them with
release_all() instead of spark.catalog.clearCache()."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.operators import cache
from ctgov_ai_etl_spark.operators.graph import kcore, triangle_count
from ctgov_ai_etl_spark.operators.limits import global_rank


def test_track_release_unpersists(spark):
    cache.release_all()  # clean slate
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    cached = cache.track(df.persist())
    cached.count()
    assert cached.storageLevel.useMemory
    assert cache.tracked_count() >= 1
    released = cache.release_all()
    assert released >= 1
    assert not cached.storageLevel.useMemory
    assert cache.tracked_count() == 0


def test_operator_persists_are_tracked_and_releasable(spark):
    cache.release_all()
    df = spark.range(50).withColumn("k", F.col("id") % 7)
    ranked = global_rank(df, ["id"])
    ranked.count()
    # global_rank pins its range-partitioned frame; it must be tracked.
    assert cache.tracked_count() >= 1
    assert cache.release_all() >= 1


def test_registry_survives_operator_scope_exit(spark):
    # The operator's local handle dies at return; the registry's strong
    # reference must keep a handle alive so release_all can unpersist.
    cache.release_all()

    def op():
        inner = cache.track(spark.range(10).persist())
        inner.count()

    op()
    import gc

    gc.collect()
    assert cache.tracked_count() == 1
    assert cache.release_all() == 1
    assert cache.tracked_count() == 0


def test_kcore_rejects_nonpositive_rounds(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="rounds >= 1"):
        kcore(edges, k=1, rounds=0)


def test_kcore_releases_edge_cache(spark):
    cache.release_all()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = kcore(edges, k=2, rounds=2)
    rows = {(r.node, r.deg) for r in out.collect()}
    assert rows == {(1, 2), (2, 2), (3, 2)}


def test_triangle_count_caches_released_by_release_all(spark):
    cache.release_all()
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4)], "src long, dst long"
    )
    out = triangle_count(edges)
    assert {(r.node, r.triangles) for r in out.collect()} == {
        (1, 1),
        (2, 1),
        (3, 1),
    }
    assert cache.tracked_count() >= 2  # und + oriented table
    assert cache.release_all() >= 2


def test_stream_semantic_oracle_under_adverse_import_order():
    # Regression: stream_batch imported BEFORE queries.semantic used to
    # leave stream_run_semantic_admission's oracle as None (the twin
    # wasn't registered yet and the patch never retried).  Must run in
    # a fresh interpreter — the pytest process has everything imported.
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, '.');"
        "import ctgov_ai_etl_spark.queries.stream_batch;"
        "from ctgov_ai_etl_spark.queries.registry import REGISTRY;"
        "assert REGISTRY['stream_run_semantic_admission'].oracle is not None"
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd=repo)


def test_spanning_pairs_have_identical_components(spark):
    # spanning=True must yield bit-identical connected components to
    # the full pair graph — the contract that lets CC consumers skip
    # the quadratic intra-clique/inter-set explosion.
    from ctgov_ai_etl_spark.operators.dedup import (
        connected_components,
        jaccard_token_pairs,
    )
    from ctgov_ai_etl_spark.tables import load_table
    from tests.conftest import SF_SMALL

    d = load_table(spark, SF_SMALL, "documents")
    full = jaccard_token_pairs(d, "doc_id", "text", threshold=0.9)
    span = jaccard_token_pairs(
        d, "doc_id", "text", threshold=0.9, spanning=True
    )
    n_full, n_span = full.count(), span.count()
    assert n_span <= n_full
    cc_full = {
        (r.doc_id, r.component)
        for r in connected_components(
            d.select("doc_id"), full.select("id_a", "id_b"), id_col="doc_id"
        ).collect()
    }
    cc_span = {
        (r.doc_id, r.component)
        for r in connected_components(
            d.select("doc_id"), span.select("id_a", "id_b"), id_col="doc_id"
        ).collect()
    }
    assert cc_full == cc_span
    # The spanning graph must also stay within the full pair set's
    # similarity contract: every emitted edge is a true >= t pair.
    full_set = {(r.id_a, r.id_b) for r in full.collect()}
    span_set = {(r.id_a, r.id_b) for r in span.collect()}
    assert span_set <= full_set
