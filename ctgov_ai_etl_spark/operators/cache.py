"""Tracked persistence for operator-internal caches.

Several iterative / multi-consumer operators (``kmeans_lloyd``,
``triangle_count``, ``kcore``, ``global_rank``, the dedup blocking
passes) must pin a narrow intermediate with ``persist()`` — either for
determinism (``global_rank`` pins one range partitioning across the
counts job and the ranking job) or to stop a shared subtree re-running
per consumer.  Those blocks previously outlived the call: in a
long-lived session they accumulated until executor LRU (or bench.py's
``clearCache()``) evicted them.

This module gives every such persist a handle.  Operators call
:func:`track` on the DataFrame right after ``persist()``; library
callers embedding the engine in a long-lived session call
:func:`release_all` at their own barrier points (end of a pipeline
stage, between jobs) to drop every still-pinned block without the
sledgehammer of ``spark.catalog.clearCache()`` — which would also evict
caches the *caller* owns.

The registry holds STRONG references on purpose: the operator's local
Python handle dies when the function returns, and a weakref with it —
but the JVM cache entry (the actual resource) lives on in Spark's
CacheManager.  A strong reference to the tiny Python-side DataFrame
wrapper is the price of still having a handle to ``unpersist()`` at
release time; ``release_all`` drops the references as it releases, so
nothing accumulates past the caller's chosen barrier.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_TRACKED: list[DataFrame] = []


def track(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame for later :func:`release_all`.

    Returns ``df`` unchanged so call sites stay one-liners:
    ``ranged = track(df.repartitionByRange(...).persist())``.
    """
    with _LOCK:
        _TRACKED.append(df)
    return df


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked DataFrame; returns how many were
    released.  Safe to call at any time — operators re-persist on
    their next invocation, and unpersisting a DataFrame that was never
    materialized (or already unpersisted) is a no-op."""
    with _LOCK:
        dfs, _TRACKED[:] = _TRACKED[:], []
    released = 0
    for df in dfs:
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            # Session already stopped: the blocks are gone anyway.
            pass
    return released


def tracked_count() -> int:
    """How many tracked entries exist (diagnostic)."""
    with _LOCK:
        return len(_TRACKED)
