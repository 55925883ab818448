"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf 0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog
from ``ctgov_ai_etl_spark.queries`` for the DuckDB differential gate
(row count + schema + order-insensitive value hash at sf 0.01).
Self-check locally with ``python tools/check_oracle.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ctgov_ai_etl_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Star-schema revenue rollup: parquet scan with pushed-down date
    filter → fact-fact shuffle join → broadcast dimension hops →
    exact-cents hash aggregation → top-k sort. One query exercising
    the engine's scan/filter/join/agg/sort/limit spine.
    """
    from ctgov_ai_etl_spark.queries.registry import REGISTRY

    load_all()
    return REGISTRY["join_broadcast_star"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query — since round
    2 the whole catalog is hash-checkable (the md5-hashed minhash and
    simhash pipelines closed the last two rows-only entries)."""
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
