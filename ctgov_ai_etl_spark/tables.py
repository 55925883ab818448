"""Testdata table loading.

Always reads with the explicit schema from :mod:`schemas` — schema
inference is a correctness and performance hazard at 100 TB (a full
footer scan per query); explicit schemas also guarantee the parquet
reader can push filters and prune columns deterministically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ctgov_ai_etl_spark.schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Runtime-settable session confs the engine depends on, applied to
# whatever SparkSession the caller hands us (the driver harness builds
# its own). All are documented SQL confs, safe to set mid-session.
_SESSION_CONFS = {
    # UTC so timestamp values equal the parquet wall-clock (and the
    # DuckDB oracle's naive timestamps) regardless of host timezone.
    "spark.sql.session.timeZone": "UTC",
    # If events.parquet stores TIMESTAMP(NANOS), read as int64 nanos
    # (load_table converts adaptively). Harmless when the file stores
    # µs timestamps — the reader then yields TimestampType directly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Read parquet isAdjustedToUTC=false timestamps as TimestampType
    # (not NTZ) so schemas match the oracle's TIMESTAMP.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # The REST data source translates Catalyst filters to Essie
    # conjuncts (DSv2 pushdown); off by default in Spark 4.1.
    "spark.sql.python.filterPushdown.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply the engine's required runtime confs (idempotent)."""
    for k, v in _SESSION_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (columnar parquet scan)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_events_ts(df)
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df


def _normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events ``ts`` column to TimestampType, adapting to
    how the file was physically stored.

    The storage format has changed under the engine before (TIMESTAMP
    with nanos → timestamp[us]), so never assume a conf applied — branch
    on the dtype the reader actually produced:

    - LongType: nanosAsLong fired (file stores nanos). Values are
      µs-aligned, so integer-dividing to µs is exact.
    - TimestampType / TimestampNTZType: already what we want.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        # Session tz is pinned to UTC, so this relabel is value-exact.
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    if isinstance(dt, T.TimestampType):
        return df
    raise TypeError(f"events.ts has unsupported storage dtype {dt}")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for the SQL API."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
