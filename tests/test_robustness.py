"""Malformed-input robustness: a 100 TB ingest WILL contain broken
records; the engine must capture them, not crash the job (the
reference aborts the whole extract on any JSON error, etl.py:163-171
— the engine's permissive scan is the deliberate improvement)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_permissive_json_scan_captures_corrupt_records(spark, tmp_path):
    path = tmp_path / "raw.jsonl"
    path.write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2 "name": "missing comma"}\n'      # malformed
        '{"id": 3, "name": "fine"}\n'
        "not json at all\n"                        # malformed
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(path))
        .cache()  # SPARK-21610: corrupt-record column needs a materialized frame
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 2
    # the raw broken text is preserved for quarantine/replay
    assert any("missing comma" in r._corrupt_record for r in bad.collect())


def test_failfast_json_scan_raises_on_corruption(spark, tmp_path):
    import pytest

    path = tmp_path / "raw.jsonl"
    path.write_text('{"id": 1}\nnot json\n')
    df = (
        spark.read.schema("id long")
        .option("mode", "FAILFAST")
        .json(str(path))
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        df.collect()


def test_every_registered_query_has_an_oracle():
    """Full-oracle coverage is a shipped property (zero rows-only
    entries since round 2); this pins it so a future query without a
    DuckDB replay fails CI instead of silently weakening the gate."""
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    missing = [n for n in qs if n not in osql]
    assert missing == [], f"queries without oracle SQL: {missing}"
