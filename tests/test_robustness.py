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


def test_round6_operators_degenerate_inputs(spark):
    """Degenerate-corpus behavior of the round-6 operators: single-doc
    and empty-string inputs must produce well-defined results, not
    exceptions or nulls."""
    from ctgov_ai_etl_spark.functions.text import hash_embedding
    from ctgov_ai_etl_spark.operators.dedup import sorted_neighborhood_pairs
    from ctgov_ai_etl_spark.operators.quality import (
        bigram_lm_score,
        linear_quality_score,
        remove_boilerplate_lines,
    )

    one = spark.createDataFrame([(1, "only doc here")], "doc_id long, text string")
    empty_text = spark.createDataFrame([(1, "")], "doc_id long, text string")

    # SNM: a 1-doc corpus has no neighbors -> empty pair set
    assert sorted_neighborhood_pairs(one).count() == 0
    # boilerplate: nothing repeats -> identity, zero removed
    r = remove_boilerplate_lines(one).collect()[0]
    assert r.clean_text == "only doc here" and r.n_removed == 0
    # bigram LM: single doc trains and scores itself; empty text drops
    assert bigram_lm_score(one).count() == 1
    assert bigram_lm_score(empty_text).count() == 0
    # linear classifier: empty text is one '' feature, finite logit
    row = linear_quality_score(empty_text).collect()[0]
    assert row.n_features == 1 and row.logit_micro is not None
    # hash embedding: empty text -> one token, exactly one +/-1 cell
    v = empty_text.select(hash_embedding(F.col("text")).alias("v")).collect()[0].v
    assert sum(abs(x) for x in v) == 1
