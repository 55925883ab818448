"""Byte-level parity tests for the CTGov pipeline operators against
the reference semantics documented (with file:line evidence) in
SURVEY.md §2.1 — flatten defaults, start_year rule, cost-cap split,
sink column order and phantom columns."""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F

from ctgov_ai_etl_spark.fixtures import make_raw_studies_json, make_raw_study
from ctgov_ai_etl_spark.operators.flatten import flatten_studies
from ctgov_ai_etl_spark.operators.limits import deterministic_split, id_set_split
from ctgov_ai_etl_spark.schemas import RAW_STUDY, STUDIES_FLAT_COLUMNS
from ctgov_ai_etl_spark.sources.csv_sink import write_reference_csv


def _flat(spark, n=30):
    raw = spark.createDataFrame(
        [(s,) for s in make_raw_studies_json(n)], "raw_json string"
    )
    return flatten_studies(raw.select(F.from_json("raw_json", RAW_STUDY).alias("study")))


def _reference_flatten(study: dict) -> dict:
    """Independent re-implementation of the documented semantics
    (SURVEY.md R5/R6) used as the expected value — dict.get chains
    with 'N/A' defaults and the dashed-date start_year rule."""
    p = study.get("protocolSection", {})
    ident = p.get("identificationModule", {})
    status = p.get("statusModule", {})
    design = p.get("designModule", {})
    elig = p.get("eligibilityModule", {})
    desc = p.get("descriptionModule", {})
    start_date = status.get("startDateStruct", {}).get("date", "N/A")
    start_year = "N/A"
    if start_date != "N/A" and "-" in start_date:
        start_year = start_date.split("-")[0]
    return {
        "nct_id": ident.get("nctId", "N/A"),
        "brief_title": ident.get("briefTitle", "N/A"),
        "official_title": ident.get("officialTitle", "N/A"),
        "overall_status": status.get("overallStatus", "N/A"),
        "study_type": design.get("studyType", "N/A"),
        "start_date": start_date,
        "gender": elig.get("sex", "N/A"),
        "brief_summary": desc.get("briefSummary", "N/A"),
        "detailed_description": desc.get("detailedDescription", "N/A"),
        "criteria": elig.get("eligibilityCriteria", "N/A"),
        "start_year": start_year,
    }


def test_flatten_matches_reference_semantics_rowwise(spark):
    n = 60
    got = {r["nct_id"]: r.asDict() for r in _flat(spark, n).collect()}
    # nct_id is unique except the 'N/A' group (absent identificationModule)
    expected = [_reference_flatten(make_raw_study(i)) for i in range(n)]
    for exp in expected:
        if exp["nct_id"] == "N/A":
            continue
        assert got[exp["nct_id"]] == exp
    # the 'N/A'-id rows still exist
    assert sum(1 for e in expected if e["nct_id"] == "N/A") == sum(
        1 for r in _flat(spark, n).collect() if r["nct_id"] == "N/A"
    )


def test_start_year_partial_date_rule(spark):
    rows = _flat(spark, 60).select("start_date", "start_year").distinct().collect()
    for r in rows:
        sd, sy = r["start_date"], r["start_year"]
        if sd == "N/A" or "-" not in sd:
            assert sy == "N/A", f"{sd!r} -> {sy!r}"
        else:
            assert sy == sd.split("-")[0]


def test_flat_schema_is_reference_11_columns(spark):
    assert tuple(_flat(spark).columns) == STUDIES_FLAT_COLUMNS


def test_deterministic_split_positional(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    head, rest = deterministic_split(df, 30, ["k"])
    assert [r.k for r in head.orderBy("k").collect()] == list(range(30))
    assert rest.count() == 70
    # remainder is kept, not dropped (R8 semantics)
    assert head.count() + rest.count() == 100


def test_deterministic_split_no_single_reducer(spark):
    """The global rank must not funnel the data through one reducer:
    no unpartitioned-window SinglePartition exchange in the plan."""
    from ctgov_ai_etl_spark.operators.limits import global_rank

    df = spark.range(1000).withColumnRenamed("id", "k")
    plan = global_rank(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_deterministic_split_edges(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    head, rest = deterministic_split(df, 50, ["k"])
    assert head.count() == 10 and rest.count() == 0
    head, rest = deterministic_split(df.filter(F.lit(False)), 5, ["k"])
    assert head.count() == 0 and rest.count() == 0


def test_id_set_split(spark):
    df = spark.createDataFrame([(f"NCT{i}",) for i in range(10)], "nct_id string")
    hit, miss = id_set_split(df, "nct_id", ["NCT1", "NCT5", "NCTx"])
    assert sorted(r.nct_id for r in hit.collect()) == ["NCT1", "NCT5"]
    assert miss.count() == 8


def test_csv_sink_column_order_and_phantoms(spark, tmp_path):
    flat = _flat(spark, 20).withColumn("ai_determined_value", F.lit("NOT MENTIONED"))
    path = os.path.join(tmp_path, "out.csv")
    assert write_reference_csv(flat, path)
    with open(path, newline="", encoding="utf-8") as fh:
        reader = csv.DictReader(fh)
        # exact reference header order (etl.py:449-460)
        assert reader.fieldnames == [
            "nct_id", "brief_title", "official_title", "overall_status",
            "minimum_age", "maximum_age", "study_type", "start_date", "gender",
            "brief_summary", "detailed_description", "criteria", "start_year",
            "ai_determined_value",
        ]
        rows = list(reader)
    assert len(rows) == 20
    # phantom columns are always empty strings (R18)
    assert all(r["minimum_age"] == "" and r["maximum_age"] == "" for r in rows)


def test_extended_flatten_extracts_ages(spark):
    """The extended engine actually extracts minimum/maximum age from
    eligibilityModule (the columns the reference declares but never
    fills — SURVEY R18)."""
    raw = spark.createDataFrame(
        [(s,) for s in make_raw_studies_json(40)], "raw_json string"
    ).select(F.from_json("raw_json", RAW_STUDY).alias("study"))
    flat = flatten_studies(raw, extended=True)
    assert "minimum_age" in flat.columns and "maximum_age" in flat.columns
    rows = {r["nct_id"]: r for r in flat.collect()}
    for i in range(40):
        s = make_raw_study(i)
        elig = s.get("protocolSection", {}).get("eligibilityModule")
        nct = s.get("protocolSection", {}).get("identificationModule", {}).get("nctId")
        if nct is None or nct not in rows:
            continue
        expected_min = (elig or {}).get("minimumAge", "N/A")
        assert rows[nct]["minimum_age"] == expected_min


def test_yaml_config_drop_in(spark, tmp_path):
    """A reference-shaped YAML config drives the whole pipeline (R1:
    same keys as the reference's config.example.yaml)."""
    import os

    from ctgov_ai_etl_spark.config import load_config
    from ctgov_ai_etl_spark.plans.pipeline import run_pipeline

    cfg = load_config("examples/pipeline_config.yaml")
    assert cfg["ctgov"]["page_size"] == 10
    out_csv = os.path.join(tmp_path, "out.csv")
    df = run_pipeline(spark, cfg, csv_path=out_csv)
    rows = df.collect()
    assert len(rows) == 57
    labeled = [r for r in rows if r["ai_determined_value"] != "N/A"]
    assert len(labeled) == 30  # max_rows cost cap
    assert os.path.exists(out_csv)


def test_csv_sink_empty_input_no_write(spark, tmp_path):
    flat = _flat(spark, 5).filter(F.lit(False))
    path = os.path.join(tmp_path, "never.csv")
    assert write_reference_csv(flat, path) is False
    assert not os.path.exists(path)
