"""REST data source: pagination protocol, Essie filter pushdown
translation, page cap (reference R2/R3/R4 semantics)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    IsNull,
    LessThan,
    StringContains,
)

from ctgov_ai_etl_spark.fixtures import make_raw_study
from ctgov_ai_etl_spark.sources import rest


def _read(spark, **opts):
    rest.register(spark)
    reader = spark.read.format("ctgov_rest")
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


FIXTURE_OPTS = dict(
    transport_factory="ctgov_ai_etl_spark.fixtures:mock_ctgov_transport",
    transport_args="[57, 10]",
    page_size="10",
)


def test_token_pagination_reads_all_pages(spark):
    df = _read(spark, **FIXTURE_OPTS)
    assert df.count() == 57  # 6 pages: 10×5 + 7


def test_rows_are_parseable_study_json(spark):
    df = _read(spark, **FIXTURE_OPTS)
    first = json.loads(df.limit(1).collect()[0].raw_json)
    assert "protocolSection" in first
    assert first == make_raw_study(0)


def test_page_cap_limits_pages(spark):
    df = _read(spark, **FIXTURE_OPTS, max_pages="2")
    assert df.count() == 20  # cap at 2 pages of 10 (reference cap semantics)


def test_filters_to_essie_translation():
    conjuncts, unsupported = rest.filters_to_essie(
        [
            EqualTo(("StudyType",), "INTERVENTIONAL"),
            GreaterThanOrEqual(("StartDate",), "2013-05-01"),
            LessThan(("MinimumAge",), 64),  # unsupported → stays with Spark
            IsNull(("MaximumAge",)),
            StringContains(("Study",), "pregnancy"),
        ]
    )
    assert conjuncts == [
        "AREA[StudyType]INTERVENTIONAL",
        "AREA[StartDate]RANGE[2013-05-01,MAX]",
        "AREA[MaximumAge]MISSING",
        "SEARCH[Study]pregnancy",
    ]
    assert len(unsupported) == 1 and isinstance(unsupported[0], LessThan)


def test_indexed_paging_parallel_partitions(spark):
    opts = dict(FIXTURE_OPTS, transport_args="[57, 10, true]")
    df = _read(spark, **opts, paging="indexed", max_pages="6")
    # indexed mode plans one partition per page
    assert df.rdd.getNumPartitions() == 6
    assert df.count() == 57


def test_config_conjuncts_reach_params(spark):
    # the transport asserts on filter.advanced via a factory that
    # records params into the rows it serves
    df = _read(
        spark,
        transport_factory="tests.test_rest_source:echo_params_transport",
        transport_args="[]",
        filter_advanced="AREA[StudyType]INTERVENTIONAL AND SEARCH[Study]pregnant",
    )
    row = json.loads(df.collect()[0].raw_json)
    assert (
        row["echo"]["filter.advanced"]
        == "AREA[StudyType]INTERVENTIONAL AND SEARCH[Study]pregnant"
    )


def echo_params_transport():
    def transport(params, token):
        return {"studies": [{"echo": params}]}

    return transport
