"""Property-based parity: the flatten operator must reproduce the
reference's dict.get-chain semantics (SURVEY.md §2.1 R5/R6) for ANY
study shape, not just the fixture corpus — hypothesis generates
adversarial nesting (absent modules, null leaves, weird date strings)
and compares row-by-row against an independent reimplementation of
the documented semantics."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.operators.flatten import flatten_studies
from ctgov_ai_etl_spark.schemas import RAW_STUDY
from tests.test_parity import _reference_flatten

_text = st.one_of(st.none(), st.text(alphabet="abcXYZ 019-", max_size=12))
_date = st.one_of(
    st.none(),
    st.sampled_from(["2013-05-01", "2013-05", "2013", "1999", "20-1", "-", ""]),
    st.text(alphabet="0123456789-", max_size=10),
)


def _maybe(inner):
    return st.one_of(st.none(), inner)


_study = st.fixed_dictionaries(
    {},
    optional={
        "protocolSection": st.fixed_dictionaries(
            {},
            optional={
                "identificationModule": st.fixed_dictionaries(
                    {}, optional={"nctId": _text, "briefTitle": _text, "officialTitle": _text}
                ),
                "statusModule": st.fixed_dictionaries(
                    {},
                    optional={
                        "overallStatus": _text,
                        "startDateStruct": st.fixed_dictionaries(
                            {}, optional={"date": _date}
                        ),
                    },
                ),
                "designModule": st.fixed_dictionaries({}, optional={"studyType": _text}),
                "eligibilityModule": st.fixed_dictionaries(
                    {}, optional={"sex": _text, "eligibilityCriteria": _text}
                ),
                "descriptionModule": st.fixed_dictionaries(
                    {}, optional={"briefSummary": _text, "detailedDescription": _text}
                ),
            },
        )
    },
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(studies=st.lists(_study, min_size=1, max_size=12))
def test_flatten_equals_reference_semantics_for_any_shape(spark, studies):
    raw = spark.createDataFrame(
        [(json.dumps(s),) for s in studies], "raw_json string"
    ).select(F.from_json("raw_json", RAW_STUDY).alias("study"))
    got = [r.asDict() for r in flatten_studies(raw).collect()]
    # Reference semantics treat explicit null like absent ('N/A' via
    # dict.get default / None): normalize both through the same rule.
    expected = [_reference_flatten(_strip_nulls(s)) for s in studies]
    key = lambda d: tuple(sorted(d.items()))  # noqa: E731
    assert sorted(got, key=key) == sorted(expected, key=key)


def _strip_nulls(obj):
    if isinstance(obj, dict):
        return {k: _strip_nulls(v) for k, v in obj.items() if v is not None}
    return obj
