"""Multi-pass GROUPING SETS (operators/rollup.py): equivalence with
the native Expand-based plan, NULL-dim semantics, grouping_id
convention, plan shape, and input validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.operators.rollup import Measure, grouping_sets_multipass


def _rows(df):
    # None sorts before everything via the (is-None, value) key.
    return sorted(
        (tuple(r[c] for c in sorted(df.columns)) for r in df.collect()),
        key=lambda t: tuple((v is not None, v) for v in t),
    )


@pytest.fixture()
def facts(spark):
    return spark.createDataFrame(
        [
            ("a", "x", 1, 10),
            ("a", "y", 1, 20),
            ("b", "x", 2, 30),
            ("b", None, 2, 40),  # NULL data value in a dim
            (None, "y", 1, 50),
        ],
        "d1 string, d2 string, d3 int, v long",
    )


SETS = [["d1", "d2"], ["d1", "d3"], ["d2"], []]


def test_matches_native_grouping_sets(spark, facts):
    out = grouping_sets_multipass(
        facts,
        dims=["d1", "d2", "d3"],
        sets=SETS,
        measures=[
            Measure("n", F.count("*").cast("long"), "sum"),
            Measure("sv", F.sum("v"), "sum"),
            Measure("mx", F.max("v"), "max"),
            Measure("mn", F.min("v"), "min"),
        ],
    )
    facts.createOrReplaceTempView("facts_gsm")
    native = spark.sql(
        """
        SELECT d1, d2, d3, grouping_id() AS grouping_id,
               CAST(count(*) AS LONG) AS n, sum(v) AS sv,
               max(v) AS mx, min(v) AS mn
        FROM facts_gsm
        GROUP BY GROUPING SETS ((d1, d2), (d1, d3), (d2), ())
        """
    )
    assert _rows(out) == _rows(native)


def test_null_data_value_stays_distinct_from_subtotal(spark, facts):
    out = grouping_sets_multipass(
        facts,
        dims=["d1", "d2"],
        sets=[["d1", "d2"], ["d1"]],
        measures=[Measure("n", F.count("*").cast("long"), "sum")],
    ).collect()
    # ('b', NULL) appears TWICE with different grouping_ids: once as the
    # data-NULL detail cell (gid 0) and once as b's subtotal (gid 1).
    b_null = sorted(
        (r.grouping_id, r.n) for r in out if r.d1 == "b" and r.d2 is None
    )
    assert b_null == [(0, 1), (1, 2)]


def test_plan_has_no_expand(spark, facts):
    out = grouping_sets_multipass(
        facts,
        dims=["d1", "d2", "d3"],
        sets=SETS,
        measures=[Measure("n", F.count("*").cast("long"), "sum")],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    native = facts.cube("d1", "d2").agg(F.count("*"))
    native_plan = native._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in native_plan  # the thing we're avoiding


def test_validation_errors(spark, facts):
    m = [Measure("n", F.count("*").cast("long"), "sum")]
    with pytest.raises(ValueError, match=">= 1 grouping set"):
        grouping_sets_multipass(facts, ["d1"], [], m)
    with pytest.raises(ValueError, match="not in dims"):
        grouping_sets_multipass(facts, ["d1"], [["bogus"]], m)
    with pytest.raises(ValueError, match="merge must be one of"):
        grouping_sets_multipass(
            facts, ["d1"], [["d1"]], [Measure("n", F.count("*"), "avg")]
        )


def test_multipass_fuzz_vs_native(spark):
    # Random tables / random grouping sets must match the native
    # Expand-based plan exactly (incl. NULL dim values + grouping_id).
    import random

    rng = random.Random(1411)
    for trial in range(4):
        rows = [
            (
                rng.choice(["a", "b", None]),
                rng.choice(["x", "y", "z", None]),
                rng.randint(0, 2),
                rng.randint(-5, 50),
            )
            for _ in range(rng.randint(1, 60))
        ]
        df = spark.createDataFrame(
            rows, "d1 string, d2 string, d3 int, v long"
        )
        dims = ["d1", "d2", "d3"]
        all_sets = [
            [],
            ["d1"], ["d2"], ["d3"],
            ["d1", "d2"], ["d1", "d3"], ["d2", "d3"],
            ["d1", "d2", "d3"],
        ]
        sets = rng.sample(all_sets, rng.randint(1, 5))
        out = grouping_sets_multipass(
            df, dims, sets,
            [
                Measure("n", F.count("*").cast("long"), "sum"),
                Measure("sv", F.sum("v"), "sum"),
                Measure("mx", F.max("v"), "max"),
            ],
        )
        df.createOrReplaceTempView(f"fuzz_gsm_{trial}")
        sql_sets = ", ".join(
            "(" + ", ".join(s) + ")" for s in sets
        )
        # Dims in NO sampled set are illegal to select under native
        # GROUPING SETS; pad them as NULL and as an always-set
        # grouping_id bit, mirroring the operator's all-dims bitmask.
        used = {c for s in sets for c in s}
        dim_types = {"d1": "string", "d2": "string", "d3": "int"}
        sel = ", ".join(
            d if d in used else f"CAST(NULL AS {dim_types[d]}) AS {d}"
            for d in dims
        )
        gid = " + ".join(
            f"grouping({d}) * {1 << (len(dims) - 1 - i)}"
            if d in used
            else f"{1 << (len(dims) - 1 - i)}"
            for i, d in enumerate(dims)
        )
        native = spark.sql(
            f"""
            SELECT {sel}, CAST({gid} AS LONG) AS grouping_id,
                   CAST(count(*) AS LONG) AS n, sum(v) AS sv, max(v) AS mx
            FROM fuzz_gsm_{trial}
            GROUP BY GROUPING SETS ({sql_sets})
            """
        )
        assert _rows(out) == _rows(native), (trial, sets)


def test_empty_input_grand_total_count_zero(spark):
    """GROUPING SETS (()) over an EMPTY fact table must agree with
    the native Expand plan: ZERO rows — a bare global .agg() for the
    empty set would fabricate a grand-total row native never emits."""
    empty = spark.createDataFrame([], "d1 string, v long")
    out = grouping_sets_multipass(
        empty,
        dims=["d1"],
        sets=[[], ["d1"]],
        measures=[
            Measure("n", F.count("*").cast("long"), "sum"),
            Measure("sv", F.sum("v"), "sum"),
        ],
    )
    empty.createOrReplaceTempView("facts_gsm_empty")
    native = spark.sql(
        """
        SELECT d1, grouping_id() AS grouping_id,
               CAST(count(*) AS LONG) AS n, sum(v) AS sv
        FROM facts_gsm_empty
        GROUP BY GROUPING SETS ((), (d1))
        """
    )
    # Native Spark GROUPING SETS over empty input emits ZERO rows
    # (the Expand produces nothing) — including for the () set.  The
    # multipass operator must match that, not fabricate a grand-total
    # row the way a bare global .agg() would.  (Postgres/DuckDB DO
    # emit a count-0 grand total; the operator follows Spark.)
    assert _rows(native) == []
    assert _rows(out) == []
