"""Unit tests for the round-9 product-analytics wave: synthetic-frame
checks that each operator's semantics match an independent Python
reference (the oracle queries cover the fixture-scale differential)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_funnel_bound_and_order(spark):
    from ctgov_ai_etl_spark.queries.product import _funnel_counts, _funnel_steps

    # user 1: full in-order chain; user 2: click BEFORE view (no step 2);
    # user 3: click 8 days after view (outside the 7-day bound).
    day = 86_400_000_000
    ev = spark.createDataFrame(
        [
            (1, 1, "view", 0), (1, 2, "click", day), (1, 3, "purchase", 2 * day),
            (2, 4, "click", 0), (2, 5, "view", day), (2, 6, "purchase", 2 * day),
            (3, 7, "view", 0), (3, 8, "click", 8 * day),
        ],
        "user_id long, event_id long, event_type string, us long",
    ).select("user_id", "event_id", "event_type",
             F.timestamp_micros("us").alias("ts"))
    s1, s2, s3 = _funnel_steps(ev, 7 * day)
    out = {r["step"]: r["n_users"] for r in _funnel_counts(s1, s2, s3).collect()}
    assert out == {1: 3, 2: 1, 3: 1}


def test_pareto_frontier_matches_bruteforce(spark):
    import itertools
    import random

    from ctgov_ai_etl_spark.queries import load_all

    rng = random.Random(5)
    pts = list({(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(60)})

    def dominated(p, q):
        return q[0] >= p[0] and q[1] >= p[1] and q != p

    brute = sorted(
        p for p in pts if not any(dominated(p, q) for q in pts)
    )
    # replicate the operator's sweep on a synthetic frame
    df = spark.createDataFrame(pts, "m_cents long, f long")
    from pyspark.sql import Window as W

    lvl = df.groupBy("m_cents").agg(F.max("f").alias("fmax"))
    prev = F.max("fmax").over(
        W.orderBy(F.col("m_cents").desc()).rowsBetween(W.unboundedPreceding, -1)
    )
    sweep = sorted(
        _rows(
            lvl.withColumn("p", prev)
            .filter(F.col("p").isNull() | (F.col("fmax") > F.col("p")))
            .select("m_cents", "fmax")
        )
    )
    assert sweep == brute


def test_weighted_median_hand_case(spark):
    # values 10(w1) 20(w2) 30(w1): total 4, half 2 -> cum at 20 is 3 -> 20
    df = spark.createDataFrame(
        [("A", 10, 1, 1, 1), ("A", 20, 2, 1, 2), ("A", 30, 1, 1, 3)],
        "l_returnflag string, price_cents long, qty long, "
        "l_orderkey long, l_linenumber int",
    )
    from pyspark.sql import Window as W

    wcum = W.partitionBy("l_returnflag").orderBy(
        "price_cents", "l_orderkey", "l_linenumber"
    )
    staged = df.select(
        "l_returnflag",
        "price_cents",
        F.sum("qty").over(wcum).alias("cum"),
        F.sum("qty").over(W.partitionBy("l_returnflag")).alias("tot"),
    )
    med = (
        staged.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("price_cents").alias("m"))
        .collect()[0]["m"]
    )
    assert med == 20


def test_hierarchy_rollup_ancestors(spark):
    from ctgov_ai_etl_spark.functions.exact import fdiv

    keys = [3, 17, 170, 1234]
    df = spark.createDataFrame([(k,) for k in keys], "c_custkey long")
    anc = df.select(
        "c_custkey",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.lit(7)),
                    lambda i: fdiv(
                        F.col("c_custkey"), F.pow(F.lit(10), i).cast("long")
                    ),
                )
            )
        ).alias("node"),
    )
    got = {(r["c_custkey"], r["node"]) for r in anc.collect()}
    exp = set()
    for k in keys:
        seen, v = set(), k
        for _ in range(8):
            if v not in seen:
                exp.add((k, v))
                seen.add(v)
            v //= 10
    assert got == exp


def test_cusum_matches_python_loop(spark):
    import random

    rng = random.Random(3)
    rows = [
        (u, i, i * 1000, rng.randint(-500, 900))
        for u in (1, 2)
        for i in range(25)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_us long, delta long"
    )
    per_key = df.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts_us", "event_id", "delta"))).alias("evs")
    )
    acc0 = F.struct(
        F.lit(0).cast("long").alias("s"),
        F.expr(
            "CAST(array() AS array<struct<event_id: bigint, s_micro: bigint>>)"
        ).alias("arr"),
    )

    def fold(acc, e):
        nxt = F.greatest(F.lit(0).cast("long"), acc.s + e.delta)
        return F.struct(
            nxt.alias("s"),
            F.concat(
                acc.arr,
                F.array(F.struct(e.event_id.alias("event_id"), nxt.alias("s_micro"))),
            ).alias("arr"),
        )

    got = {
        (r["user_id"], r["o"]["event_id"]): r["o"]["s_micro"]
        for r in per_key.select(
            "user_id", F.explode(F.aggregate("evs", acc0, fold).arr).alias("o")
        ).collect()
    }
    exp = {}
    for u in (1, 2):
        s = 0
        for uu, eid, _, delta in sorted(r for r in rows if r[0] == u):
            s = max(0, s + delta)
            exp[(u, eid)] = s
    assert got == exp


def test_ks_exact_reference(spark):
    import random

    rng = random.Random(9)
    a = [rng.randint(0, 50) for _ in range(80)]
    b = [rng.randint(10, 60) for _ in range(60)]
    grid = sorted(set(a) | set(b))
    n1, n2 = len(a), len(b)
    d_exp = max(
        abs(sum(1 for x in a if x <= v) * n2 - sum(1 for x in b if x <= v) * n1)
        for v in grid
    )
    from pyspark.sql import Window as W

    tagged = spark.createDataFrame(
        [(v, 0) for v in a] + [(v, 1) for v in b], "v long, side int"
    )
    g = tagged.groupBy("v").agg(
        F.count(F.when(F.col("side") == 0, 1)).alias("ca"),
        F.count(F.when(F.col("side") == 1, 1)).alias("cb"),
    )
    wc = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = g.select(
        F.sum("ca").over(wc).alias("cum_a"), F.sum("cb").over(wc).alias("cum_b")
    )
    d_got = cum.agg(
        F.max(F.abs(F.col("cum_a") * n2 - F.col("cum_b") * n1)).alias("d")
    ).collect()[0]["d"]
    assert d_got == d_exp


def test_km_survival_small_case(spark):
    """Hand-computed KM: 4 subjects, events at t=2 (1), t=5 (1),
    censored at t=3 and t=7.  S(2) = 3/4; S(5) = 3/4 * 1/2 = 3/8."""
    from ctgov_ai_etl_spark.queries.product import survival_km  # noqa: F401

    # replicate the fold on a synthetic subject frame
    subj = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 0), (3, 5, 1), (4, 7, 0)],
        "user_id long, dur_us long, observed int",
    )
    grid = subj.groupBy("dur_us").agg(
        F.sum("observed").cast("long").alias("d"),
        F.count("*").cast("long").alias("leaving"),
    )
    folded = grid.agg(
        F.array_sort(F.collect_list(F.struct("dur_us", "d", "leaving"))).alias("g"),
        F.sum("leaving").cast("long").alias("n_total"),
    )
    acc0 = F.struct(
        F.col("n_total").alias("n_risk"),
        F.lit(1.0).alias("s"),
        F.expr(
            "CAST(array() AS array<struct<dur_us: bigint, n_risk: bigint,"
            " n_events: bigint, survival: double>>)"
        ).alias("rows"),
    )

    def fold(acc, g):
        s_next = acc.s * (
            (acc.n_risk - g.d).cast("double") / acc.n_risk.cast("double")
        )
        emit = F.concat(
            acc.rows,
            F.when(
                g.d > 0,
                F.array(
                    F.struct(
                        g.dur_us.alias("dur_us"),
                        acc.n_risk.alias("n_risk"),
                        g.d.alias("n_events"),
                        F.round(s_next, 6).alias("survival"),
                    )
                ),
            ).otherwise(
                F.expr(
                    "CAST(array() AS array<struct<dur_us: bigint,"
                    " n_risk: bigint, n_events: bigint, survival: double>>)"
                )
            ),
        )
        return F.struct(
            (acc.n_risk - g.leaving).alias("n_risk"),
            s_next.alias("s"),
            emit.alias("rows"),
        )

    out = {
        r["r"]["dur_us"]: (r["r"]["n_risk"], r["r"]["survival"])
        for r in folded.select(
            F.explode(F.aggregate("g", acc0, fold).rows).alias("r")
        ).collect()
    }
    assert out == {2: (4, 0.75), 5: (2, 0.375)}


def test_sliding_distinct_window_bounds(spark):
    # events at 0s, 1800s, 3600s, 7300s: trailing hour is INCLUSIVE
    rows = [
        (1, 10, 0), (2, 20, 1_800_000_000),
        (3, 10, 3_600_000_000), (4, 30, 7_300_000_000),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long"
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    from pyspark.sql import Window as W

    w = (
        W.orderBy(F.unix_micros("ts")).rangeBetween(-3_600_000_000, 0)
    )
    got = {
        r["event_id"]: r["n"]
        for r in df.select(
            "event_id", F.size(F.collect_set("user_id").over(w)).alias("n")
        ).collect()
    }
    # e3 at 3600s still sees e1 at 0s (inclusive lower bound); e4 sees only itself
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}
