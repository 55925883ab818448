"""Declarative data-quality expectations (the Deequ/Great-Expectations
operator class): validate a table against a rule set and get one row
per rule — violations, total, pass/fail — as a DataFrame.

A 100 TB ingest pipeline gates every load on checks like these; the
engine-shaped question is COST, and the answer here is one pass:
every row-local rule (not-null, accepted-values, range, regex,
uniqueness-by-count) folds into a SINGLE aggregation over the table —
conditional sums with map-side partial aggregation, no per-rule scans
— and only referential rules (foreign key exists in a dimension) add
a broadcast anti-join probe each, counted in the same result union.
Rules are pure expressions, so the whole report is one lazy plan:
Catalyst prunes the scan to exactly the referenced columns.

Uniqueness note: ``violations = count(col) - count(distinct col)``
(rows beyond the first per duplicated value).  count_distinct rides
the same aggregate; several uniqueness rules in one suite plan one
Expand pass per distinct-counted column — the standard Spark shape.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation.  ``kind`` ∈ {not_null, unique, accepted_values,
    in_range, regex_match, referential}; ``params`` carries the
    kind-specific arguments (values=list, lo/hi, pattern,
    ref=DataFrame + ref_col=str)."""

    name: str
    kind: str
    col: str
    params: dict[str, Any] = field(default_factory=dict)


_ROW_LOCAL = {"not_null", "unique", "accepted_values", "in_range", "regex_match"}


def _violation_expr(rule: Rule) -> Column:
    c = F.col(rule.col)
    if rule.kind == "not_null":
        return F.sum(F.when(c.isNull(), 1).otherwise(0)).cast("long")
    if rule.kind == "unique":
        return (F.count(c) - F.countDistinct(c)).cast("long")
    if rule.kind == "accepted_values":
        vals = rule.params["values"]
        bad = (~c.isin(vals)) | c.isNull()
        return F.sum(F.when(bad, 1).otherwise(0)).cast("long")
    if rule.kind == "in_range":
        lo, hi = rule.params["lo"], rule.params["hi"]
        bad = c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi))
        return F.sum(F.when(bad, 1).otherwise(0)).cast("long")
    if rule.kind == "regex_match":
        pat = rule.params["pattern"]
        bad = c.isNull() | ~c.rlike(pat)
        return F.sum(F.when(bad, 1).otherwise(0)).cast("long")
    raise ValueError(f"unknown row-local rule kind: {rule.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run every rule against ``df``; returns (rule, kind, column,
    violations, total, passed) with one row per rule, rule order
    preserved via the rule name (sort on it for a stable report).

    Row-local rules share ONE aggregation job.  ``referential`` rules
    (params: ref=DataFrame, ref_col=str) each count the rows whose
    ``col`` has no match in the reference column — a broadcast
    left-anti join per rule (NULLs count as violations, matching FK
    semantics where the key is also required)."""
    if not rules:
        raise ValueError("validate requires >= 1 rule")
    known = _ROW_LOCAL | {"referential"}
    for r in rules:
        if r.kind not in known:
            raise ValueError(f"rule {r.name!r}: unknown kind {r.kind!r}")

    local = [r for r in rules if r.kind in _ROW_LOCAL]
    refs = [r for r in rules if r.kind == "referential"]

    parts: list[DataFrame] = []
    if local:
        aggs = [F.count(F.lit(1)).cast("long").alias("__total")] + [
            _violation_expr(r).alias(f"__v_{i}") for i, r in enumerate(local)
        ]
        wide = df.agg(*aggs)
        rows = F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.lit(r.kind).alias("kind"),
                    F.lit(r.col).alias("column"),
                    F.col(f"__v_{i}").alias("violations"),
                )
                for i, r in enumerate(local)
            ]
        )
        parts.append(
            wide.select(F.explode(rows).alias("r"), F.col("__total").alias("total"))
            .select("r.rule", "r.kind", "r.column", "r.violations", "total")
        )
    for r in refs:
        ref, ref_col = r.params["ref"], r.params["ref_col"]
        keys = F.broadcast(
            ref.select(F.col(ref_col).alias(r.col)).dropDuplicates([r.col])
        )
        probe = df.select(r.col)
        miss = probe.join(keys, r.col, "left_anti")
        parts.append(
            miss.agg(F.count(F.lit(1)).cast("long").alias("violations"))
            .crossJoin(
                F.broadcast(df.agg(F.count(F.lit(1)).cast("long").alias("total")))
            )
            .select(
                F.lit(r.name).alias("rule"),
                F.lit(r.kind).alias("kind"),
                F.lit(r.col).alias("column"),
                "violations",
                "total",
            )
        )
    out = reduce(DataFrame.unionAll, parts)
    return out.withColumn("passed", F.col("violations") == 0)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile (the Deequ profiler analog): for each
    requested column — total rows, null count, exact distinct count,
    and min/max rendered as strings (uniform report schema across
    numeric / string / timestamp columns).

    Everything folds into a SINGLE aggregation over the table: counts
    and min/max partially aggregate map-side; each exact
    count-distinct adds one Expand pass (the standard Spark shape —
    swap in approx_count_distinct at the call site when 2% error is
    acceptable at 100 TB).  The scan prunes to exactly ``cols``."""
    if not cols:
        raise ValueError("profile_columns requires >= 1 column")
    from ctgov_ai_etl_spark.operators.limits import spread_to_parallelism

    # Prune to the profiled columns FIRST (the scan reads only them),
    # then spread a single-file scan: each exact count-distinct adds
    # an Expand pass, so the map side chews len(cols)+1 copies of
    # every row BEFORE the first exchange — on the one-row-group
    # bench layout that all ran on one core (measured 3.7 s for 3
    # lineitem columns at sf0.1; guide §2).  No-op at scale where the
    # layout already provides the parallelism.
    df = spread_to_parallelism(df.select(*cols))
    aggs = [F.count(F.lit(1)).cast("long").alias("__total")]
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nulls_{i}"),
            F.countDistinct(col).cast("long").alias(f"__nd_{i}"),
            F.min(col).cast("string").alias(f"__min_{i}"),
            F.max(col).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nulls_{i}").alias("nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                F.col(f"__min_{i}").alias("min_value"),
                F.col(f"__max_{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return wide.select(
        F.explode(rows).alias("r"), F.col("__total").alias("total")
    ).select(
        "r.column", "total", "r.nulls", "r.n_distinct",
        "r.min_value", "r.max_value",
    )
