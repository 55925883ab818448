"""Hilbert-curve index for multi-dimensional data layout.

The Hilbert space-filling curve is the strictly-better sibling of the
Morton/Z-order interleave (``functions/zorder.py``): consecutive
curve positions are ALWAYS adjacent grid cells (unit Manhattan step,
no Z-shaped jumps), so sorting a table by Hilbert index before
writing gives output files tighter bounding rectangles per clustered
dimension than Z-order at the same file count — measurably better
parquet min/max pruning for range predicates at 100 TB (the reason
recent lakehouse OPTIMIZE implementations offer Hilbert clustering
alongside Z-order).

Implementation: the classic top-down quadrant walk (Hilbert 1891;
the bit formulation popularized by the Wikipedia ``xy2d`` routine)
reformulated with MASKED per-level coordinates so every intermediate
stays in ``[0, s)`` — no negative intermediates, no two's-complement
tricks, hence bit-identical integer arithmetic in Spark and DuckDB.
Per level ``s = 2^k`` (high bit first):

- quadrant bits ``rx = bit_k(x)``, ``ry = bit_k(y)``
- ``d += s*s * q`` where ``q`` = 0/1/3/2 for (rx,ry) =
  (0,0)/(0,1)/(1,0)/(1,1) — the Gray-code quadrant order
- recurse into the sub-square with the quadrant's frame rotation:
  ry=1 keeps (x', y'); ry=0, rx=0 swaps; ry=0, rx=1 reflects both
  (``s-1-y'``, ``s-1-x'``), where x', y' are the masked low bits.

Both engines evaluate the SAME level chain: the Spark side as one
``select`` per level (alias-per-level keeps Catalyst from inlining
the CASE trees into an exponentially-substituted single projection),
the DuckDB side as a generated CTE chain with identical arithmetic.
Differential tests pin the Spark form against a direct Python port
of the canonical routine and against the curve axioms (bijectivity,
unit-step adjacency) on full grids.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quad(rx: Column, ry: Column) -> Column:
    # (3*rx) XOR ry over bits, as a branch table: 0,1 / 3,2
    return (
        F.when((rx == 0) & (ry == 0), F.lit(0))
        .when((rx == 0) & (ry == 1), F.lit(1))
        .when((rx == 1) & (ry == 0), F.lit(3))
        .otherwise(F.lit(2))
        .cast("long")
    )


def with_hilbert_d2(
    df: DataFrame,
    x: Column,
    y: Column,
    order: int,
    out_col: str = "hd",
) -> DataFrame:
    """Append the Hilbert index of ``(x % 2^order, y % 2^order)`` as
    ``out_col`` (a BIGINT in ``[0, 4^order)``), one narrow projection
    per level — ``order`` levels of pure codegen CASE/shift algebra,
    zero shuffles, zero Python."""
    n = 1 << order
    df = df.withColumns(
        {
            "__hx": x.cast("long").bitwiseAND(F.lit(n - 1)),
            "__hy": y.cast("long").bitwiseAND(F.lit(n - 1)),
            "__hd": F.lit(0).cast("long"),
        }
    )
    for lvl in range(order - 1, -1, -1):
        s = 1 << lvl
        hx, hy, hd = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = F.shiftright(hx, lvl).bitwiseAND(F.lit(1))
        ry = F.shiftright(hy, lvl).bitwiseAND(F.lit(1))
        lx = hx.bitwiseAND(F.lit(s - 1))
        ly = hy.bitwiseAND(F.lit(s - 1))
        new_x = F.when(ry == 1, lx).when(rx == 1, F.lit(s - 1) - ly).otherwise(ly)
        new_y = F.when(ry == 1, ly).when(rx == 1, F.lit(s - 1) - lx).otherwise(lx)
        df = df.withColumns(
            {
                "__hd": (hd + F.lit(s) * F.lit(s) * _quad(rx, ry)).cast("long"),
                "__hx": new_x.cast("long"),
                "__hy": new_y.cast("long"),
            }
        )
    return df.withColumnRenamed("__hd", out_col).drop("__hx", "__hy")


def sql_hilbert_cte(
    source_sql: str,
    x_expr: str,
    y_expr: str,
    order: int,
    carried: list[str],
    final_select: str,
) -> str:
    """DuckDB mirror of :func:`with_hilbert_d2` as a generated CTE
    chain: ``source_sql`` provides the input relation, ``carried``
    names the columns to thread through every level, ``final_select``
    is the closing SELECT (may reference ``hd`` plus the carried
    columns via the final CTE ``hfin``)."""
    n = 1 << order
    cols = ", ".join(carried)
    parts = [
        f"h{order} AS (SELECT {cols},"
        f" CAST(({x_expr}) AS BIGINT) & {n - 1} AS hx,"
        f" CAST(({y_expr}) AS BIGINT) & {n - 1} AS hy,"
        f" CAST(0 AS BIGINT) AS hd FROM ({source_sql}))"
    ]
    for lvl in range(order - 1, -1, -1):
        s = 1 << lvl
        rx = f"((hx >> {lvl}) & 1)"
        ry = f"((hy >> {lvl}) & 1)"
        lx = f"(hx & {s - 1})"
        ly = f"(hy & {s - 1})"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0"
            f" WHEN {rx} = 0 AND {ry} = 1 THEN 1"
            f" WHEN {rx} = 1 AND {ry} = 0 THEN 3"
            f" ELSE 2 END)"
        )
        new_x = (
            f"(CASE WHEN {ry} = 1 THEN {lx}"
            f" WHEN {rx} = 1 THEN {s - 1} - {ly}"
            f" ELSE {ly} END)"
        )
        new_y = (
            f"(CASE WHEN {ry} = 1 THEN {ly}"
            f" WHEN {rx} = 1 THEN {s - 1} - {lx}"
            f" ELSE {lx} END)"
        )
        parts.append(
            f"h{lvl} AS (SELECT {cols},"
            f" CAST({new_x} AS BIGINT) AS hx,"
            f" CAST({new_y} AS BIGINT) AS hy,"
            f" CAST(hd + {s * s} * {quad} AS BIGINT) AS hd"
            f" FROM h{lvl + 1})"
        )
    parts.append(f"hfin AS (SELECT {cols}, hd FROM h0)")
    return "WITH " + ",\n    ".join(parts) + f"\n    {final_select}"
