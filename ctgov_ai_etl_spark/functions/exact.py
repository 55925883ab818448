"""Exact (order-independent) numeric aggregation helpers.

Floating-point sums are order-dependent: Spark accumulates per
partition in whatever order the shuffle delivers, DuckDB in its own
order, so ``sum(double)`` differs in the last bits between engines —
and between two Spark runs.  For money-like measures the engine
instead aggregates exact integer cents (round half-away-from-zero is
identical in Spark and DuckDB for non-tie doubles) and divides once
at the end, giving bit-identical, run-stable results at any scale and
any partitioning.  This is also the semantically honest treatment of
currency.

SQL-side mirror for the DuckDB oracle::

    CAST(SUM(CAST(round(x * 100) AS BIGINT)) AS DOUBLE) / 100
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a money column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def sum_money(col: Column | str) -> Column:
    """Order-independent SUM over a money column, as double dollars."""
    return (F.sum(cents(col)).cast("double") / F.lit(100)).cast("double")


def avg_money(col: Column | str) -> Column:
    """Order-independent AVG over a money column, as double dollars."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(cents(c)).cast("double") / (F.count(c) * 100)).cast("double")


def sql_sum_money(expr: str) -> str:
    """DuckDB mirror of :func:`sum_money`."""
    return f"CAST(SUM(CAST(round(({expr}) * 100) AS BIGINT)) AS DOUBLE) / 100"


def sql_avg_money(expr: str) -> str:
    """DuckDB mirror of :func:`avg_money`."""
    return (
        f"CAST(SUM(CAST(round(({expr}) * 100) AS BIGINT)) AS DOUBLE)"
        f" / (COUNT({expr}) * 100)"
    )


def fdiv(a: Column, b: Column | int) -> Column:
    """Exact integer FLOOR division over the FULL int64 range, ANY
    sign of either operand.

    ``a - r`` with ``r = ((a % b) + b) % b`` (the sign-of-divisor
    remainder — Python's ``%``) is the exact int64 multiple of ``b``
    below-or-at ``a/b``, so the quotient is a true floor for every
    sign combination.  (The previous ``pmod`` form floored only for
    positive divisors: Spark's pmod is always NON-NEGATIVE, so for
    b < 0 it truncated toward zero while the DuckDB mirror floored —
    a latent cross-engine trap caught by the tri-engine differential
    test; no catalog call site ever passes b < 0, so no result
    changed.)  The final division runs in DECIMAL, not double — a
    double division is only exact while the multiple stays under
    2^53, and ppm numerators like ``cents * 1_000_000`` blow past
    that at sf0.1 already (the agg_ratio_to_report ±1 incident).
    The decimal quotient of an exact multiple has zero fraction, so
    its scale rounding can never flip the integer.

    Overflow discipline: the sign-of-divisor remainder is built by
    adding ``b`` to ``a % b`` ONLY when the truncated remainder is
    nonzero and opposite-signed to ``b`` — that branch can never
    overflow (the operands have opposite signs), unlike the
    unconditional ``((a % b) + b) % b`` double-mod, whose inner add
    blows int64 whenever ``|a % b + b| > 2^63 - 1`` (any ``|b| >
    2^62`` with same-signed operands: ARITHMETIC_OVERFLOW under ANSI,
    silently wrong without).  The multiple ``a - r`` is formed in
    DECIMAL so ``a`` at int64 min minus a positive remainder cannot
    wrap either.  The one unrepresentable combination is
    ``fdiv(-2^63, -1)`` = 2^63, which exceeds int64 itself — the
    long cast overflows there by necessity, matching DuckDB's own
    BIGINT cast failure."""
    bb = F.lit(b) if isinstance(b, int) else b
    m = a % bb
    r = F.when(
        (m != F.lit(0)) & ((m < F.lit(0)) != (bb < F.lit(0))), m + bb
    ).otherwise(m)
    mult = a.cast("decimal(38,0)") - r
    return (mult / bb.cast("decimal(38,0)")).cast("long")


def sql_fdiv(a: str, b: str) -> str:
    """DuckDB mirror of :func:`fdiv` — pmod-subtraction then INTEGER
    division of the exact multiple.  Three traps this form dodges:
    (1) DuckDB ``//`` alone truncates toward zero on negative
    dividends while pmod-subtraction floors (the dq_l_diversity
    negative-balance incident); (2) DuckDB ``/`` on integers is
    DOUBLE division — inexact past 2^53 exactly like the Spark double
    path (the agg_ratio_to_report sf0.1 incident), so the multiple is
    divided with ``//`` (exact on an exact multiple, any sign);
    (3) the final CAST keeps a HUGEINT-widened window-sum divisor out
    of the result schema (the r8 seq_transition_matrix / dq_benford
    driver failures).  DuckDB ``%`` follows the dividend's sign; the
    conditional ``+ b`` (only when the truncated remainder is nonzero
    and opposite-signed to ``b``) normalizes it to the sign-of-divisor
    remainder without the double-mod's int64 add overflow — mirroring
    the Spark form's overflow discipline exactly."""
    bb = f"CAST(({b}) AS BIGINT)"
    m = f"(({a}) % {bb})"
    pm = (
        f"(CASE WHEN {m} <> 0 AND ({m} < 0) <> ({bb} < 0)"
        f" THEN {m} + {bb} ELSE {m} END)"
    )
    return (
        f"CAST((CAST(({a}) AS HUGEINT) - ({pm}))"
        f" // CAST({bb} AS HUGEINT) AS BIGINT)"
    )
