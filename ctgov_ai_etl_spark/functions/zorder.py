"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting a table by the Morton code of two (or more) columns before
writing gives every output file a bounded range in EVERY interleaved
dimension at once — the clustering trick behind Delta's OPTIMIZE
ZORDER BY: parquet min/max footer stats then prune files for
predicates on any clustered column, not just the sort-leading one.
At 100 TB this is the difference between a scan that touches every
file and one that touches the few files whose (custkey, date)
rectangle intersects the predicate.

The spread is 32 bits per dimension into a 64-bit Morton code —
wide enough for any TPC-H custkey (SF 30k ≈ 4.5e9 exceeds it only
past SF ~14k) and for epoch-days until the year 5,881,580.  Inputs
are REQUIRED to lie in ``[0, 2**31)``: that keeps both spreads and
the final ``y << 1`` inside non-negative BIGINT range, so the code
is order-preserving and bit-identical in Spark and DuckDB (no
engine-specific overflow semantics in play).  ``morton2`` enforces
the precondition with a per-row ``raise_error`` branch instead of
silently masking (the silent 16-bit mask this module used to apply
let out-of-range keys alias across z-buckets, breaking the min/max
rectangle property without any oracle-visible symptom).

The bit-spread is the classic mask ladder — pure integer shifts and
masks, so the Spark Column expression and the SQL mirror below are
bit-identical by construction (both are generated from the same
(shift, mask) table).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Largest admissible input value (exclusive bound): 31 usable bits
#: per dimension so the interleaved code stays within [0, 2**63).
MAX_INPUT: int = 1 << 31

# Spread 32 bits to the even positions of 64: after each (shift,
# mask) step the bits move apart by doubling gaps.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def spread_bits(col: Column) -> Column:
    """Spread the low 32 bits of ``col`` to even bit positions of a
    64-bit value.  Callers must pre-validate ``col ∈ [0, 2**31)``
    (see :func:`morton2`, which does)."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(x: Column, y: Column, *, check: bool = True) -> Column:
    """Morton code interleaving the low 32 bits of two columns:
    x bits land on even positions, y bits on odd.

    With ``check=True`` (default) an input outside ``[0, 2**31)``
    raises at execution time instead of silently aliasing into the
    wrong z-bucket.  Pass ``check=False`` only when the caller has
    already proven the bound (e.g. a constraint on the column).
    """
    z = spread_bits(x).bitwiseOR(F.shiftleft(spread_bits(y), 1))
    if not check:
        return z
    bad = (
        x.isNotNull()
        & y.isNotNull()
        & ((x.cast("long") < 0) | (x.cast("long") >= MAX_INPUT)
           | (y.cast("long") < 0) | (y.cast("long") >= MAX_INPUT))
    )
    return F.when(
        bad,
        F.raise_error(
            F.format_string(
                "morton2 input out of range [0, 2^31): x=%s y=%s",
                x.cast("string"), y.cast("string"),
            )
        ).cast("long"),
    ).otherwise(z)


def sql_spread_bits(expr: str) -> str:
    """DuckDB mirror of :func:`spread_bits` (same step table)."""
    x = f"(CAST({expr} AS BIGINT) & 4294967295)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def sql_morton2(x_expr: str, y_expr: str) -> str:
    """DuckDB mirror of :func:`morton2` (valid-input path; the range
    precondition is enforced on the Spark side)."""
    return f"({sql_spread_bits(x_expr)} | ({sql_spread_bits(y_expr)} << 1))"
