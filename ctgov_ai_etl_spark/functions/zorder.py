"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting a table by the Morton code of two (or more) columns before
writing gives every output file a bounded range in EVERY interleaved
dimension at once — the clustering trick behind Delta's OPTIMIZE
ZORDER BY: parquet min/max footer stats then prune files for
predicates on any clustered column, not just the sort-leading one.
At 100 TB this is the difference between a scan that touches every
file and one that touches the few files whose (custkey, date)
rectangle intersects the predicate.

The bit-spread is the classic mask ladder — pure integer shifts and
masks, so the Spark Column expression and the SQL mirror below are
bit-identical by construction (both are generated from the same
(shift, mask) table).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Spread 16 bits to the even positions of 32: after each (shift,
# mask) step the bits move apart by doubling gaps.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread_bits(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` to even bit positions."""
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def morton2(x: Column, y: Column) -> Column:
    """Morton code interleaving the low 16 bits of two columns:
    x bits land on even positions, y bits on odd."""
    return spread_bits(x).bitwiseOR(F.shiftleft(spread_bits(y), 1))


def sql_spread_bits(expr: str) -> str:
    """DuckDB mirror of :func:`spread_bits` (same step table)."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def sql_morton2(x_expr: str, y_expr: str) -> str:
    """DuckDB mirror of :func:`morton2`."""
    return f"({sql_spread_bits(x_expr)} | ({sql_spread_bits(y_expr)} << 1))"
