"""Multi-pass GROUPING SETS — the high-dimension rollup strategy.

Spark plans ROLLUP / CUBE / GROUPING SETS with an Expand node that
replicates EVERY input row once per grouping set before the shuffle
(SCALE.md relational table, rollup/cube row).  For ≤2 dims that's a
2–4× pre-shuffle inflation — acceptable.  For a 100 TB fact table and
a 4-set cube it means shuffling 400 TB, and the inflation happens
BEFORE partial aggregation can compress anything.

This module implements the classic alternative (Gray et al.'s "Data
Cube" two-phase strategy): aggregate ONCE to the finest cuboid (the
union of all grouping-set columns — one ordinary shuffle over data
whose partial-agg compression is intact), then derive every requested
grouping set by RE-aggregating that tiny cuboid, and union the
passes.  The re-agg passes touch |distinct(dims)| rows, not the fact
table, so total data movement is one fact shuffle + k cuboid shuffles
instead of one k-times-inflated fact shuffle.

Correct only for DISTRIBUTIVE aggregates (sum / count→sum-of-counts /
min / max — Gray's taxonomy); the measure declares its merge
function.  AVG is derivable as sum/count at finalize; COUNT DISTINCT
and exact percentiles are holistic and must use the Expand path —
:func:`grouping_sets_multipass` is the opt-in for the distributive
case, not a drop-in replacement.

NULL semantics match SQL GROUPING SETS: a dim value that is NULL in
the data stays a grouping key in the cuboid (groupBy keeps null
keys), and the subtotal rows' synthesized NULLs are distinguished by
the ``grouping_id`` bitmask exactly as Spark's ``grouping_id()``
computes it (bit i set ⇔ dims[i] aggregated away; dims[0] = MSB).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE: dict[str, Callable[[str], Column]] = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class Measure:
    """One distributive measure: ``base`` aggregates fact rows to the
    finest cuboid; ``merge`` ('sum' | 'min' | 'max') re-aggregates
    cuboid cells into coarser sets.  COUNT is declared as
    ``Measure('n', F.count('*').cast('long'), 'sum')`` — counts merge
    by summing; cells are counts of NON-EMPTY groups, never NULL, and
    an EMPTY input yields zero output rows (matching native Spark
    GROUPING SETS — see the empty-set groupBy(lit) note below)."""

    name: str
    base: Column
    merge: str


def grouping_sets_multipass(
    df: DataFrame,
    dims: list[str],
    sets: list[list[str]],
    measures: list[Measure],
) -> DataFrame:
    """GROUPING SETS over ``dims`` computed in multiple passes from
    one finest-cuboid aggregation (see module docstring for when this
    beats the native Expand plan).

    ``dims`` fixes the output column order and the ``grouping_id``
    bit positions; every column of every set must appear in it.
    Returns dims (NULL where aggregated away) + ``grouping_id`` +
    one column per measure.
    """
    if not sets:
        raise ValueError("grouping_sets_multipass requires >= 1 grouping set")
    for s in sets:
        unknown = [c for c in s if c not in dims]
        if unknown:
            raise ValueError(f"set columns {unknown} not in dims {dims}")
    for m in measures:
        if m.merge not in _MERGE:
            raise ValueError(
                f"measure {m.name!r}: merge must be one of {sorted(_MERGE)}"
            )

    mcols = [f"__m_{m.name}" for m in measures]
    # Pass 1: ONE ordinary aggregation over the fact table — partial
    # aggregation compresses map-side, no Expand inflation.
    cuboid = df.groupBy(*dims).agg(
        *[m.base.alias(c) for m, c in zip(measures, mcols)]
    )
    dim_types = dict(zip(cuboid.columns, [f.dataType for f in cuboid.schema.fields]))

    passes = []
    for s in sets:
        gid = sum(1 << (len(dims) - 1 - i) for i, d in enumerate(dims) if d not in s)
        agged = (
            cuboid.groupBy(*s).agg(
                *[
                    _MERGE[m.merge](c).alias(m.name)
                    for m, c in zip(measures, mcols)
                ]
            )
            if s
            # Empty grouping set: groupBy a literal, not a global
            # .agg().  A global aggregate over an EMPTY cuboid would
            # fabricate one grand-total row (NULL/0 measures) where
            # native GROUPING SETS (()) — whose Expand emits nothing
            # for empty input — produces ZERO rows.  Grouping on a
            # constant yields one group when non-empty and none when
            # empty, matching native exactly.  (Postgres/DuckDB
            # diverge from Spark here and DO emit a count-0 grand
            # total; this operator follows Spark.)
            else cuboid.groupBy(F.lit(1).alias("__gsm_one"))
            .agg(
                *[
                    _MERGE[m.merge](c).alias(m.name)
                    for m, c in zip(measures, mcols)
                ]
            )
            .drop("__gsm_one")
        )
        out_cols = [
            (F.col(d) if d in s else F.lit(None).cast(dim_types[d])).alias(d)
            for d in dims
        ]
        passes.append(
            agged.select(
                *out_cols,
                F.lit(gid).cast("long").alias("grouping_id"),
                *[F.col(m.name) for m in measures],
            )
        )
    return reduce(DataFrame.unionAll, passes)
