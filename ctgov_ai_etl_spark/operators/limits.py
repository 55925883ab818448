"""Deterministic positional splits (reference R8/R9).

The reference slices the in-memory list positionally
(``studies[:max_rows]`` / ``studies[max_rows:]``,
/root/reference/etl.py:355-364) and splits on a tuning-ID set
(etl.py:366-378).  Positional semantics are meaningless on a
distributed collection without an order, so the engine requires an
explicit ordering column (SURVEY.md §7 'positional limit') and uses a
window rank — one shuffle, then both halves derive from the same
ranked frame (Spark reuses the exchange, so this is NOT two jobs).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RANK_COL = "__pos"


def deterministic_split(
    df: DataFrame, n: int, order_cols: Iterable[str]
) -> tuple[DataFrame, DataFrame]:
    """(head, remainder) of the first ``n`` rows under ``order_cols``.

    The remainder is KEPT, matching the reference's pass-through of
    unprocessed rows (etl.py:364, 411-414) — a cost governor, not a
    filter.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    ranked = df.withColumn(_RANK_COL, F.row_number().over(w))
    head = ranked.filter(F.col(_RANK_COL) <= n).drop(_RANK_COL)
    rest = ranked.filter(F.col(_RANK_COL) > n).drop(_RANK_COL)
    return head, rest


def id_set_split(
    df: DataFrame, id_col: str, ids: Iterable[str]
) -> tuple[DataFrame, DataFrame]:
    """(members, complement) of ``id_col ∈ ids`` (reference R9's
    tuning-trial split, etl.py:366-378).

    For a config-sized set an ``isin`` literal predicate is optimal
    (pushes to the scan); at data scale you'd join a broadcast ids
    DataFrame instead — both are semi/anti semantics.
    """
    ids = list(ids)
    member = F.col(id_col).isin(ids)
    return df.filter(member), df.filter(~member)
