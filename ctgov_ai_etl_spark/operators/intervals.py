"""Interval / temporal-band joins and capped sessionization.

Spark plans a pure non-equi join condition (``lo <= ts AND ts < hi``)
as BroadcastNestedLoopJoin — O(|points| x |intervals|) comparisons and
a broadcast of one whole side, which is exactly the shape that dies
first at 100 TB (the reference has no interval operator at all; this
is the scale-path the engine adds for telemetry/attribution work).

:func:`interval_point_join` applies the classic *banding* rewrite
(the same idea as Databricks' range-join optimization and the binning
in spatial join literature): quantize time into fixed-width bins,
explode each interval into the bins it covers (``ceil(len/bin)+1``
rows — a small constant when bin width ~ interval width), equi-join
points on their single containing bin, then re-check the exact
predicate.  The join becomes a shuffled hash/sort-merge equi-join on
the bin key — partitionable, skew-handled by AQE, no nested loop, no
forced broadcast — at the price of a bounded row multiplication on
the (small) interval side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _idiv(c: Column, n: int) -> Column:
    """Exact floor-division of a non-negative bigint column by a
    positive int literal.  ``floor(c / n)`` in float can flip at exact
    multiples (1-ulp division error on ~1e15 micros); subtracting the
    pmod first makes the numerator an exact multiple, and IEEE
    division of exactly-representable operands with a representable
    true quotient is exact."""
    return ((c - F.pmod(c, F.lit(n))) / F.lit(n)).cast("bigint")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Join ``points`` to every interval with ``lo <= ts < hi`` via
    bin banding (module docstring).  Columns from both inputs ride
    along (names must not collide).  ``bin_seconds`` trades interval
    fan-out (``duration/bin + 1`` bin rows per interval) against join
    selectivity (bigger bins -> more same-bin false candidates killed
    by the exact re-check); set it near the typical interval length.

    ``extra_cond`` (e.g. same-tenant equality) is AND-ed into the
    exact re-check — add its columns to the join key upstream when
    they should prune candidates instead.

    Scale: one explode (bounded fan-out) + one equi-join shuffle on
    (bin).  Never a nested loop; never an implicit whole-side
    broadcast.  A 100 TB event table joins with shuffle partitioning
    on the bin key and AQE skew splitting handles hot bins (a flash
    sale minute), which BNLJ cannot.
    """
    # Exact integer MICROSECONDS (unix_micros / DuckDB epoch_us), not
    # unix_timestamp: second-truncation would mis-bin sub-second
    # boundaries and the exact re-check compares native timestamps
    # anyway.  Integer floor-div keeps the bin math exact.
    bin_us = int(bin_seconds) * 1_000_000
    lo_us = F.unix_micros(F.col(lo_col))
    hi_us = F.unix_micros(F.col(hi_col))
    # Bins covered by [lo, hi): floor(lo/b) .. floor((hi - 1us)/b).
    # Half-open on hi — an interval ending exactly on a bin edge does
    # not occupy the next bin.  Guard degenerate hi <= lo intervals
    # (empty — they match nothing and explode to nothing).
    bins = F.when(
        hi_us > lo_us,
        F.sequence(_idiv(lo_us, bin_us), _idiv(hi_us - 1, bin_us)),
    ).otherwise(F.array().cast("array<bigint>"))
    iv = intervals.withColumn("__bin", F.explode(bins))
    pt = points.withColumn(
        "__bin", _idiv(F.unix_micros(F.col(ts_col)), bin_us)
    )
    cond = (
        (pt["__bin"] == iv["__bin"])
        & (F.col(lo_col) <= F.col(ts_col))
        & (F.col(ts_col) < F.col(hi_col))
    )
    if extra_cond is not None:
        cond = cond & extra_cond
    # A point's single bin meets each interval's bin set at most once
    # (sequence values are distinct), so the equi-join cannot emit a
    # qualifying (point, interval) pair twice — no dedup pass needed.
    return pt.join(iv, cond).drop("__bin")


def capped_sessions(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    gap_seconds: int,
    cap_seconds: int,
) -> DataFrame:
    """Two-pass sessionization: inactivity-gap sessions (the
    ``session_window`` semantics) SPLIT into duration-capped
    sub-sessions — the telemetry convention ("a session ends after
    30 min idle OR 4 h elapsed") that native ``session_window``
    cannot express.

    Pass 1 — gaps-and-islands: ``is_new = gap exceeded or first
    event`` per key (one ``lag`` window), running sum -> session
    ordinal.  Pass 2 — within each session, sub-session =
    ``floor((ts - session_start)/cap)``: the cap anchors at the
    GAP-session start, so the split is a pure window expression (a
    rolling re-anchor would be sequential per key; this definition is
    the one that distributes, and the one fixed-horizon billing /
    timeout semantics actually use).

    Returns one row per event: key, ts, order col, ``session_id``
    (ordinal within key), ``subsession_id`` (cap slice within the
    session), ``sub_start`` (cap-slice anchor).  Both passes are
    windows over (key) — ONE shuffle total (same partitioning, Spark
    reuses the exchange), no driver state, no iteration; at 100 TB
    the only constraint is per-key row volume, same as any
    sessionizer.  Ties on ``ts`` are broken by ``order_col`` so the
    running sum is total-ordered and deterministic.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(key_col).orderBy(ts_col, order_col)
    # Exact integer microseconds (unix_micros / DuckDB epoch_us):
    # second-truncation would merge events straddling a gap boundary
    # by < 1 s and make the oracle unreplayable.
    ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    gap_us = int(gap_seconds) * 1_000_000
    is_new = (prev_us.isNull() | (ts_us > prev_us + gap_us)).cast("int")
    with_sess = events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("int"),
    )
    ws = W.partitionBy(key_col, "session_id")
    cap_us = int(cap_seconds) * 1_000_000
    start_us = F.min(F.unix_micros(F.col(ts_col))).over(ws)
    sub = _idiv(F.unix_micros(F.col(ts_col)) - start_us, cap_us).cast("int")
    return with_sess.select(
        key_col,
        ts_col,
        order_col,
        "session_id",
        sub.alias("subsession_id"),
        F.timestamp_micros(
            start_us + sub.cast("bigint") * cap_us
        ).alias("sub_start"),
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    lo_a: str,
    hi_a: str,
    lo_b: str,
    hi_b: str,
    bin_seconds: int,
) -> DataFrame:
    """INTERVAL x INTERVAL overlap join ([lo_a,hi_a) meets [lo_b,hi_b))
    via bin banding, emitting each qualifying pair EXACTLY ONCE with
    no dedup shuffle: both sides explode into the bins they cover,
    the equi-join matches on the shared bin, and the residual keeps a
    pair only in the FIRST bin both intervals cover — the bin of
    ``max(lo_a, lo_b)``, which any overlapping pair shares (overlap
    means ``max(lo) < min(hi)``, so the later-starting interval's
    first bin lies inside both).  Every other shared bin is filtered,
    so no ``dropDuplicates`` pass rides behind the join — the trick
    that keeps banding one-shuffle for interval-interval work.

    Column names across ``a`` and ``b`` must not collide (rename
    before calling).  Empty/inverted intervals (``hi <= lo``) are
    EMPTY SETS and match nothing — note the bare theta predicate
    ``lo_a < hi_b AND lo_b < hi_a`` would happily "overlap" an
    inverted interval astride the other side; callers replaying
    results in SQL must add the validity conjuncts.  Same scale story
    as :func:`interval_point_join`: bounded explode fan-out, shuffle
    equi-join on the bin key, no BroadcastNestedLoopJoin."""
    bin_us = int(bin_seconds) * 1_000_000

    def binned(df: DataFrame, lo: str, hi: str, side: str) -> DataFrame:
        lo_us = F.unix_micros(F.col(lo))
        hi_us = F.unix_micros(F.col(hi))
        bins = F.when(
            hi_us > lo_us,
            F.sequence(_idiv(lo_us, bin_us), _idiv(hi_us - 1, bin_us)),
        ).otherwise(F.array().cast("array<bigint>"))
        return df.withColumn(f"__bin_{side}", F.explode(bins))

    av = binned(a, lo_a, hi_a, "a")
    bv = binned(b, lo_b, hi_b, "b")
    first_shared = _idiv(
        F.greatest(
            F.unix_micros(F.col(lo_a)), F.unix_micros(F.col(lo_b))
        ),
        bin_us,
    )
    cond = (
        (av["__bin_a"] == bv["__bin_b"])
        & (F.col(lo_a) < F.col(hi_b))
        & (F.col(lo_b) < F.col(hi_a))
        & (av["__bin_a"] == first_shared)
    )
    return av.join(bv, cond).drop("__bin_a", "__bin_b")
