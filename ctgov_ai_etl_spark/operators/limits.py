"""Deterministic positional splits (reference R8/R9).

The reference slices the in-memory list positionally
(``studies[:max_rows]`` / ``studies[max_rows:]``,
/root/reference/etl.py:355-364) and splits on a tuning-ID set
(etl.py:366-378).  Positional semantics are meaningless on a
distributed collection without an order, so the engine requires an
explicit ordering column (SURVEY.md §7 'positional limit').

Scale note: the naive formulation — ``row_number()`` over an
unpartitioned window — funnels every row through ONE reducer.  This
module instead computes the global rank in two parallel phases
(range-partition on the order key → per-partition local rank → add
per-partition row-count offsets), the standard distributed ranking
layout.  The only driver-side data is one (partition_id, count) row
per partition.
"""

from __future__ import annotations

import os
from collections.abc import Iterable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ctgov_ai_etl_spark.operators.cache import track

_RANK_COL = "__pos"
_PID_COL = "__pid"

#: Bounded driver tier for the distributed rank (read at CALL time,
#: like the CC and stream-shuffle knobs): when the rank frame fits
#: under this many rows, ONE bounded probe + a Python sort + a
#: broadcast (key → __pos) map replaces the three fixed job barriers
#: of the distributed tier (range-boundary sampling, per-partition
#: offset counts, the persist-pinned rank itself) — measured ~1-3 s of
#: pure scheduling per use at sf0.1 (the same observation that
#: motivated the r15 vocabulary driver tier, operators/dedup.py).
#: Corpus-scale rank frames at 100 TB blow the cap on the probe and
#: fall through to the distributed tier byte-identically.  0 disables.
_RANK_DRIVER_CAP_DEFAULT = 20_000

#: Key types the driver tier may sort: Python's tuple sort must equal
#: Spark's multi-column ASC order.  Integral types trivially agree;
#: str agrees because UTF-8 unsigned-byte order == code-point order.
#: Floats/timestamps/decimals are EXCLUDED (NaN totalordering and tz
#: pitfalls) — those keys take the distributed tier.
_RANK_DRIVER_KEY_TYPES = (
    T.StringType,
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.BooleanType,
)


def _rank_driver_cap() -> int:
    return int(
        os.environ.get(
            "SPARK_GRAFT_RANK_DRIVER_CAP", str(_RANK_DRIVER_CAP_DEFAULT)
        )
    )


def global_rank(df: DataFrame, order_cols: Iterable[str]) -> DataFrame:
    """``df`` plus a 1-based global rank column ``__pos`` under
    ``order_cols``; see :func:`global_rank_with_count`."""
    return global_rank_with_count(df, order_cols)[0]


def global_rank_with_count(
    df: DataFrame, order_cols: Iterable[str]
) -> tuple[DataFrame, int]:
    """``df`` plus a 1-based global rank column ``__pos`` under
    ``order_cols`` (which should be a unique key — with ties the rank
    of tied rows is partitioning-dependent, exactly as it is for an
    unpartitioned window), and the total row count — free, since the
    offset pass already counts every partition; callers that need
    both (e.g. dictionary encoding sized by the vocabulary) save a
    whole job over a separate ``.count()``.

    No single-reducer stage: range-partition by the key (parallel
    sample + shuffle), rank locally per partition, then shift each
    partition's ranks by the total row count of the partitions before
    it.  The offsets come from a tiny (num_partitions)-row aggregate
    collected to the driver.

    The ranged frame is persisted (memory-and-disk) before the counts
    collect: ``repartitionByRange`` samples its boundaries per
    execution, so without a materialization barrier the counts job and
    the downstream ranking job could range-partition rows differently
    once boundary sampling is partial at scale, and the collected
    offsets would no longer describe the partitioning the ranks are
    computed on (duplicate/skipped global ranks).  The persist pins ONE
    partitioning for both jobs; the blocks are released to LRU — at
    most one extra pass of ``df`` on disk, the price of a
    deterministic distributed rank.
    """
    spark = df.sparkSession
    cols = [F.col(c) for c in order_cols]
    order_cols = list(order_cols)
    cap = _rank_driver_cap()
    if cap > 0 and all(
        isinstance(df.schema[c].dataType, _RANK_DRIVER_KEY_TYPES)
        for c in order_cols
    ):
        # Pin the rank input FIRST: the distributed tier's ranged
        # persist also served as the cache multi-traversal consumers
        # (e.g. both SNM self-join sides) relied on — dropping it
        # regressed dedup_snm_multipass 2.5 → 6.1 s before this pin.
        # The probe doubles as the cache fill.
        df = track(df.persist(StorageLevel.MEMORY_AND_DISK))
        # Bounded probe: limit() short-circuits the scan, and only the
        # NARROW key projection ships — an over-cap frame costs one
        # truncated pass, then takes the distributed tier.
        probe = df.select(*order_cols).limit(cap + 1).collect()
        if len(probe) <= cap:
            keys = [tuple(r) for r in probe]
            # The driver order is valid only for unique, non-null keys
            # (the documented contract anyway: with ties the rank is
            # partitioning-dependent; NULL ordering differs between
            # Python and the window).  Anything else → distributed.
            if len(set(keys)) == len(keys) and all(
                v is not None for k in keys for v in k
            ):
                order = sorted(keys)
                pos_schema = T.StructType(
                    [df.schema[c] for c in order_cols]
                    + [T.StructField(_RANK_COL, T.LongType(), False)]
                )
                pos_df = spark.createDataFrame(
                    [k + (i + 1,) for i, k in enumerate(order)], pos_schema
                )
                ranked = df.join(F.broadcast(pos_df), on=order_cols).select(
                    *df.columns, _RANK_COL
                )
                return ranked, len(keys)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = track(
        df.repartitionByRange(nparts, *cols)
        .withColumn(_PID_COL, F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r[_PID_COL]: r["cnt"]
        for r in ranged.groupBy(_PID_COL).agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for pid in range(nparts):
        offsets.append((pid, acc))
        acc += counts.get(pid, 0)
    off_df = spark.createDataFrame(offsets, f"{_PID_COL} int, __off long")
    w = Window.partitionBy(_PID_COL).orderBy(*cols)
    ranked = (
        ranged.join(F.broadcast(off_df), _PID_COL)
        .withColumn(_RANK_COL, F.row_number().over(w).cast("long") + F.col("__off"))
        .drop(_PID_COL, "__off")
    )
    return ranked, acc


def deterministic_split(
    df: DataFrame, n: int, order_cols: Iterable[str]
) -> tuple[DataFrame, DataFrame]:
    """(head, remainder) of the first ``n`` rows under ``order_cols``.

    The remainder is KEPT, matching the reference's pass-through of
    unprocessed rows (etl.py:364, 411-414) — a cost governor, not a
    filter.  Both halves derive from the same ranked frame; cache the
    input if recomputing its lineage is expensive (the split itself
    adds one counts job plus the rank shuffles, all parallel).
    """
    order_cols = list(order_cols)
    ranked = global_rank(df, order_cols)
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


def hash_bucket(key: "F.Column", n_buckets: int = 10_000) -> "F.Column":
    """Deterministic uniform bucket in [0, n_buckets) from the md5 of
    ``key``.  md5 (unlike xxhash64) is byte-identical across engines
    and languages, so a sampling decision is reproducible by any
    downstream system — and it depends only on the row's key: stable
    under repartitioning, cluster resizes, and re-runs, which
    ``df.sample`` (partition-seeded RNG) is not.  8 hex chars = 32
    uniform bits, ample for any practical rate resolution."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 0.0,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash
    bucket falls below its stratum's rate — how a training pipeline
    rebalances by language/source/quality tier.  The fractions table
    rides in as a broadcast dimension join (no shuffle of the fact
    side; the filter stays map-side), strata absent from ``fractions``
    default to ``default``.  Exactly reproducible: same rows survive
    on any cluster, any partitioning, any engine that can compute md5.
    """
    spark = df.sparkSession
    frac_df = spark.createDataFrame(
        [(k, float(v)) for k, v in fractions.items()],
        f"{strata_col} string, __frac double",
    )
    return (
        df.join(F.broadcast(frac_df), strata_col, "left")
        .withColumn("__frac", F.coalesce("__frac", F.lit(float(default))))
        .filter(hash_bucket(F.col(key_col), n_buckets) < F.col("__frac") * n_buckets)
        .select(*df.columns)
    )


def mixture_fractions(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    out_rows: int,
) -> dict[str, float]:
    """Per-stratum acceptance rates that steer the sampled output
    toward the target mixture ``weights`` at ~``out_rows`` total:
    rate_s = min(1, w_s * out_rows / n_s).  Strata too small to supply
    their share saturate at 1.0 (their deficit is NOT redistributed —
    deterministic and engine-replayable beats exactly-sized here).
    The per-stratum counts are a bounded driver scalar collect
    (|strata| rows), the same convention as IVF centroid training.
    """
    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    return {
        s: min(1.0, w * out_rows / counts[s])
        for s, w in weights.items()
        if s in counts and counts[s] > 0
    }


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    out_rows: int,
    key_col: str,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic domain-mixing sampler: resample a corpus so the
    output approximates a target stratum mixture (e.g. rebalancing
    languages or sources for a training run).  Composition of
    ``mixture_fractions`` + ``stratified_sample``: one tiny count agg,
    then a broadcast-joined map-side md5-bucket filter — the fact side
    is never shuffled, and the same rows survive on any cluster or
    engine (see ``hash_bucket``)."""
    fracs = mixture_fractions(df, strata_col, weights, out_rows)
    return stratified_sample(
        df, strata_col, fracs, key_col, default=0.0, n_buckets=n_buckets
    )


def _md5_priority(key: "F.Column", salt: str) -> "F.Column":
    """Per-row sampling priority: the md5 hex digest of key+salt.
    Byte-identical across engines (lowercase hex in both Spark and
    DuckDB), so the selected set is replayable anywhere; a new salt
    is a fresh independent draw."""
    return F.md5(F.concat(key.cast("string"), F.lit(salt)))


def reservoir_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    salt: str = "",
    n_hint: int | None = None,
    margin: int = 8,
) -> DataFrame:
    """Distributed fixed-size uniform sample without replacement —
    the reservoir-sampling contract ("exactly k rows, each subset
    equally likely") implemented as bottom-k by deterministic md5
    priority instead of the sequential Vitter algorithm, which has no
    parallel formulation worth running.

    Selection is a pure function of (row key, salt): stable under
    repartitioning, re-runs, and engine choice (the SQL oracle is
    ``ORDER BY md5(key), key LIMIT k``).  Spark plans the
    ``orderBy(priority).limit(k)`` as TakeOrderedAndProject —
    per-partition bottom-k, then a k·P-row driver merge — so no full
    sort and no single-reducer shuffle ever happens.

    For very large k·P, pass ``n_hint`` (approximate input rows): a
    map-side prefilter keeps only rows whose 32-bit priority prefix
    falls under ``margin·k/n`` of the hash space — ~margin·k
    survivors — before the exact bottom-k.  The prefilter is a prefix
    of the SAME ordering, so it only changes the answer if fewer than
    k of the true bottom-k survive; with margin 8 that needs the
    binomial(n, 8k/n) mass below k — vanishing for any real n (and
    the identity is regression-tested against the unfiltered path).
    """
    pri = _md5_priority(F.col(key_col), salt)
    work = df.withColumn("__pri", pri)
    if n_hint is not None and n_hint > margin * k:
        cutoff = min(2**32, (2**32 * margin * k) // n_hint + 1)
        work = work.filter(
            F.conv(F.substring("__pri", 1, 8), 16, 10).cast("long") < cutoff
        )
    return work.orderBy("__pri", key_col).limit(k).drop("__pri")


def weighted_reservoir_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    weight_col: str,
    salt: str = "",
) -> DataFrame:
    """Weighted reservoir sample (Efraimidis–Spirakis A-ES): each row
    draws a deterministic uniform u from its md5 and competes with
    priority u^(1/w) — take the k largest, so a row's inclusion
    probability scales with its weight.  Computed in log space
    (ln(u)/w, exact same ordering) to dodge underflow on large
    weights.  Same TakeOrderedAndProject shape as
    :func:`reservoir_sample`; weights must be > 0 (guarded with
    raise_error so bad rows fail loudly, not sample silently)."""
    u = (
        F.conv(F.substring(_md5_priority(F.col(key_col), salt), 1, 8), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(2**32) + 2.0)  # u ∈ (0, 1): never ln(0)
    w = F.col(weight_col).cast("double")
    checked_w = F.when(w > 0, w).otherwise(
        F.raise_error(F.concat(F.lit("non-positive weight for key "), F.col(key_col)))
    )
    pri = F.log(u) / checked_w  # maximize u^(1/w) ⇔ maximize ln(u)/w
    return (
        df.withColumn("__pri", pri)
        .orderBy(F.desc("__pri"), F.col(key_col))
        .limit(k)
        .drop("__pri")
    )


def temperature_weights(
    df: DataFrame,
    strata_col: str,
    strata: list[str],
    alpha: float = 0.5,
) -> dict[str, float]:
    """Temperature-scaled mixture weights w_s = n_s^α / Σ n^α — the
    standard multilingual/domain rebalancing rule (XLM-R α=0.3-0.7,
    mT5): α < 1 flattens the natural distribution, upsampling tail
    strata without a hand-written target mixture.

    Engine-replayability contract: the denominator sums in the FIXED
    order of ``strata`` (missing strata contribute 0.0), so a SQL
    replay writing the same explicit sum gets the identical double.
    α = 0.5 (the default) evaluates as sqrt — correctly rounded per
    IEEE in every engine, hence bit-replayable; other α go through
    pow, whose cross-engine determinism is not guaranteed (fine for
    production, not for a hash-checked oracle).  Counts are one
    |strata|-row driver collect, same convention as
    :func:`mixture_fractions`."""
    import math

    counts = {
        r[strata_col]: r["n"]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }
    powed = {
        s: (math.sqrt(counts.get(s, 0)) if alpha == 0.5
            else float(counts.get(s, 0)) ** alpha)
        for s in strata
    }
    denom = 0.0
    for s in strata:  # FIXED summation order — the replay contract
        denom += powed[s]
    return {s: powed[s] / denom for s in strata if counts.get(s, 0) > 0}


def spread_to_parallelism(
    df: DataFrame, expected_partitions: int | None = None
) -> DataFrame:
    """Round-robin repartition to cluster parallelism IFF the input
    plans fewer partitions.  Compute-heavy per-row stages (signature
    folds, shingling, hash ladders) are CPU-bound, and a small parquet
    input (one row group) otherwise runs them all on ONE core — at
    sf0.1 the 5k-doc corpus is a single split, and spreading it took
    minhash signature generation 8.8 → 3.0 s warm.  At real scale the
    scan already has ≥ parallelism splits and this is a NO-OP (no
    shuffle added); identical repartition subtrees across plan
    branches collapse to one exchange via ReuseExchange.

    Callers that already know their input's partition count pass it as
    ``expected_partitions`` and skip the probe entirely.  Otherwise the
    count is read via the JVM DataFrame's RDD handle — no Python-side
    RDD wrapper (``df.rdd``) is materialized, avoiding the per-call
    Python RDD conversion the previous implementation paid."""
    par = df.sparkSession.sparkContext.defaultParallelism
    n = (
        expected_partitions
        if expected_partitions is not None
        else df._jdf.rdd().getNumPartitions()
    )
    if n < par:
        return df.repartition(par)
    return df


def uniform_hash_rank(
    df: DataFrame,
    hash_col: str,
    tie_cols: Iterable[str],
) -> tuple[DataFrame, int]:
    """1-based global rank ``__pos`` under ``(hash_col, *tie_cols)``
    where ``hash_col`` is a UNIFORM hex hash (md5 and friends) — the
    cheap sibling of :func:`global_rank_with_count`.

    The general distributed rank must SAMPLE the key distribution to
    place range boundaries (repartitionByRange: a sampling job, a
    persist to pin the partitioning, an offsets job).  A uniform hash
    key needs none of that: its most-significant hex prefix IS a
    balanced range partitioner whose boundaries are known a priori.
    Bucket = first two hex chars — the count is FIXED at 256 (the
    prefix width determines it; a configurable count that didn't also
    change the prefix would silently drop rows at the offsets join).
    Rank locally per bucket (one window over the bucket shuffle —
    prefix order is most-significant, so bucket boundaries align with
    the global order), shift by the cumulative counts of lower
    buckets (one 256-row aggregate collected to the driver and
    broadcast back).  TWO jobs total, no sampling, no
    skew risk beyond hash uniformity itself.

    The bucketed frame is persisted (memory-and-disk) before the
    counts collect, mirroring :func:`global_rank_with_count`: the
    counts job and the ranking window are SEPARATE jobs, and a
    nondeterministic upstream (sample / limit / first-wins dedup)
    recomputed between them would make the offsets disagree with the
    window counts — duplicate or gapped ranks.  The persist pins one
    row set across both jobs.

    Returns (df + ``__pos``, total row count — free from the offsets
    collect).  Ranks are exact and deterministic: ties under the full
    ``(hash, *ties)`` ordering must not exist (pass a unique key)."""
    from ctgov_ai_etl_spark.operators.cache import track

    n_buckets = 256  # 2 hex chars; see docstring
    b = F.conv(F.substring(F.col(hash_col), 1, 2), 16, 10).cast("int")
    # track() registers the pin so long-lived sessions (repeated
    # catalog sweeps) can drop it at their barrier via release_all()
    # instead of accumulating MEMORY_AND_DISK blocks (ADVICE r9).
    bucketed = track(
        df.withColumn("__b", b).persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["__b"]: r["cnt"]
        for r in bucketed.groupBy("__b").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = [], 0
    for i in range(n_buckets):
        offsets.append((i, acc))
        acc += counts.get(i, 0)
    off_df = df.sparkSession.createDataFrame(
        offsets, "__b int, __off long"
    )
    w = Window.partitionBy("__b").orderBy(hash_col, *tie_cols)
    return (
        bucketed.join(F.broadcast(off_df), "__b")
        .withColumn("__pos", F.row_number().over(w) + F.col("__off"))
        .drop("__b", "__off")
    ), acc
