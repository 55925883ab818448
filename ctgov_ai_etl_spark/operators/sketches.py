"""Mergeable frequency / set-cardinality sketches with portable hashes.

Two sketches a 100 TB pipeline keeps *instead of* exact state:

- **Count-min** (Cormode & Muthukrishnan '05): a depth x width grid of
  counters; est(x) = min over rows of cell(h_r(x)).  Counters are
  additive, so per-partition (or per-day) sketches merge by cell-wise
  sum — the pre-aggregate/merge-at-read pattern.  Always
  over-estimates, never under.
- **KMV / theta** (Beyer et al. '07; Dasgupta et al. theta sketches):
  the K smallest hash values of a distinct set.  theta = K-th smallest
  normalized hash; |S|_est = (K-1)/theta.  Sketches of A and B answer
  UNION (K smallest of the merged sample) *and* INTERSECTION
  (union-sketch members present in both sides x union estimate) —
  the set-algebra HLL cannot do.

Both use the engine-portable md5 hash (operators/limits.hash_bucket
convention), so a DuckDB oracle replays the ESTIMATES bit-for-bit —
a stronger contract than the (exact, bound-held) one used for the
opaque HLL sketches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 uniform bits; fits int64 with headroom.
_HASH_SPACE = float(1 << 60)


def portable_hash60(c: Column, salt: str | None = None) -> Column:
    """Uniform 60-bit integer hash of ``c`` (as string), byte-identical
    across engines: ``conv(substr(md5(x), 1, 15), 16, 10)``.  DuckDB
    mirror: ``CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)``."""
    s = c.cast("string")
    if salt is not None:
        s = F.concat(F.lit(salt), F.lit(":"), s)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def _cms_cells(df: DataFrame, item_col: str, depth: int, width: int) -> DataFrame:
    """One row per (item occurrence, seed) with its sketch cell: the
    SINGLE definition of the cell-hash convention (md5 of
    ``seed:item`` mod width) — build and estimate must agree on it
    byte-for-byte, so neither inlines its own copy."""
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    return df.select(F.col(item_col).alias("item")).select(
        "item", F.explode(seeds).alias("seed")
    ).select(
        "item",
        "seed",
        F.pmod(
            portable_hash60(
                F.concat(
                    F.col("seed").cast("string"), F.lit(":"), F.col("item")
                )
            ),
            F.lit(width),
        ).cast("int").alias("bucket"),
    )


def cms_build(
    items: DataFrame, item_col: str, depth: int, width: int
) -> DataFrame:
    """Build a count-min sketch over one occurrence row per item:
    returns (seed, bucket, cnt) — at most ``depth * width`` rows.

    Row r's hash is the portable md5 of ``r:item`` mod width.  The
    build is explode-by-depth (bounded x``depth`` fan-out) + ONE
    partially-aggregated groupBy on (seed, bucket) — cardinality
    ``depth * width`` regardless of corpus size, so the shuffle
    reduces 100 TB of occurrences to a few thousand cells and
    per-partition partial aggregation does almost all of it map-side.
    Cell-wise SUM of two builds is the sketch of the concatenated
    corpora (mergeability is what makes it a sketch)."""
    return (
        _cms_cells(items, item_col, depth, width)
        .groupBy("seed", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str, depth: int, width: int
) -> DataFrame:
    """Estimate each probe item's frequency from a :func:`cms_build`
    sketch: min over the ``depth`` cells the item hashes to.  Returns
    (item, est).  The sketch is tiny (``depth * width`` rows) — the
    join broadcasts, so estimation is a map-side lookup however large
    the probe set is.  Absent cells read 0 (an item never inserted)."""
    cells = _cms_cells(probes, item_col, depth, width)
    return (
        cells.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def kmv_sketch(keys: DataFrame, key_col: str, k: int) -> DataFrame:
    """K smallest DISTINCT portable hashes of ``key_col`` — the KMV
    sketch as a K-row DataFrame (column ``h``).  distinct -> sort ->
    limit K plans as partial-distinct + TakeOrderedAndProject: every
    partition forwards at most K candidates, so the driver never sees
    more than partitions x K rows however large the key set is."""
    return (
        keys.select(portable_hash60(F.col(key_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_union_intersection(
    a: DataFrame, b: DataFrame, k: int
) -> DataFrame:
    """Theta-sketch set algebra from two :func:`kmv_sketch` frames:
    one row with ``est_union`` = (K-1)/theta (theta = K-th smallest
    normalized hash of the merged sample) and ``est_inter`` =
    (|union-sketch members in BOTH inputs| / K) x est_union.

    Everything operates on <= 2K hash rows — the whole computation is
    a driver-scale epilogue to whatever distinct-key shuffles built
    the sketches; at 100 TB the sketches are what you persist per
    shard and merge at query time."""
    u = (
        a.select("h")
        .unionByName(b.select("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    theta = u.agg(
        (F.max("h").cast("double") / F.lit(_HASH_SPACE)).alias("theta"),
        F.count("*").cast("long").alias("k_eff"),
    )
    in_both = (
        u.join(a.select(F.col("h").alias("ha")), u["h"] == F.col("ha"), "left")
        .join(b.select(F.col("h").alias("hb")), u["h"] == F.col("hb"), "left")
        .agg(
            F.sum(
                (F.col("ha").isNotNull() & F.col("hb").isNotNull()).cast("long")
            ).alias("n_both")
        )
    )
    # Exact mode: when the merged distinct sample has fewer than K
    # values the sketch IS the set — the estimator degenerates to the
    # exact count (standard KMV small-set handling).
    est_union = F.when(
        F.col("k_eff") < k, F.col("k_eff").cast("double")
    ).otherwise((F.col("k_eff") - 1).cast("double") / F.col("theta"))
    return theta.crossJoin(in_both).select(
        F.col("k_eff"),
        F.round(est_union, 6).alias("est_union"),
        F.col("n_both"),
        F.round(
            F.col("n_both").cast("double") / F.col("k_eff") * est_union, 6
        ).alias("est_inter"),
    )


def hll_registers(
    keys: DataFrame,
    key_col: str,
    group_col: str,
    m: int = 64,
    hash_bits: int = 48,
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. '07), exact and
    mergeable: per (group, bucket) the MAX leading-zero rank rho of a
    portable 48-bit md5 hash — ``bucket`` is the hash's first byte mod
    ``m``, ``rho = hash_bits - bit_length(rest) + 1`` (zero hash ->
    ``hash_bits + 1``), computed engine-portably as
    ``(hash_bits + 1) - length(bin(rest))`` since both Spark and
    DuckDB render ``bin()`` without leading zeros (and ``bin(0)`` as
    the 1-char '0', which the CASE folds to the same sentinel).

    Registers ARE the sketch: per-shard register tables merge by
    cell-wise MAX (the HLL union), and the estimator
    ``alpha_m * m^2 / sum(2^-M_j)`` is a client-side fold over the m
    rows — kept OUT of the frame so every emitted value is an exact
    integer the SQL oracle replays bit-for-bit (IEEE division order
    would otherwise leak in).  Scale: one partial-aggregated shuffle
    keyed (group, bucket) — at most |groups| * m cells regardless of
    input size; the map side collapses everything else.

    Parameter domain (validated): ``bucket = first-hash-byte % m`` is
    uniform only when 256 % m == 0, and ``rest`` takes exactly
    hash_bits//4 hex chars, so hash_bits must be a multiple of 4 and
    fit a signed 64-bit ``conv`` (<= 60 bits).  Out-of-domain values
    would yield a silently biased or truncated sketch — rejected here
    instead."""
    if m < 2 or 256 % m != 0:
        raise ValueError(
            f"hll_registers: m={m} must divide 256 (bucket = first hash "
            "byte % m is only uniform then)"
        )
    if hash_bits % 4 != 0 or not (4 <= hash_bits <= 60):
        raise ValueError(
            f"hll_registers: hash_bits={hash_bits} must be a multiple of 4 "
            "in [4, 60] (hex-substring width and signed-64 conv range)"
        )
    hx = F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string")))
    bucket = (
        F.conv(F.substring(hx, 1, 2), 16, 10).cast("int") % m
    ).alias("bucket")
    rest = F.conv(F.substring(hx, 3, hash_bits // 4), 16, 10).cast("long")
    rho = (
        F.when(rest == 0, F.lit(hash_bits + 1))
        .otherwise(F.lit(hash_bits + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    return (
        keys.select(F.col(group_col).alias("grp"), bucket, rho.alias("rho"))
        .groupBy("grp", "bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )
