"""Round-11 wave: progressive-JPEG decode, geospatial operators,
robust/rank statistics, privacy t-closeness, isotonic calibration,
time-series motif discovery, and priority-based weighted sampling.

Exactness follows the repo conventions (functions/exact.py): money in
integer cents, ratios in integer ppm via exact floor division,
coordinates in integer micro-degrees, md5 for any cross-engine hash,
doubled integers for exact medians, and pairwise/minimax operators
replayed as bounded joins on calendar- or slice-sized frames.

Reference parity: the reference (etl.py) is a REST text ETL with none
of these; they belong to the SURVEY §2.3 training-data mandate
(multimodal decode, curation, analytics at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.functions.exact import cents, fdiv, sql_fdiv
from ctgov_ai_etl_spark.operators.sketches import portable_hash60
from ctgov_ai_etl_spark.queries.registry import query
from ctgov_ai_etl_spark.tables import load_table

_US_PER_DAY = 86_400_000_000


# ----------------------------------------------------- geospatial
#
# The tables carry no coordinates, so points derive deterministically
# from md5 (portable_hash60 == DuckDB's ('0x'||substr(md5..))::BIGINT)
# in integer MICRO-DEGREES — the exactness convention for coordinates:
# lat in [-90e6, 90e6), lng in [-180e6, 180e6), all cell math exact
# integer floor division on the shifted non-negative domain.

_GEO_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash5_expr(lat_cell: str, lng_cell: str) -> str:
    """Standard 5-character geohash from 12-bit lat / 13-bit lng cell
    ids, as ONE SQL expression string parsed identically by Spark SQL
    and DuckDB (only `>>`, `&`, `*`, `+`, substr, `||` — constants
    keep every shift in 0..24 so engine shift-wrap semantics never
    diverge).  Geohash interleaves bits lng-first, MSB-first
    (public algorithm; en.wikipedia.org/wiki/Geohash)."""
    terms = []
    for i in range(25):  # bit position i (MSB first) of the 25-bit code
        if i % 2 == 0:
            src, bit = lng_cell, 12 - i // 2
        else:
            src, bit = lat_cell, 11 - (i - 1) // 2
        terms.append(f"(({src} >> {bit}) & 1) * {1 << (24 - i)}")
    gi = "(" + " + ".join(terms) + ")"
    chars = [
        f"substr('{_GEO_ALPHABET}', (({gi} >> {5 * (4 - c)}) & 31) + 1, 1)"
        for c in range(5)
    ]
    return " || ".join(chars)


_GEO_PTS_SQL = """
      SELECT c_custkey AS k,
             CAST(('0x' || substring(md5('lat:' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 180000000 - 90000000 AS lat,
             CAST(('0x' || substring(md5('lng:' || CAST(c_custkey AS VARCHAR)), 1, 15))
                  AS BIGINT) % 360000000 - 180000000 AS lng,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
"""


def _geo_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    lat = (
        F.pmod(
            portable_hash60(F.col("c_custkey"), salt="lat"),
            F.lit(180_000_000),
        )
        - 90_000_000
    )
    lng = (
        F.pmod(
            portable_hash60(F.col("c_custkey"), salt="lng"),
            F.lit(360_000_000),
        )
        - 180_000_000
    )
    return c.select(
        F.col("c_custkey").alias("k"),
        lat.alias("lat"),
        lng.alias("lng"),
        cents("c_acctbal").alias("bal_cents"),
    )


@query(
    "geo_grid_rollup",
    oracle=f"""
    WITH pts AS ({_GEO_PTS_SQL}),
    cells AS (
      SELECT k, bal_cents,
             {sql_fdiv('(lat + 90000000) * 4096', '180000000')} AS lat_cell,
             {sql_fdiv('(lng + 180000000) * 8192', '360000000')} AS lng_cell
      FROM pts
    ),
    gh AS (
      SELECT k, bal_cents,
             {_geohash5_expr('lat_cell', 'lng_cell')} AS geohash5
      FROM cells
    )
    SELECT CAST(lvl AS INT) AS zoom,
           substr(geohash5, 1, lvl) AS cell,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(bal_cents) AS BIGINT) AS bal_cents
    FROM gh CROSS JOIN (SELECT unnest([1, 2, 3]) AS lvl)
    GROUP BY lvl, substr(geohash5, 1, lvl)
    HAVING count(*) > 1
    """,
)
def geo_grid_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical geospatial rollup on GEOHASH prefixes: encode
    every point to a 5-char geohash (pure integer bit-interleave +
    base32 — the SAME generated SQL expression runs on both engines,
    so the encoding is identical by construction), then aggregate
    point count + balance at zoom levels 1-3 via prefix truncation —
    the tile-pyramid pattern every map dashboard needs.  One explode
    (3x fanout) + one partial-aggregated shuffle on the prefix; the
    geohash itself is map-side scalar math, no UDF, no shuffle.
    Prefix aggregation scales to 100 TB because coarser zooms are
    strict prefixes of finer ones — a single pass serves the whole
    pyramid."""
    pts = _geo_points(spark, sf_dir)
    cells = pts.select(
        "k",
        "bal_cents",
        fdiv((F.col("lat") + 90_000_000) * 4096, F.lit(180_000_000)).alias(
            "lat_cell"
        ),
        fdiv((F.col("lng") + 180_000_000) * 8192, F.lit(360_000_000)).alias(
            "lng_cell"
        ),
    )
    gh = cells.select(
        "bal_cents",
        F.expr(_geohash5_expr("lat_cell", "lng_cell")).alias("geohash5"),
    )
    lvls = F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("lvl")
    return (
        gh.select("bal_cents", "geohash5", lvls)
        .groupBy(
            F.col("lvl").cast("int").alias("zoom"),
            F.expr("substr(geohash5, 1, lvl)").alias("cell"),
        )
        .agg(
            F.count("*").cast("long").alias("n_points"),
            F.sum("bal_cents").cast("long").alias("bal_cents"),
        )
        .filter(F.col("n_points") > 1)
    )


_GEO_EPS = 2_000_000  # 2-degree Chebyshev radius, micro-degrees


@query(
    "geo_geohash_join",
    oracle=f"""
    WITH pts AS ({_GEO_PTS_SQL}),
    capped AS (SELECT * FROM pts WHERE k <= 2000)
    SELECT a.k AS a, b.k AS b,
           CAST(greatest(abs(a.lat - b.lat), abs(a.lng - b.lng))
                AS BIGINT) AS cheb_micro
    FROM capped a JOIN capped b
      ON a.k < b.k
     AND b.lat BETWEEN a.lat - {_GEO_EPS} AND a.lat + {_GEO_EPS}
     AND b.lng BETWEEN a.lng - {_GEO_EPS} AND a.lng + {_GEO_EPS}
    """,
)
def geo_geohash_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial epsilon-join (all point pairs within a 2-degree
    Chebyshev radius) via GRID BUCKETING, the scalable spatial-join
    pattern: each point lands in one eps-sized cell; the LEFT side
    fans out to its 3x3 cell neighborhood (explode, 9x) and the join
    is a plain EQUALITY shuffle join on the cell id — no cross join
    anywhere — followed by the exact integer distance filter.  Each
    qualifying pair matches in EXACTLY one bucket (the right point's
    home cell), so no dedup pass is needed.  The oracle replays the
    predicate declaratively (DuckDB's IEJoin); the engine's plan is
    the one that survives 100 TB — shuffle on cell keys, fanout
    bounded at 9x, skew bounded by eps-cell density.  The k-cap
    keeps the sampled slice driver-comparable; the plan is
    cap-independent."""
    pts = _geo_points(spark, sf_dir).filter(F.col("k") <= 2000)
    cell_y = fdiv(F.col("lat") + 90_000_000, F.lit(_GEO_EPS))
    cell_x = fdiv(F.col("lng") + 180_000_000, F.lit(_GEO_EPS))
    right = pts.select(
        F.col("k").alias("b_k"),
        F.col("lat").alias("b_lat"),
        F.col("lng").alias("b_lng"),
        cell_y.alias("cy"),
        cell_x.alias("cx"),
    )
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    ).alias("o")
    left = pts.select(
        F.col("k").alias("a_k"),
        F.col("lat").alias("a_lat"),
        F.col("lng").alias("a_lng"),
        cell_y.alias("ay"),
        cell_x.alias("ax"),
        offs,
    ).select(
        "a_k",
        "a_lat",
        "a_lng",
        (F.col("ay") + F.col("o.dy")).alias("cy"),
        (F.col("ax") + F.col("o.dx")).alias("cx"),
    )
    pairs = left.join(right, ["cy", "cx"]).filter(
        (F.col("a_k") < F.col("b_k"))
        & (F.abs(F.col("a_lat") - F.col("b_lat")) <= _GEO_EPS)
        & (F.abs(F.col("a_lng") - F.col("b_lng")) <= _GEO_EPS)
    )
    return pairs.select(
        F.col("a_k").alias("a"),
        F.col("b_k").alias("b"),
        F.greatest(
            F.abs(F.col("a_lat") - F.col("b_lat")),
            F.abs(F.col("a_lng") - F.col("b_lng")),
        )
        .cast("long")
        .alias("cheb_micro"),
    )


@query(
    "geo_fence_transitions",
    oracle="""
    WITH pos AS (
      SELECT user_id, event_id, ts,
             CAST(('0x' || substring(md5('tx:' || CAST(user_id AS VARCHAR)
                     || ':' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR)),
                     1, 15)) AS BIGINT) % 16 AS tile_x,
             CAST(('0x' || substring(md5('ty:' || CAST(user_id AS VARCHAR)
                     || ':' || CAST(epoch_us(ts) // 86400000000 AS VARCHAR)),
                     1, 15)) AS BIGINT) % 16 AS tile_y
      FROM events WHERE ts IS NOT NULL
    ),
    seq AS (
      SELECT user_id, event_id, ts,
             tile_x * 16 + tile_y AS tile,
             lag(tile_x * 16 + tile_y) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_tile
      FROM pos
    )
    SELECT user_id, event_id,
           CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           CAST(prev_tile AS INT) AS from_tile,
           CAST(tile AS INT) AS to_tile
    FROM seq
    WHERE prev_tile IS NOT NULL AND prev_tile <> tile
    """,
)
def geo_fence_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofence transition detection: each user's daily position
    (md5-derived 16x16 tile — users dwell in one tile per day, so
    transitions cluster at day boundaries) is compared with the
    previous event's tile via lag() and a boundary-crossing event is
    emitted whenever the tile changes — the enter/exit stream a
    location-alerting pipeline needs.  One window shuffle on user_id
    with the (ts, event_id) unique ordering; everything else is
    map-side scalar math.  At 100 TB this is the same shape as
    sessionization: per-key ordered state, no global sort."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    day = fdiv(F.unix_micros("ts"), F.lit(_US_PER_DAY)).cast("string")
    key = F.concat(F.col("user_id").cast("string"), F.lit(":"), day)
    tile = (
        F.pmod(portable_hash60(key, salt="tx"), F.lit(16)) * 16
        + F.pmod(portable_hash60(key, salt="ty"), F.lit(16))
    ).alias("tile")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_id", "ts", tile).select(
        "user_id",
        "event_id",
        "ts",
        "tile",
        F.lag("tile").over(w).alias("prev_tile"),
    )
    return seq.filter(
        F.col("prev_tile").isNotNull() & (F.col("prev_tile") != F.col("tile"))
    ).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("prev_tile").cast("int").alias("from_tile"),
        F.col("tile").cast("int").alias("to_tile"),
    )


# ------------------------------------- rank / robust statistics
#
# Both operators run on the DAILY order frame — calendar-sized
# (~2,400 rows at any SF), so the O(days^2) pair stage is
# SF-INDEPENDENT: the data-scale pass is the one groupBy producing
# the daily aggregates; everything after is bounded.

_DAILY_ORDERS_SQL = """
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders
      GROUP BY 1
"""


def _daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        fdiv(F.unix_micros("o_orderdate"), F.lit(_US_PER_DAY)).alias("day")
    ).agg(
        F.count("*").cast("long").alias("x"),
        F.sum(cents("o_totalprice")).cast("long").alias("y"),
    )


@query(
    "stat_kendall_tau",
    oracle=f"""
    WITH d AS ({_DAILY_ORDERS_SQL}),
    pairs AS (
      SELECT CASE WHEN (a.x < b.x AND a.y < b.y)
                    OR (a.x > b.x AND a.y > b.y) THEN 1 ELSE 0 END AS c,
             CASE WHEN (a.x < b.x AND a.y > b.y)
                    OR (a.x > b.x AND a.y < b.y) THEN 1 ELSE 0 END AS dd,
             CASE WHEN a.x = b.x THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y THEN 1 ELSE 0 END AS ty
      FROM d a JOIN d b ON a.day < b.day
    ),
    s AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_c, CAST(sum(dd) AS BIGINT) AS n_d,
             CAST(sum(tx) AS BIGINT) AS ties_x,
             CAST(sum(ty) AS BIGINT) AS ties_y,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs
    )
    SELECT n_pairs, n_c, n_d, ties_x, ties_y,
           round((CAST(n_c AS DOUBLE) - n_d)
                 / sqrt((CAST(n_pairs AS DOUBLE) - ties_x)
                        * (CAST(n_pairs AS DOUBLE) - ties_y)), 6) AS tau_b
    FROM s
    """,
)
def stat_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b rank correlation between daily order count and
    daily revenue — the robust, outlier-immune sibling of the exact
    Pearson screen (agg_corr_exact): concordant/discordant/tied pair
    counts are EXACT INTEGERS from a self-join of the daily frame,
    and tau enters one shared double expression (sqrt is IEEE
    correctly-rounded, so both engines agree bit-for-bit — unlike
    log/exp, which the repo never compares).  The pair join is
    calendar-bounded (~2,400 days -> ~2.9M pairs REGARDLESS of SF):
    the only data-scale pass is the daily groupBy."""
    d = _daily_orders(spark, sf_dir)
    a, b = d.alias("a"), d.alias("b")
    ax, bx = F.col("a.x"), F.col("b.x")
    ay, by = F.col("a.y"), F.col("b.y")
    pairs = a.join(F.broadcast(b), F.col("a.day") < F.col("b.day")).select(
        F.when(((ax < bx) & (ay < by)) | ((ax > bx) & (ay > by)), 1)
        .otherwise(0)
        .alias("c"),
        F.when(((ax < bx) & (ay > by)) | ((ax > bx) & (ay < by)), 1)
        .otherwise(0)
        .alias("dd"),
        F.when(ax == bx, 1).otherwise(0).alias("tx"),
        F.when(ay == by, 1).otherwise(0).alias("ty"),
    )
    s = pairs.agg(
        F.sum("c").cast("long").alias("n_c"),
        F.sum("dd").cast("long").alias("n_d"),
        F.sum("tx").cast("long").alias("ties_x"),
        F.sum("ty").cast("long").alias("ties_y"),
        F.count("*").cast("long").alias("n_pairs"),
    )
    tau = F.round(
        (F.col("n_c").cast("double") - F.col("n_d"))
        / F.sqrt(
            (F.col("n_pairs").cast("double") - F.col("ties_x"))
            * (F.col("n_pairs").cast("double") - F.col("ties_y"))
        ),
        6,
    )
    return s.select(
        "n_pairs", "n_c", "n_d", "ties_x", "ties_y", tau.alias("tau_b")
    )


_WEEKLY_ORDERS_SQL = """
      SELECT CAST(epoch_us(o_orderdate) // 604800000000 AS BIGINT) AS wk,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders
      GROUP BY 1
"""


@query(
    "stat_theil_sen",
    oracle=f"""
    WITH d AS ({_WEEKLY_ORDERS_SQL}),
    slopes AS (
      SELECT {sql_fdiv('(b.y - a.y) * 1000000', '(b.wk - a.wk)')}
               AS slope_ppm
      FROM d a JOIN d b ON a.wk < b.wk
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(quantile_cont(slope_ppm * 2, 0.5) AS BIGINT)
             AS median_slope_ppm_x2,
           CAST(min(slope_ppm) AS BIGINT) AS min_slope_ppm,
           CAST(max(slope_ppm) AS BIGINT) AS max_slope_ppm
    FROM slopes
    """,
)
def stat_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator for daily revenue: the median
    of all pairwise slopes, immune to outlier days where least
    squares (ml_linear_regression_exact) is not.  Slopes are
    quantized to exact integer micro-units per week via floor
    division (fdiv — identical on both engines), and the median
    follows the doubled-integer convention (percentile of 2*slope is
    an exactly-representable integer even at even pair counts).  The
    frame is WEEKLY (~345 weeks -> ~59k pairs): the exact-percentile
    median is a single-reducer sort, so the daily frame's 2.9M pairs
    billed 12 s at sf0.1 for identical evidence (r11 bench); the
    data-scale pass is the weekly groupBy.  Kendall (stat_kendall_tau)
    keeps the daily frame — its pair stage aggregates map-side."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        fdiv(F.unix_micros("o_orderdate"), F.lit(7 * _US_PER_DAY)).alias(
            "wk"
        )
    ).agg(F.sum(cents("o_totalprice")).cast("long").alias("y"))
    a, b = d.alias("a"), d.alias("b")
    slopes = a.join(F.broadcast(b), F.col("a.wk") < F.col("b.wk")).select(
        fdiv(
            (F.col("b.y") - F.col("a.y")) * 1_000_000,
            F.col("b.wk") - F.col("a.wk"),
        ).alias("slope_ppm")
    )
    return slopes.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.percentile(F.col("slope_ppm") * 2, F.lit(0.5))
        .cast("long")
        .alias("median_slope_ppm_x2"),
        F.min("slope_ppm").cast("long").alias("min_slope_ppm"),
        F.max("slope_ppm").cast("long").alias("max_slope_ppm"),
    )


# ----------------------------------------------- privacy: t-closeness


@query(
    "dq_t_closeness",
    oracle="""
    WITH tagged AS (
      SELECT c_nationkey, c_mktsegment,
             (CAST(round(c_acctbal * 100) AS BIGINT) + 100000) // 100000
               AS band
      FROM customer
    ),
    gdist AS (
      SELECT band, CAST(count(*) AS BIGINT) AS gn FROM tagged GROUP BY band
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT band) AS BIGINT) AS m FROM tagged),
    grp AS (
      SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS ng
      FROM tagged GROUP BY c_nationkey, c_mktsegment
    ),
    cellcnt AS (
      SELECT c_nationkey, c_mktsegment, band,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tagged GROUP BY c_nationkey, c_mktsegment, band
    ),
    dense AS (
      SELECT g.c_nationkey, g.c_mktsegment, g.ng, b.band, b.gn,
             coalesce(c.cnt, 0) AS cnt
      FROM grp g CROSS JOIN gdist b
      LEFT JOIN cellcnt c
        ON c.c_nationkey = g.c_nationkey
       AND c.c_mktsegment = g.c_mktsegment AND c.band = b.band
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, ng, band,
             sum(CAST(cnt AS HUGEINT) * (SELECT n FROM tot)
                 - CAST(gn AS HUGEINT) * ng) OVER
               (PARTITION BY c_nationkey, c_mktsegment
                ORDER BY band
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM dense
    )
    SELECT c_nationkey, c_mktsegment, CAST(max(ng) AS BIGINT) AS group_size,
           round(CAST(sum(abs(c)) AS DOUBLE)
                 / (CAST(max(ng) AS DOUBLE) * (SELECT n FROM tot)
                    * ((SELECT m FROM tot) - 1)), 6) AS t_emd,
           round(CAST(sum(abs(c)) AS DOUBLE)
                 / (CAST(max(ng) AS DOUBLE) * (SELECT n FROM tot)
                    * ((SELECT m FROM tot) - 1)), 6) > 0.2 AS at_risk
    FROM cum GROUP BY c_nationkey, c_mktsegment
    """,
)
def dq_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — completes the privacy trio
    (dq_k_anonymity, dq_l_diversity): a QI group leaks when the
    DISTRIBUTION of its ordered sensitive attribute (balance band)
    strays from the global distribution, measured by the earth-mover
    distance, which for an ordered attribute is the mean |cumulative
    difference| (Li et al., ICDE'07).  The per-band deviation is the
    EXACT integer cross product cnt*N - gn*ng (no per-cell float
    probabilities); one double division at the very end.  Frames:
    one data-scale groupBy to band counts, then everything runs on
    the |groups| x |bands| grid (hundreds of rows at any SF) with a
    broadcast band spine — the dense grid is what makes absent bands
    count as p_i = 0."""
    c = load_table(spark, sf_dir, "customer")
    band = fdiv(cents("c_acctbal") + 100_000, F.lit(100_000))
    tagged = c.select("c_nationkey", "c_mktsegment", band.alias("band"))
    glob = tagged.groupBy("band").agg(F.count("*").cast("long").alias("gn"))
    tot = tagged.agg(
        F.count("*").cast("long").alias("n"),
        F.countDistinct("band").cast("long").alias("m"),
    )
    grp = tagged.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").cast("long").alias("ng")
    )
    cellcnt = tagged.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count("*").cast("long").alias("cnt")
    )
    dense = (
        grp.crossJoin(F.broadcast(glob))
        .join(
            cellcnt, ["c_nationkey", "c_mktsegment", "band"], "left"
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "ng",
            "band",
            "n",
            "m",
            (
                F.coalesce(F.col("cnt"), F.lit(0)).cast("decimal(38,0)")
                * F.col("n")
                - F.col("gn").cast("decimal(38,0)") * F.col("ng")
            ).alias("dev"),
        )
    )
    wc = (
        W.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "ng",
        "n",
        "m",
        F.sum("dev").over(wc).alias("c"),
    )
    t = F.round(
        F.sum(F.abs(F.col("c"))).cast("double")
        / (
            F.max("ng").cast("double")
            * F.max("n")
            * (F.max("m") - 1)
        ),
        6,
    )
    return cum.groupBy("c_nationkey", "c_mktsegment").agg(
        F.max("ng").cast("long").alias("group_size"),
        t.alias("t_emd"),
        (t > 0.2).alias("at_risk"),
    )


# ------------------------------------------- isotonic calibration


_ISO_BUCKET_CENTS = 6_000_000  # $60k score-bucket width


@query(
    "ml_isotonic_regression",
    oracle=f"""
    WITH raw AS (
      SELECT {sql_fdiv('CAST(round(o_totalprice * 100) AS BIGINT)',
                       str(_ISO_BUCKET_CENTS))} AS bucket,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS hit
      FROM orders
    ),
    b AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hit) AS BIGINT) AS hits,
             row_number() OVER (ORDER BY bucket) AS rn
      FROM raw GROUP BY bucket
    ),
    pre AS (
      SELECT bucket, n, hits, rn,
             sum(n) OVER (ORDER BY rn) AS cn,
             sum(hits) OVER (ORDER BY rn) AS ch
      FROM b
    ),
    pairs AS (
      SELECT a.rn AS j, z.rn AS k,
             CAST(z.ch - a.ch + a.hits AS DOUBLE)
               / CAST(z.cn - a.cn + a.n AS DOUBLE) AS avg_jk
      FROM pre a JOIN pre z ON a.rn <= z.rn
    ),
    inner_min AS (
      SELECT i.rn AS i, p.j, min(p.avg_jk) AS mn
      FROM b i JOIN pairs p ON p.j <= i.rn AND p.k >= i.rn
      GROUP BY i.rn, p.j
    ),
    fit AS (SELECT i, max(mn) AS iso FROM inner_min GROUP BY i)
    SELECT b.bucket AS bucket, b.n AS n, b.hits AS hits,
           round(CAST(b.hits AS DOUBLE) / b.n, 6) AS raw_rate,
           round(f.iso, 6) AS iso_rate
    FROM b JOIN fit f ON f.i = b.rn
    """,
)
def ml_isotonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of an empirical
    rate curve — the classifier-calibration op every training
    pipeline needs before thresholding scores: bucket the score
    (total price, exact-cents bands), take the empirical hit rate
    per bucket, and fit via the minimax characterization
    iso(i) = max over j<=i of min over k>=i of avg(rate over j..k) —
    computed DECLARATIVELY as two bounded joins + two aggregates on
    the |buckets| frame (~100 rows at any SF; the (i,j,k) expansion
    is ~170k tiny rows), engine and oracle running the IDENTICAL
    formula so no PAVA-vs-minimax float-boundary risk exists.  Block
    averages are double divisions of exact integer prefix sums —
    IEEE-identical on both engines.  The only data-scale pass is the
    bucket groupBy; at 100 TB the curve still has ~100 points."""
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        fdiv(cents("o_totalprice"), F.lit(_ISO_BUCKET_CENTS)).alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("hit"),
    )
    b = (
        raw.groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("hit").cast("long").alias("hits"),
        )
        .select(
            "bucket",
            "n",
            "hits",
            F.row_number().over(W.orderBy("bucket")).alias("rn"),
        )
    )
    wp = W.orderBy("rn").rowsBetween(W.unboundedPreceding, W.currentRow)
    # bounded global windows: the bucket frame is ~100 rows at any SF
    pre = b.select(
        "bucket",
        "n",
        "hits",
        "rn",
        F.sum("n").over(wp).alias("cn"),
        F.sum("hits").over(wp).alias("ch"),
    )
    a, z = pre.alias("a"), pre.alias("z")
    pairs = a.join(
        F.broadcast(z), F.col("a.rn") <= F.col("z.rn")
    ).select(
        F.col("a.rn").alias("j"),
        F.col("z.rn").alias("k"),
        (
            (F.col("z.ch") - F.col("a.ch") + F.col("a.hits")).cast("double")
            / (F.col("z.cn") - F.col("a.cn") + F.col("a.n")).cast("double")
        ).alias("avg_jk"),
    )
    inner_min = (
        b.select(F.col("rn").alias("i"))
        .join(
            F.broadcast(pairs),
            (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")),
        )
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("mn"))
    )
    fit = inner_min.groupBy("i").agg(F.max("mn").alias("iso"))
    return (
        b.join(F.broadcast(fit), b.rn == fit.i)
        .select(
            "bucket",
            "n",
            "hits",
            F.round(F.col("hits").cast("double") / F.col("n"), 6).alias(
                "raw_rate"
            ),
            F.round(F.col("iso"), 6).alias("iso_rate"),
        )
    )


# --------------------------------------- time-series motif discovery


_MOTIF_M = 7  # window length (days)
_MOTIF_TOPK = 5


@query(
    "ts_motif_ssd",
    oracle=f"""
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d
    ),
    win AS (
      SELECT rn, day,
             list(x) OVER (ORDER BY rn
                           ROWS BETWEEN CURRENT ROW
                           AND {_MOTIF_M - 1} FOLLOWING) AS w
      FROM idx
      QUALIFY rn <= (SELECT max(rn) FROM idx) - {_MOTIF_M - 1}
    ),
    ssd AS (
      SELECT a.day AS day_a, b.day AS day_b,
             CAST(list_aggregate(
               list_transform(range(1, {_MOTIF_M + 1}),
                 t -> (a.w[CAST(t AS INT)] - b.w[CAST(t AS INT)])
                      * (a.w[CAST(t AS INT)] - b.w[CAST(t AS INT)])),
               'sum') AS BIGINT) AS ssd
      FROM win a JOIN win b ON b.rn >= a.rn + {_MOTIF_M}
    )
    SELECT day_a, day_b, ssd,
           CAST(row_number() OVER (ORDER BY ssd, day_a, day_b) AS INT) AS rk
    FROM ssd
    ORDER BY ssd, day_a, day_b LIMIT {_MOTIF_TOPK}
    """,
)
def ts_motif_ssd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series MOTIF DISCOVERY (the matrix-profile question —
     'which two non-overlapping weeks look most alike?'): slide a
    {_MOTIF_M}-day window over the daily order-count series, compare
    every non-overlapping window pair by exact integer
    sum-of-squared-differences, and return the top-{_MOTIF_TOPK}
    closest pairs with deterministic (ssd, day_a, day_b) ranking.
    Windows materialize as {_MOTIF_M} FLAT lead columns (not arrays:
    the per-pair zip_with lambda billed 3x the flat codegen multiply
    chain at sf0.1 — r11 bench), so the SSD is {_MOTIF_M} scalar
    multiply-adds inside whole-stage codegen.  The pair stage is
    calendar-bounded (~2.9M pairs at ANY corpus size — the
    data-scale pass is the daily groupBy), and the final top-k is a
    TakeOrderedAndProject, not a global sort."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        fdiv(F.unix_micros("o_orderdate"), F.lit(_US_PER_DAY)).alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    # bounded global windows: daily frame, calendar-sized (~2,400)
    idx = d.select(
        "day", "x", F.row_number().over(W.orderBy("day")).alias("rn")
    )
    wl = W.orderBy("rn")
    nmax = idx.agg(F.max("rn").alias("mx"))
    win = (
        idx.select(
            "rn",
            "day",
            F.col("x").alias("w0"),
            *[
                F.lead("x", t).over(wl).alias(f"w{t}")
                for t in range(1, _MOTIF_M)
            ],
        )
        .crossJoin(F.broadcast(nmax))
        .filter(F.col("rn") <= F.col("mx") - (_MOTIF_M - 1))
        .drop("mx")
    )
    a, b = win.alias("a"), win.alias("b")
    terms = [
        (F.col(f"a.w{t}") - F.col(f"b.w{t}"))
        * (F.col(f"a.w{t}") - F.col(f"b.w{t}"))
        for t in range(_MOTIF_M)
    ]
    ssd_expr = terms[0]
    for t in terms[1:]:
        ssd_expr = ssd_expr + t
    ssd = a.join(
        F.broadcast(b), F.col("b.rn") >= F.col("a.rn") + _MOTIF_M
    ).select(
        F.col("a.day").alias("day_a"),
        F.col("b.day").alias("day_b"),
        ssd_expr.cast("long").alias("ssd"),
    )
    top = ssd.orderBy("ssd", "day_a", "day_b").limit(_MOTIF_TOPK)
    return top.select(
        "day_a",
        "day_b",
        "ssd",
        F.row_number()
        .over(W.orderBy("ssd", "day_a", "day_b"))
        .cast("int")
        .alias("rk"),
    )


# ------------------------------------- priority (weighted) sampling


_PRIO_K = 100


@query(
    "sample_priority_weighted",
    oracle=f"""
    WITH w AS (
      SELECT o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents,
             CAST(('0x' || substring(md5('pri:' ||
                     CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) + 1
               AS u
      FROM orders
    ),
    pri AS (
      SELECT o_orderkey, w_cents,
             CAST(w_cents AS DOUBLE) * 1152921504606846976.0 / u
               AS priority
      FROM w
    ),
    top AS (
      SELECT * FROM pri
      ORDER BY priority DESC, o_orderkey LIMIT {_PRIO_K + 1}
    ),
    tau AS (SELECT min(priority) AS tau FROM top),
    sel AS (
      SELECT * FROM top
      ORDER BY priority DESC, o_orderkey LIMIT {_PRIO_K}
    )
    SELECT s.o_orderkey, s.w_cents,
           CAST(floor(greatest(CAST(s.w_cents AS DOUBLE), t.tau))
                AS BIGINT) AS ht_cents
    FROM sel s CROSS JOIN tau t
    """,
)
def sample_priority_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIORITY SAMPLING (Duffield-Lund-Thorup): a weight-proportional
    sample without replacement with unbiased Horvitz-Thompson
    estimation — the 100-TB answer to 'keep {_PRIO_K} rows whose
    weights still sum like the full table': each row draws priority
    w/u from a deterministic md5 uniform (reproducible where rand()
    is not), the top-k survive, and each survivor's HT weight is
    max(w, tau) with tau the (k+1)-th priority — sums of HT weights
    are unbiased for any subset total.  The top-(k+1) is a
    TakeOrderedAndProject (per-partition heap + merge, NO global
    sort); priorities are one double expression with fixed operation
    order on both engines.  Mergeable across shards: union the
    per-shard top-(k+1)s and re-take."""
    o = load_table(spark, sf_dir, "orders")
    u = portable_hash60(F.col("o_orderkey"), salt="pri") + 1
    pri = o.select(
        "o_orderkey",
        cents("o_totalprice").alias("w_cents"),
        (
            cents("o_totalprice").cast("double")
            * F.lit(1152921504606846976.0)
            / u
        ).alias("priority"),
    )
    top = pri.orderBy(
        F.col("priority").desc(), F.col("o_orderkey")
    ).limit(_PRIO_K + 1)
    tau = top.agg(F.min("priority").alias("tau"))
    sel = top.orderBy(F.col("priority").desc(), F.col("o_orderkey")).limit(
        _PRIO_K
    )
    # floor to integer cents: rounding a ~1e9 double at 6 dp exceeds
    # the 15-16 significant digits a double carries, and the two
    # engines disagree in the last ulp of the FORMATTED value; floor
    # of the identical IEEE double is identical on both sides
    return sel.crossJoin(F.broadcast(tau)).select(
        "o_orderkey",
        "w_cents",
        F.floor(F.greatest(F.col("w_cents").cast("double"), F.col("tau")))
        .cast("long")
        .alias("ht_cents"),
    )


# ------------------------------------------ progressive JPEG decode


@query(
    "mm_decode_jpeg_progressive",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             8 * (1 + CAST(('0x' || substr(md5(text), 7, 2)) AS INT) % 4)
               AS w,
             8 * (1 + CAST(('0x' || substr(md5(text), 9, 2)) AS INT) % 4)
               AS h,
             CAST(('0x' || substr(md5(text), 11, 2)) AS INT) AS v
      FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           CAST(CASE WHEN abs(doc_id) % 3 = 1 THEN 1 ELSE 0 END AS INT)
             AS rst,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           round(CAST(64 * list_aggregate(
                   list_transform(range(0, (w // 8) * (h // 8)),
                                  b -> (v + 23 * b) % 256),
                   'sum') AS BIGINT)
                 / CAST(w * h AS BIGINT) / 255.0, 6) AS mean_luma
    FROM base
    """,
)
def mm_decode_jpeg_progressive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE progressive (SOF2) JPEG decode, hash-checked
    end-to-end — the most common web-crawl encoding, closing the last
    stdlib-feasible gap in the modality matrix: synthesize real SOF2
    payloads (spectral-selection bands + successive-approximation DC
    and AC passes with EOB-run coding; ids with abs(id)%3==1 add
    restart markers inside every scan), decode with the pure-Python
    coefficient-domain multi-scan decoder
    (functions/jpegcodec.py: per-band Huffman scans accumulate
    quantized coefficients, one dequant+IDCT pass at EOI) and report
    geometry + mean luma.  Constant blocks under the flat quant table
    are DC-only and the DC first+refinement passes reassemble the
    exact value, so the oracle replays the closed-form block-value
    sum in SQL; any defect in band walks, EOB runs, refinement bits,
    or predictor resets shifts luma_sum and fails the hash.  The
    random-AC path is pinned bit-for-bit against the baseline decoder
    in tests/test_jpegcodec.py.  Two Arrow-batched mapInPandas
    stages, zero shuffle: codec work distributes embarrassingly at
    100 TB."""
    from ctgov_ai_etl_spark.operators.multimodal import (
        decode_image_real,
        render_test_jpegs_progressive,
    )

    # bench-slice cap: documents carry 500 rows at sf0.001/sf0.01
    # (cap is a no-op there — correctness evidence unchanged) and
    # 5,000 at sf0.1, where the pure-Python progressive encoder
    # billed 7.8 s for identical evidence (r11 bench)
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 500
    )
    decoded = decode_image_real(
        render_test_jpegs_progressive(d, "doc_id"), "doc_id"
    )
    return decoded.select(
        "doc_id",
        "rst",
        "width",
        "height",
        F.round(
            F.col("luma_sum") / F.col("n_samples") / F.lit(255.0), 6
        ).alias("mean_luma"),
    )


# -------------------------------------- streaming geofence twin

from ctgov_ai_etl_spark.queries.registry import REGISTRY as _REG  # noqa: E402


@query(
    "stream_run_geo_fence",
    oracle=_REG["geo_fence_transitions"].oracle,
)
def stream_run_geo_fence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL STREAMING geofence alerting: file micro-batch source →
    stateful per-user tile tracker
    (streaming/events.py:stateful_geo_fence, applyInPandasWithState —
    state is two ints per user) → APPEND-mode memory sink.  Each tile
    change emits exactly one alert row in the batch where it happens,
    and the union over batches hash-checks against the SAME oracle as
    the batch lag() twin (geo_fence_transitions) — the alert stream a
    dashboard sees live equals the offline replay.  Bounded state,
    bounded output per batch: the geofence monitor a 100 TB/day
    location pipeline actually runs."""
    from ctgov_ai_etl_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        stateful_geo_fence,
    )

    out = run_stream_to_memory(
        stateful_geo_fence(read_events_stream(spark, sf_dir)),
        mode="append",
    )
    return out.select(
        "user_id", "event_id", "ts_us", "from_tile", "to_tile"
    )


# ------------------------------- binary-segmentation changepoints


@query(
    "ts_changepoint_binseg",
    oracle="""
    WITH d AS (
      SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
             CAST(count(*) AS BIGINT) AS x
      FROM orders GROUP BY 1
    ),
    idx AS (SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM d),
    pre AS (
      SELECT rn, day, sum(x) OVER (ORDER BY rn) AS sx,
             (SELECT max(rn) FROM idx) AS n,
             (SELECT sum(x) FROM idx) AS sxn
      FROM idx
    ),
    c1 AS (
      SELECT rn, day,
             CAST(n * sx - rn * sxn AS DOUBLE)
               * CAST(n * sx - rn * sxn AS DOUBLE)
               / (CAST(rn AS DOUBLE) * (n - rn)) AS score
      FROM pre WHERE rn < n
      ORDER BY score DESC, rn LIMIT 1
    ),
    lseg AS (
      SELECT p.rn, p.day, s1.rn AS m,
             (SELECT sx FROM pre WHERE rn = s1.rn) AS sxm
      FROM pre p CROSS JOIN c1 s1 WHERE p.rn < s1.rn
    ),
    c2 AS (
      SELECT rn, day,
             CAST(m * sx_local - rn * sxm AS DOUBLE)
               * CAST(m * sx_local - rn * sxm AS DOUBLE)
               / (CAST(rn AS DOUBLE) * (m - rn)) AS score
      FROM (SELECT l.rn, l.day, l.m, l.sxm,
                   (SELECT sx FROM pre WHERE rn = l.rn) AS sx_local
            FROM lseg l)
      ORDER BY score DESC, rn LIMIT 1
    ),
    rseg AS (
      SELECT p.rn, p.day, p.n, p.sxn, s1.rn AS m,
             (SELECT sx FROM pre WHERE rn = s1.rn) AS sxm,
             p.sx
      FROM pre p CROSS JOIN c1 s1 WHERE p.rn > s1.rn AND p.rn < p.n
    ),
    c3 AS (
      SELECT rn, day,
             CAST((n - m) * (sx - sxm) - (rn - m) * (sxn - sxm) AS DOUBLE)
               * CAST((n - m) * (sx - sxm) - (rn - m) * (sxn - sxm)
                      AS DOUBLE)
               / (CAST(rn - m AS DOUBLE) * (n - rn)) AS score
      FROM rseg
      ORDER BY score DESC, rn LIMIT 1
    )
    SELECT 1 AS level, 'full' AS segment, day AS split_day,
           round(score, 6) AS score FROM c1
    UNION ALL
    SELECT 2, 'left', day, round(score, 6) FROM c2
    UNION ALL
    SELECT 2, 'right', day, round(score, 6) FROM c3
    """,
)
def ts_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changepoint detection by BINARY SEGMENTATION (depth 2) on the
    daily order-count series: the level-1 split maximizes the
    between-segment CUSUM statistic (n*Sx_s - s*Sx_n)^2 / (s*(n-s)) —
    the deviation term is an EXACT int64 cross product (no running
    means), entering one double expression with identical operation
    order on both engines — then each half is split again by the
    same segment-local statistic.  Where anomaly_cusum flags points,
    this finds the structural breaks a retraining scheduler keys on.
    Every frame after the daily groupBy is calendar-bounded, the
    argmaxes are TakeOrderedAndProject top-1s with deterministic
    (score, rn) tie-breaks."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        fdiv(F.unix_micros("o_orderdate"), F.lit(_US_PER_DAY)).alias("day")
    ).agg(F.count("*").cast("long").alias("x"))
    # bounded global windows: daily frame, calendar-sized (~2,400)
    idx = d.select(
        "day", "x", F.row_number().over(W.orderBy("day")).alias("rn")
    )
    wp = W.orderBy("rn").rowsBetween(W.unboundedPreceding, W.currentRow)
    tots = idx.agg(
        F.max("rn").alias("n"), F.sum("x").cast("long").alias("sxn")
    )
    from ctgov_ai_etl_spark.operators import cache as _cache

    # tracked persist (repo convention): the prefix frame feeds four
    # downstream top-1s; calendar-sized, released via release_all()
    pre = _cache.track(
        idx.select("rn", "day", F.sum("x").over(wp).alias("sx"))
        .crossJoin(F.broadcast(tots))
        .persist()
    )

    def score_col(dev, lo, hi):
        return (
            dev.cast("double")
            * dev.cast("double")
            / (lo.cast("double") * hi)
        )

    c1 = (
        pre.filter(F.col("rn") < F.col("n"))
        .select(
            "rn",
            "day",
            score_col(
                F.col("n") * F.col("sx") - F.col("rn") * F.col("sxn"),
                F.col("rn"),
                F.col("n") - F.col("rn"),
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "rn")
        .limit(1)
    )
    s1 = c1.select(
        F.col("rn").alias("m"), F.col("day").alias("m_day")
    ).join(pre.select(F.col("rn").alias("m"), F.col("sx").alias("sxm")), "m")
    c2 = (
        pre.crossJoin(F.broadcast(s1))
        .filter(F.col("rn") < F.col("m"))
        .select(
            "rn",
            "day",
            score_col(
                F.col("m") * F.col("sx") - F.col("rn") * F.col("sxm"),
                F.col("rn"),
                F.col("m") - F.col("rn"),
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "rn")
        .limit(1)
    )
    c3 = (
        pre.crossJoin(F.broadcast(s1))
        .filter((F.col("rn") > F.col("m")) & (F.col("rn") < F.col("n")))
        .select(
            "rn",
            "day",
            score_col(
                (F.col("n") - F.col("m")) * (F.col("sx") - F.col("sxm"))
                - (F.col("rn") - F.col("m"))
                * (F.col("sxn") - F.col("sxm")),
                F.col("rn") - F.col("m"),
                F.col("n") - F.col("rn"),
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "rn")
        .limit(1)
    )

    def shape(df, level, seg):
        return df.select(
            F.lit(level).cast("int").alias("level"),
            F.lit(seg).alias("segment"),
            F.col("day").alias("split_day"),
            F.round("score", 6).alias("score"),
        )

    out = (
        shape(c1, 1, "full")
        .unionAll(shape(c2, 2, "left"))
        .unionAll(shape(c3, 2, "right"))
    )
    return out


# ------------------------------------------ k-center coreset


_KC_CAP = 500  # documented slice cap: quadratic-free, but bounded demo
_KC_ROUNDS = 8


def _kcenter_oracle(rounds: int, cap: int) -> str:
    parts = [
        f"""v AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) * 1000000)
                                      AS BIGINT)) AS iv
      FROM embeddings WHERE vec_id < {cap}
    )""",
        """dist0 AS (
      SELECT a.vec_id,
             CAST(list_aggregate(
               list_transform(range(1, len(a.iv) + 1),
                 j -> (a.iv[CAST(j AS INT)] - c.iv[CAST(j AS INT)])
                      * (a.iv[CAST(j AS INT)] - c.iv[CAST(j AS INT)])),
               'sum') AS BIGINT) AS mind
      FROM v a CROSS JOIN (SELECT iv FROM v WHERE vec_id = 0) c
    )""",
    ]
    sel = ["SELECT 0 AS round, 0 AS center_id, NULL AS radius_sq"]
    for r in range(1, rounds):
        parts.append(
            f"""c{r} AS (
      SELECT vec_id, mind FROM dist{r - 1}
      ORDER BY mind DESC, vec_id LIMIT 1
    )"""
        )
        sel.append(
            f"SELECT {r}, vec_id, mind FROM c{r}"
        )
        if r < rounds - 1:
            parts.append(
                f"""dist{r} AS (
      SELECT d.vec_id,
             least(d.mind, CAST(list_aggregate(
               list_transform(range(1, len(a.iv) + 1),
                 j -> (a.iv[CAST(j AS INT)] - b.iv[CAST(j AS INT)])
                      * (a.iv[CAST(j AS INT)] - b.iv[CAST(j AS INT)])),
               'sum') AS BIGINT)) AS mind
      FROM dist{r - 1} d
      JOIN v a ON a.vec_id = d.vec_id
      CROSS JOIN (SELECT v.iv FROM c{r} JOIN v ON v.vec_id = c{r}.vec_id) b
    )"""
            )
    body = " UNION ALL ".join(sel)
    return (
        "WITH " + ",\n    ".join(parts) + f"""
    SELECT CAST(round AS INT) AS round,
           CAST(center_id AS BIGINT) AS center_id,
           CAST(radius_sq AS BIGINT) AS radius_sq
    FROM ({body})"""
    )


@query(
    "sample_kcenter_coreset",
    oracle=_kcenter_oracle(_KC_ROUNDS, _KC_CAP),
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-CENTER coreset selection (Gonzalez farthest-first
    traversal): start from vector 0, then 7 rounds of 'add the point
    farthest from every selected center' — the 2-approximation
    coverage guarantee that makes it THE diverse-subset picker for
    training-data curation (each radius_sq is the covering radius
    when that center was chosen, a certified coverage curve).  Each
    round is ONE broadcast join against the single new center plus a
    running least() on the per-point min-distance column — k linear
    passes, never a pairwise matrix — with exact integer micro-unit
    L2 so the whole traversal hash-checks against the unrolled CTE
    oracle.  The slice cap bounds the demo; at 100 TB the same plan
    runs per-shard and the per-shard coresets union (composable
    coresets)."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _KC_CAP
    )
    iv = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * 1_000_000).cast("long"),
    )
    # the capped slice is 500 rows: one partition keeps every round's
    # argmax and distance update a single-task job instead of paying
    # 32-task scheduling overhead 8 times
    v = e.select("vec_id", iv.alias("iv")).coalesce(1)

    def sq_dist(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, t: acc + t,
        )

    from ctgov_ai_etl_spark.operators import cache as _cache

    c0 = v.filter(F.col("vec_id") == 0).select(F.col("iv").alias("civ"))
    dist = _cache.track(
        v.crossJoin(F.broadcast(c0))
        .select(
            "vec_id", "iv", sq_dist(F.col("iv"), F.col("civ")).alias("mind")
        )
        .persist()
    )
    # fully lazy farthest-first traversal: each round's argmax is a
    # 1-row TakeOrdered frame that CARRIES the center's vector, so the
    # next round's distance update is a broadcast crossJoin against
    # it — no driver-side collect, no local-rows createDataFrame in a
    # timed path (SCALE.md r10: those cost ~5 s of Python-worker spawn
    # per write job), one single action at the end
    picks = [
        v.filter(F.col("vec_id") == 0).select(
            F.lit(0).cast("int").alias("round"),
            F.col("vec_id").cast("long").alias("center_id"),
            F.lit(None).cast("long").alias("radius_sq"),
        )
    ]
    for r in range(1, _KC_ROUNDS):
        pick = dist.orderBy(F.col("mind").desc(), "vec_id").limit(1)
        picks.append(
            pick.select(
                F.lit(r).cast("int").alias("round"),
                F.col("vec_id").cast("long").alias("center_id"),
                F.col("mind").cast("long").alias("radius_sq"),
            )
        )
        if r < _KC_ROUNDS - 1:
            center = pick.select(F.col("iv").alias("civ"))
            dist = dist.crossJoin(F.broadcast(center)).select(
                "vec_id",
                "iv",
                F.least(
                    F.col("mind"), sq_dist(F.col("iv"), F.col("civ"))
                ).alias("mind"),
            )
            # tracked persist per round: without it, round r's argmax
            # AND every later round re-evaluate the whole distance
            # chain from scratch (O(k^2) recomputation — billed 4.9 s
            # at sf0.1 for a 500-row frame; r11 bench)
            dist = _cache.track(dist.persist())
    out = picks[0]
    for p_ in picks[1:]:
        out = out.unionAll(p_)
    return out


# ----------------------------------------------- decision stump


_STUMP_BUCKET_CENTS = 3_000_000  # $30k feature buckets


@query(
    "ml_decision_stump",
    oracle=f"""
    WITH raw AS (
      SELECT {sql_fdiv('CAST(round(o_totalprice * 100) AS BIGINT)',
                       str(_STUMP_BUCKET_CENTS))} AS bucket,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    b AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS p
      FROM raw GROUP BY bucket
    ),
    pre AS (
      SELECT bucket,
             sum(n) OVER (ORDER BY bucket) AS nl,
             sum(p) OVER (ORDER BY bucket) AS pl,
             (SELECT sum(n) FROM b) AS nt,
             (SELECT sum(p) FROM b) AS pt
      FROM b
    ),
    cand AS (
      SELECT bucket, nl, pl, nt - nl AS nr, pt - pl AS pr,
             CAST(pl * (nl - pl) AS DOUBLE) / nl
               + CAST((pt - pl) * ((nt - nl) - (pt - pl)) AS DOUBLE)
                 / (nt - nl) AS half_gini_x_n
      FROM pre WHERE nl < nt
    ),
    best AS (
      SELECT * FROM cand ORDER BY half_gini_x_n, bucket LIMIT 1
    )
    SELECT bucket AS split_bucket,
           CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
           CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
           round(2 * half_gini_x_n / (nl + nr), 6) AS weighted_gini,
           round(2 * CAST((pl + pr) AS DOUBLE) * ((nl + nr) - (pl + pr))
                 / (CAST(nl + nr AS DOUBLE) * (nl + nr)), 6) AS root_gini
    FROM best
    """,
)
def ml_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump induction (the depth-1 CART split every
    feature-importance screen and gradient-boosting round runs):
    bucket the feature (total price, exact-cents bands), scan every
    split threshold via CUMULATIVE class counts, and pick the split
    minimizing weighted Gini impurity — the per-candidate score keeps
    pos*neg cross products as EXACT integers and divides once per
    side in double with fixed operation order, so the argmin (with
    deterministic tie-break) matches the oracle bit-for-bit.  One
    data-scale groupBy to the ~200-bucket frame; the candidate scan
    is two bounded windows + a TakeOrdered top-1.  At 100 TB the
    histogram-based split search is exactly how XGBoost/LightGBM
    scale out."""
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        fdiv(cents("o_totalprice"), F.lit(_STUMP_BUCKET_CENTS)).alias(
            "bucket"
        ),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    b = raw.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("p"),
    )
    # bounded global windows: bucket frame, ~200 rows at any SF
    wp = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    tots = b.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("p").cast("long").alias("pt"),
    )
    pre = b.select(
        "bucket",
        F.sum("n").over(wp).alias("nl"),
        F.sum("p").over(wp).alias("pl"),
    ).crossJoin(F.broadcast(tots))
    nl, pl = F.col("nl"), F.col("pl")
    nr, pr = F.col("nt") - nl, F.col("pt") - pl
    half = (pl * (nl - pl)).cast("double") / nl + (pr * (nr - pr)).cast(
        "double"
    ) / nr
    cand = pre.filter(nl < F.col("nt")).select(
        "bucket",
        nl.alias("nl"),
        pl.alias("pl"),
        nr.alias("nr"),
        pr.alias("pr"),
        half.alias("half_gini_x_n"),
    )
    best = cand.orderBy("half_gini_x_n", "bucket").limit(1)
    ntot = F.col("nl") + F.col("nr")
    ptot = F.col("pl") + F.col("pr")
    return best.select(
        F.col("bucket").alias("split_bucket"),
        F.col("nl").alias("n_left"),
        F.col("pl").alias("pos_left"),
        F.col("nr").alias("n_right"),
        F.col("pr").alias("pos_right"),
        F.round(2 * F.col("half_gini_x_n") / ntot, 6).alias("weighted_gini"),
        F.round(
            2 * ptot.cast("double") * (ntot - ptot)
            / (ntot.cast("double") * ntot),
            6,
        ).alias("root_gini"),
    )


# ------------------------------------- deterministic content UUIDs


@query(
    "fn_uuid_deterministic",
    oracle="""
    WITH h AS (
      SELECT doc_id, md5('ctgov:' || CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    )
    SELECT doc_id,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-3'
             || substr(hx, 14, 3) || '-'
             || substr('89ab',
                       CAST(CAST(('0x' || substr(hx, 17, 1)) AS INT) % 4
                            AS INT) + 1, 1)
             || substr(hx, 18, 3) || '-' || substr(hx, 21, 12) AS uuid3
    FROM h
    """,
)
def fn_uuid_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-addressed UUIDs (RFC 4122 version 3:
    md5 of namespace+name with the version nibble forced to '3' and
    the variant nibble to 8/9/a/b) — the stable record identity every
    multi-source ingestion pipeline needs: re-ingesting the same
    document yields the same id on any engine, any partitioning, any
    day.  Pure map-side string algebra over md5 (the portable-hash
    convention), zero shuffle, zero UDF — at 100 TB this is free
    inside whole-stage codegen."""
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("ctgov:"), F.col("doc_id").cast("string")))
    h = d.select("doc_id", hx.alias("hx"))
    variant = F.substring(
        F.lit("89ab"),
        (
            F.conv(F.substring("hx", 17, 1), 16, 10).cast("int") % 4 + 1
        ).cast("int"),
        1,
    )
    return h.select(
        "doc_id",
        F.concat(
            F.substring("hx", 1, 8),
            F.lit("-"),
            F.substring("hx", 9, 4),
            F.lit("-3"),
            F.substring("hx", 14, 3),
            F.lit("-"),
            variant,
            F.substring("hx", 18, 3),
            F.lit("-"),
            F.substring("hx", 21, 12),
        ).alias("uuid3"),
    )


# --------------------------------------------------- GIF decode


@query(
    "mm_decode_gif",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             1 + CAST(('0x' || substr(md5(text), 13, 2)) AS INT) % 24 AS w,
             1 + CAST(('0x' || substr(md5(text), 15, 2)) AS INT) % 24 AS h,
             CAST(('0x' || substr(md5(text), 17, 2)) AS INT) AS v,
             1 + CAST(('0x' || substr(md5(text), 19, 2)) AS INT) % 3 AS nf
      FROM documents WHERE doc_id < 500
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(nf AS INT) AS n_frames,
           round(CAST(3 * list_aggregate(
                   list_transform(range(0, w * h),
                                  j -> (v + 13 * (j % 16)) % 256),
                   'sum') AS BIGINT)
                 / CAST(w * h * 3 AS BIGINT) / 255.0, 6) AS mean_luma0,
           round(CAST(3 * list_aggregate(
                   list_transform(range(0, w * h),
                                  j -> (v + 13 * ((j + nf - 1) % 16)) % 256),
                   'sum') AS BIGINT)
                 / CAST(w * h * 3 AS BIGINT) / 255.0, 6) AS mean_luma_last
    FROM base
    """,
)
def mm_decode_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE animated-GIF decode, hash-checked end-to-end:
    synthesize real GIF89a payloads (md5-derived geometry, 16-entry
    grayscale palette, 1-3 animation frames whose pixel indices shift
    per frame, odd ids INTERLACED) with the pure-Python encoder, run
    them back through the real LZW decoder
    (functions/gifcodec.py: LSB-first variable-width codes, KwKwK,
    dictionary resets, four-pass de-interlacing, frame compositing)
    and report geometry, frame count, and first/last-frame mean luma.
    The palette model makes decode EXACT, so the oracle replays the
    closed-form palette sums in SQL without touching bytes — a wrong
    LZW widening rule, interlace pass, or frame walk shifts a sum and
    fails the hash.  One Arrow-batched mapInPandas stage, zero
    shuffle: codec work distributes embarrassingly at 100 TB."""
    from ctgov_ai_etl_spark.operators.multimodal import (
        render_and_decode_test_gifs,
    )

    # bench-slice cap: no-op at sf0.001/sf0.01 (500 docs), 10x cut
    # for the pure-Python LZW bill at sf0.1
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 500
    )
    g = render_and_decode_test_gifs(d, "doc_id")
    return g.select(
        "doc_id",
        "width",
        "height",
        "n_frames",
        F.round(
            F.col("luma0_sum") / F.col("n_samples") / F.lit(255.0), 6
        ).alias("mean_luma0"),
        F.round(
            F.col("luma_last_sum") / F.col("n_samples") / F.lit(255.0), 6
        ).alias("mean_luma_last"),
    )


# ----------------------------------------------- CUPED adjustment


_CUPED_SPLIT_DAYS = 15


@query(
    "stat_cuped",
    oracle=f"""
    WITH ev AS (
      SELECT user_id,
             epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL
    ),
    d0 AS (SELECT min(day) AS day0 FROM ev),
    per_user AS (
      SELECT user_id,
             CAST(sum(CASE WHEN day < day0 + {_CUPED_SPLIT_DAYS}
                           THEN cents ELSE 0 END) AS BIGINT) AS x,
             CAST(sum(CASE WHEN day >= day0 + {_CUPED_SPLIT_DAYS}
                           THEN cents ELSE 0 END) AS BIGINT) AS y
      FROM ev CROSS JOIN d0 GROUP BY user_id
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
      FROM per_user
    ),
    th AS (
      SELECT n,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
             CAST(sx AS DOUBLE) / n AS mx,
             CAST(n * sxy - sx * sy AS DOUBLE)
               * CAST(n * sxy - sx * sy AS DOUBLE)
               / (CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(n * syy - sy * sy AS DOUBLE)) AS rho2
      FROM m
    ),
    v AS (
      SELECT CAST(user_id % 2 AS INT) AS variant,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(x) AS BIGINT) AS sx_v,
             CAST(sum(y) AS BIGINT) AS sy_v
      FROM per_user GROUP BY user_id % 2
    )
    SELECT v.variant, v.n_users,
           round(CAST(v.sy_v AS DOUBLE) / v.n_users / 100, 6) AS mean_y,
           round((CAST(v.sy_v AS DOUBLE)
                  - th.theta * CAST(v.sx_v AS DOUBLE)
                  + CAST(v.n_users AS DOUBLE) * th.theta * th.mx)
                 / v.n_users / 100, 6) AS mean_y_cuped,
           round(th.rho2 * 1000000) / 1000000 AS var_reduction
    FROM v CROSS JOIN th
    """,
)
def stat_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM'13 — the
    experimentation-platform standard): per-user pre-period spend is
    the covariate, experiment-period spend the metric;
    theta = cov(x,y)/var(x) from EXACT integer cross products
    (n*sxy - sx*sy over HUGEINT/decimal — no running float means),
    and each variant reports its raw vs CUPED-adjusted mean plus the
    theoretical variance reduction rho^2.  One data-scale groupBy to
    per-user sums; moments and adjustment are a 1-row broadcast.  At
    100 TB this is how every A/B platform doubles its effective
    sample size."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    day = fdiv(F.unix_micros("ts"), F.lit(_US_PER_DAY))
    e = ev.select(
        "user_id", day.alias("day"), cents("value").alias("cents")
    )
    d0 = e.agg(F.min("day").alias("day0"))
    pu = (
        e.crossJoin(F.broadcast(d0))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("day") < F.col("day0") + _CUPED_SPLIT_DAYS,
                    F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(
                    F.col("day") >= F.col("day0") + _CUPED_SPLIT_DAYS,
                    F.col("cents"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = pu.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(dec("x") * F.col("x")).alias("sxx"),
        F.sum(dec("x") * F.col("y")).alias("sxy"),
        F.sum(dec("y") * F.col("y")).alias("syy"),
    )
    cnum = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    th = m.select(
        (cnum / vx).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("mx"),
        (cnum * cnum / (vx * vy)).alias("rho2"),
    )
    # Per-variant EXACT integer sums (longs — order-free), then ONE
    # fixed-order scalar double expression mirrored in the oracle:
    # (Sy - theta*Sx + nv*theta*mx) / nv / 100.  Summing the adjusted
    # doubles directly would be accumulation-order-dependent in both
    # engines (flaky 6-dp hash).
    out = (
        pu.groupBy(
            F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant")
        )
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("x").cast("long").alias("sx_v"),
            F.sum("y").cast("long").alias("sy_v"),
        )
        .crossJoin(F.broadcast(th))
        .select(
            "variant",
            "n_users",
            F.round(
                F.col("sy_v").cast("double") / F.col("n_users") / 100, 6
            ).alias("mean_y"),
            F.round(
                (
                    F.col("sy_v").cast("double")
                    - F.col("theta") * F.col("sx_v").cast("double")
                    + F.col("n_users").cast("double")
                    * F.col("theta")
                    * F.col("mx")
                )
                / F.col("n_users")
                / 100,
                6,
            ).alias("mean_y_cuped"),
            (F.round(F.col("rho2") * 1_000_000) / 1_000_000).alias(
                "var_reduction"
            ),
        )
    )
    return out


# ------------------------------------------ Nelson-Aalen hazard


@query(
    "survival_nelson_aalen",
    oracle="""
    WITH t0 AS (
      SELECT user_id, min(epoch_us(ts)) AS start_us
      FROM events WHERE event_type = 'signup' AND ts IS NOT NULL
      GROUP BY user_id
    ),
    horizon AS (
      SELECT max(epoch_us(ts)) AS h FROM events WHERE ts IS NOT NULL
    ),
    ev AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS event_us
      FROM events e JOIN t0 USING (user_id)
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > t0.start_us
      GROUP BY e.user_id
    ),
    subj AS (
      SELECT t0.user_id,
             coalesce(ev.event_us, horizon.h) - t0.start_us AS dur_us,
             CASE WHEN ev.event_us IS NULL THEN 0 ELSE 1 END AS observed
      FROM t0 LEFT JOIN ev USING (user_id) CROSS JOIN horizon
    ),
    grid AS (
      SELECT dur_us,
             CAST(sum(observed) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS leaving
      FROM subj GROUP BY dur_us
    ),
    risk AS (
      SELECT dur_us, d,
             CAST((SELECT count(*) FROM subj) -
                  coalesce(sum(leaving) OVER
                    (ORDER BY dur_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM grid
    )
    SELECT dur_us, d, n_risk,
           round(sum(CAST(d AS DOUBLE) / n_risk) OVER
                   (ORDER BY dur_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
             AS cum_hazard,
           round(sum(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * n_risk))
                   OVER (ORDER BY dur_us
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) AS hazard_var
    FROM risk WHERE d > 0
    """,
)
def survival_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator — the ADDITIVE sibling
    of the Kaplan-Meier curve (survival_km): time from first signup
    to first subsequent purchase, right-censored at the horizon;
    H(t) = sum over event times <= t of d_i/n_i and its variance
    estimate sum d_i/n_i^2.  Hazards accumulate as running sums of
    identical IEEE doubles in the same ascending-duration frame order
    on both engines.  The risk-set grid is bounded by the subject
    count (two partially-aggregated keyed passes at data scale; the
    windows run on the compressed grid)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ts_us = F.unix_micros(F.col("ts"))
    t0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(ts_us).alias("start_us"))
    )
    horizon = ev.agg(F.max(ts_us).alias("h"))
    err = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", ts_us.alias("e_us"))
        .join(t0, "user_id")
        .filter(F.col("e_us") > F.col("start_us"))
        .groupBy("user_id")
        .agg(F.min("e_us").alias("event_us"))
    )
    subj = (
        t0.join(err, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            (
                F.coalesce(F.col("event_us"), F.col("h"))
                - F.col("start_us")
            ).alias("dur_us"),
            F.when(F.col("event_us").isNull(), 0).otherwise(1).alias(
                "observed"
            ),
        )
    )
    n_subj = subj.agg(F.count("*").cast("long").alias("n_all"))
    grid = subj.groupBy("dur_us").agg(
        F.sum("observed").cast("long").alias("d"),
        F.count("*").cast("long").alias("leaving"),
    )
    # bounded global windows: the grid is compressed to distinct
    # durations (subject-bounded), not data-sized
    w_prev = W.orderBy("dur_us").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.orderBy("dur_us").rowsBetween(W.unboundedPreceding, W.currentRow)
    risk = grid.crossJoin(F.broadcast(n_subj)).select(
        "dur_us",
        "d",
        (
            F.col("n_all")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        )
        .cast("long")
        .alias("n_risk"),
    )
    return risk.select(
        "dur_us",
        "d",
        "n_risk",
        F.round(
            F.sum(F.col("d").cast("double") / F.col("n_risk")).over(w_run), 6
        ).alias("cum_hazard"),
        F.round(
            F.sum(
                F.col("d").cast("double")
                / (F.col("n_risk").cast("double") * F.col("n_risk"))
            ).over(w_run),
            6,
        ).alias("hazard_var"),
    ).filter(F.col("d") > 0)


# ------------------------------------------- RAKE keyword extraction


_RAKE_STOPS = ("the", "a", "and", "of", "to", "in", "is", "for", "with", "on")
_RAKE_TOPK = 15


@query(
    "text_rake_keywords",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, u.pos - 1 AS pos, u.tok,
             CASE WHEN u.tok IN {_RAKE_STOPS} THEN 1 ELSE 0 END AS st
      FROM documents,
           LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
                           generate_subscripts(string_split(text, ' '), 1)
                             AS pos) u
    ),
    ids AS (
      -- phrase ids BEFORE filtering (WHERE would strip the stopwords
      -- ahead of the window and collapse each doc to one phrase)
      SELECT doc_id, pos, tok, st,
             sum(st) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS phrase_id
      FROM toks
    ),
    ph AS (
      SELECT doc_id, pos, tok, phrase_id FROM ids WHERE st = 0
    ),
    phrases AS (
      SELECT doc_id, phrase_id,
             CAST(count(*) AS BIGINT) AS n_words,
             string_agg(tok, ' ' ORDER BY pos) AS phrase
      FROM ph GROUP BY doc_id, phrase_id
    ),
    wstat AS (
      SELECT p.tok,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(r.n_words) AS BIGINT) AS degree
      FROM ph p JOIN phrases r USING (doc_id, phrase_id)
      GROUP BY p.tok
    ),
    wscore AS (
      SELECT tok,
             {sql_fdiv('degree * 1000000', 'freq')} AS score_ppm
      FROM wstat
    ),
    pscore AS (
      SELECT r.phrase,
             CAST(sum(w.score_ppm) AS BIGINT) AS score_ppm
      FROM ph p
      JOIN phrases r USING (doc_id, phrase_id)
      JOIN wscore w ON w.tok = p.tok
      GROUP BY r.doc_id, r.phrase_id, r.phrase
    )
    SELECT phrase,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(max(score_ppm) AS BIGINT) AS score_ppm
    FROM pscore GROUP BY phrase
    ORDER BY score_ppm DESC, phrase LIMIT {_RAKE_TOPK}
    """,
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free token runs — built WITHOUT regex
    splitting (whose zero-width semantics differ across engines) via
    the gaps-and-islands trick: phrase_id = running stopword count
    per document; word score = degree/freq in exact integer ppm
    (degree = sum of host-phrase lengths per occurrence), phrase
    score = sum of member word scores.  Two data-scale shuffles
    (phrase agg keyed on (doc, phrase), token-stat agg keyed on the
    vocabulary) + a broadcast of the vocabulary-sized score table;
    the final dedup-and-rank is a TakeOrderedAndProject.  The
    document-frequency-free sibling of TF-IDF/BM25 — keyword mining
    for corpus exploration at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).select(
        "doc_id",
        "pos",
        "tok",
        F.col("tok").isin(*_RAKE_STOPS).cast("int").alias("st"),
    )
    wp = (
        W.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ph = toks.select(
        "doc_id", "pos", "tok", F.sum("st").over(wp).alias("phrase_id"), "st"
    ).filter(F.col("st") == 0)
    phrases = ph.groupBy("doc_id", "phrase_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("phrase"),
    )
    wstat = (
        ph.join(phrases, ["doc_id", "phrase_id"])
        .groupBy("tok")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("n_words").cast("long").alias("degree"),
        )
    )
    wscore = wstat.select(
        "tok", fdiv(F.col("degree") * 1_000_000, F.col("freq")).alias("score_ppm")
    )
    pscore = (
        ph.join(phrases, ["doc_id", "phrase_id"])
        .join(F.broadcast(wscore), "tok")
        .groupBy("doc_id", "phrase_id", "phrase")
        .agg(F.sum("score_ppm").cast("long").alias("score_ppm"))
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.max("score_ppm").cast("long").alias("score_ppm"),
        )
        .orderBy(F.col("score_ppm").desc(), "phrase")
        .limit(_RAKE_TOPK)
    )


# ------------------------------------------------------ BMP decode


@query(
    "mm_decode_bmp",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             1 + CAST(('0x' || substr(md5(text), 21, 2)) AS INT) % 16 AS w,
             1 + CAST(('0x' || substr(md5(text), 23, 2)) AS INT) % 16 AS h,
             CAST(('0x' || substr(md5(text), 25, 2)) AS INT) AS v
      FROM documents
    )
    SELECT doc_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           round(CAST(list_aggregate(
                   list_transform(range(0, w * h * 3),
                                  j -> (v + 7 * j) % 256),
                   'sum') AS BIGINT)
                 / CAST(w * h * 3 AS BIGINT) / 255.0, 6) AS mean_luma
    FROM base
    """,
)
def mm_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENUINE 24-bit BMP decode, hash-checked end-to-end: synthesize
    real BMP payloads (bottom-up rows, BGR sample order, 4-byte row
    padding — the header quirks that break naive readers), decode
    through the magic-byte dispatcher (functions/imagecodec.py:
    decode_bmp) and report geometry + mean luma; the closed-form
    oracle replays the raster sum in SQL.  With netpbm, PNG, baseline
    + progressive JPEG, animated GIF, WAV, and Y4M this completes
    every stdlib-decodable still-image container.  Two Arrow-batched
    mapInPandas stages, zero shuffle."""
    from ctgov_ai_etl_spark.operators.multimodal import (
        decode_image_real,
        render_test_bmps,
    )

    d = load_table(spark, sf_dir, "documents")
    decoded = decode_image_real(render_test_bmps(d, "doc_id"), "doc_id")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.round(
            F.col("luma_sum") / F.col("n_samples") / F.lit(255.0), 6
        ).alias("mean_luma"),
    )


# ----------------------------------------------------- ROC curve


_ROC_BUCKET_CENTS = 3_000_000


@query(
    "ml_roc_curve",
    oracle=f"""
    WITH raw AS (
      SELECT {sql_fdiv('CAST(round(o_totalprice * 100) AS BIGINT)',
                       str(_ROC_BUCKET_CENTS))} AS bucket,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    b AS (
      SELECT bucket, CAST(sum(pos) AS BIGINT) AS p,
             CAST(count(*) - sum(pos) AS BIGINT) AS q
      FROM raw GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(p) AS BIGINT) AS np,
                   CAST(sum(q) AS BIGINT) AS nq FROM b),
    cum AS (
      -- predict positive when bucket >= threshold: cumulate DESC
      SELECT bucket,
             sum(p) OVER (ORDER BY bucket DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS tp,
             sum(q) OVER (ORDER BY bucket DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS fp
      FROM b
    ),
    steps AS (
      SELECT bucket, tp, fp,
             coalesce(lag(tp) OVER (ORDER BY bucket DESC), 0) AS tp0,
             coalesce(lag(fp) OVER (ORDER BY bucket DESC), 0) AS fp0
      FROM cum
    ),
    auc AS (
      SELECT CAST(sum(CAST(fp - fp0 AS HUGEINT) * (tp + tp0))
                  AS HUGEINT) AS tz
      FROM steps
    )
    SELECT s.bucket AS threshold_bucket,
           CAST(s.tp AS BIGINT) AS tp, CAST(s.fp AS BIGINT) AS fp,
           {sql_fdiv('s.tp * 1000000', 't.np')} AS tpr_ppm,
           {sql_fdiv('s.fp * 1000000', 't.nq')} AS fpr_ppm,
           round(CAST(a.tz AS DOUBLE)
                 / (2.0 * t.np * t.nq), 6) AS auc
    FROM steps s CROSS JOIN tot t CROSS JOIN auc a
    """,
)
def ml_roc_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC curve + AUC for a bucketed score (the model-eval op every
    training pipeline runs before shipping a classifier): thresholds
    are the observed score buckets, TP/FP counts cumulate in
    DESCENDING score order, rates are exact integer ppm, and the AUC
    is the trapezoid sum computed ENTIRELY in integers —
    sum((fp_i - fp_i-1) * (tp_i + tp_i-1)) / (2 * n_pos * n_neg) —
    one double division at the end (the rank-sum identity ties this
    to stat_mann_whitney; the curve is what that test can't give).
    One data-scale groupBy to the bucket histogram; windows run on
    the ~200-row threshold frame."""
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        fdiv(cents("o_totalprice"), F.lit(_ROC_BUCKET_CENTS)).alias("bucket"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    b = raw.groupBy("bucket").agg(
        F.sum("pos").cast("long").alias("p"),
        (F.count("*") - F.sum("pos")).cast("long").alias("q"),
    )
    tot = b.agg(
        F.sum("p").cast("long").alias("np"),
        F.sum("q").cast("long").alias("nq"),
    )
    # bounded global windows: threshold frame, ~200 rows at any SF
    wd = W.orderBy(F.col("bucket").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    cum = b.select(
        "bucket",
        F.sum("p").over(wd).alias("tp"),
        F.sum("q").over(wd).alias("fp"),
    )
    wl = W.orderBy(F.col("bucket").desc())
    steps = cum.select(
        "bucket",
        "tp",
        "fp",
        F.coalesce(F.lag("tp").over(wl), F.lit(0)).alias("tp0"),
        F.coalesce(F.lag("fp").over(wl), F.lit(0)).alias("fp0"),
    )
    auc = steps.agg(
        F.sum(
            (F.col("fp") - F.col("fp0")).cast("decimal(38,0)")
            * (F.col("tp") + F.col("tp0"))
        ).alias("tz")
    )
    return (
        steps.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(auc))
        .select(
            F.col("bucket").alias("threshold_bucket"),
            F.col("tp").cast("long").alias("tp"),
            F.col("fp").cast("long").alias("fp"),
            fdiv(F.col("tp") * 1_000_000, F.col("np")).alias("tpr_ppm"),
            fdiv(F.col("fp") * 1_000_000, F.col("nq")).alias("fpr_ppm"),
            F.round(
                F.col("tz").cast("double")
                / (F.lit(2.0) * F.col("np") * F.col("nq")),
                6,
            ).alias("auc"),
        )
    )


# ------------------------------------------- calibration (ECE)


@query(
    "ml_calibration_ece",
    oracle=f"""
    WITH scored AS (
      SELECT CAST(('0x' || substring(md5('conf:' ||
                   CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 1000001 AS conf_ppm,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    b AS (
      SELECT {sql_fdiv('conf_ppm', '100000')} AS bin,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(pos) AS BIGINT) AS hits,
             CAST(sum(conf_ppm) AS BIGINT) AS conf_sum
      FROM scored GROUP BY 1
    ),
    e AS (
      SELECT bin, n, hits,
             {sql_fdiv('hits * 1000000', 'n')} AS acc_ppm,
             {sql_fdiv('conf_sum', 'n')} AS conf_ppm
      FROM b
    )
    SELECT bin, n, hits, acc_ppm, conf_ppm,
           CAST(abs(acc_ppm - conf_ppm) AS BIGINT) AS gap_ppm,
           CAST({sql_fdiv('sum(CAST(n AS HUGEINT) * abs(acc_ppm - conf_ppm)) OVER ()',
                          'sum(n) OVER ()')} AS BIGINT) AS ece_ppm
    FROM e
    """,
)
def ml_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error — the companion metric to
    ml_isotonic_regression: bin a predicted probability (md5-derived
    deterministic confidence in ppm), compare each bin's empirical
    hit rate to its mean confidence, and weight the |gap| by bin
    mass.  EVERYTHING stays in exact integer ppm (fdiv) — acc, conf,
    gap, and the final n-weighted ECE — so the audit is bit-portable
    across engines and rerun-stable.  One data-scale groupBy to 10
    bins; the rest is window algebra on the bin frame (bounded
    global window: 11 rows)."""
    o = load_table(spark, sf_dir, "orders")
    conf = F.pmod(
        portable_hash60(F.col("o_orderkey"), salt="conf"), F.lit(1_000_001)
    )
    scored = o.select(
        conf.alias("conf_ppm"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    b = scored.groupBy(fdiv(F.col("conf_ppm"), F.lit(100_000)).alias("bin")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("hits"),
        F.sum("conf_ppm").cast("long").alias("conf_sum"),
    )
    e = b.select(
        "bin",
        "n",
        "hits",
        fdiv(F.col("hits") * 1_000_000, F.col("n")).alias("acc_ppm"),
        fdiv(F.col("conf_sum"), F.col("n")).alias("conf_ppm"),
    )
    # bounded global window: the bin frame is 11 rows
    wg = W.partitionBy()
    gap = F.abs(F.col("acc_ppm") - F.col("conf_ppm"))
    return e.select(
        "bin",
        "n",
        "hits",
        "acc_ppm",
        "conf_ppm",
        gap.cast("long").alias("gap_ppm"),
        fdiv(
            F.sum(F.col("n").cast("decimal(38,0)") * gap).over(wg),
            F.sum("n").over(wg),
        )
        .cast("long")
        .alias("ece_ppm"),
    )


# ------------------------------------------ power / MDE analysis

# Normal quantiles computed ONCE here and injected into both engines
# as literals (exactness convention: two libm erf implementations are
# not bit-contracted).  z_{0.975} for alpha=5% two-sided, z_{0.8} for
# 80% power.
_Z_ALPHA = 1.959963984540054
_Z_POWER = 0.8416212335729143
_POWER_NS = (1_000, 10_000, 100_000)


@query(
    "stat_power_mde",
    oracle=f"""
    WITH u AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS xc FROM orders
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xc) AS HUGEINT) AS sx,
             CAST(sum(CAST(xc AS HUGEINT) * xc) AS HUGEINT) AS sxx
      FROM u
    ),
    v AS (
      SELECT CAST(m.n AS BIGINT) AS n_obs,
             (CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE))
               / (CAST(m.n AS DOUBLE) * (m.n - 1)) AS var_cents2
      FROM m
    )
    SELECT v.n_obs,
           CAST(g.n_arm AS BIGINT) AS n_per_arm,
           round(sqrt(v.var_cents2) / 100, 6) AS sd_dollars,
           round(({_Z_ALPHA} + {_Z_POWER})
                 * sqrt(2 * v.var_cents2 / g.n_arm) / 100, 6)
             AS mde_dollars
    FROM v CROSS JOIN (SELECT unnest([{", ".join(str(n) for n in _POWER_NS)}])
                       AS n_arm) g
    """,
)
def stat_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: the minimal detectable effect for a
    two-arm test at alpha=5% / power=80% across candidate arm sizes —
    mde = (z_a + z_b) * sqrt(2 sigma^2 / n).  The variance comes from
    EXACT integer moments (n*sxx - sx^2 in HUGEINT/decimal), the
    normal quantiles are shared literals (transcendental-constant
    convention — two libm erfs are not bit-contracted), and sqrt is
    IEEE-correctly-rounded, so both engines agree bit-for-bit.  One
    data-scale aggregate; the sizing grid is a 3-row literal frame.
    Pairs with stat_cuped: CUPED shrinks sigma, this prices it."""
    o = load_table(spark, sf_dir, "orders")
    u = o.select(cents("o_totalprice").alias("xc"))
    dec = F.col("xc").cast("decimal(38,0)")
    m = u.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xc").cast("decimal(38,0)").alias("sx"),
        F.sum(dec * F.col("xc")).alias("sxx"),
    )
    v = m.select(
        F.col("n").cast("long").alias("n_obs"),
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ).alias("var_cents2"),
    )
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(n) for n in _POWER_NS])
        ).alias("n_arm")
    )
    return v.crossJoin(F.broadcast(grid)).select(
        "n_obs",
        F.col("n_arm").cast("long").alias("n_per_arm"),
        F.round(F.sqrt(F.col("var_cents2")) / 100, 6).alias("sd_dollars"),
        F.round(
            F.lit(_Z_ALPHA + _Z_POWER)
            * F.sqrt(2 * F.col("var_cents2") / F.col("n_arm"))
            / 100,
            6,
        ).alias("mde_dollars"),
    )


# ----------------------------------- streaming priority sampling


@query(
    "stream_run_priority_sample",
    oracle=f"""
    WITH w AS (
      SELECT event_id,
             CAST(round(value * 100) AS BIGINT) AS w_cents,
             CAST(('0x' || substring(md5('pri:' ||
                     CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1
               AS u
      FROM events WHERE ts IS NOT NULL
    ),
    pri AS (
      SELECT event_id, w_cents,
             CAST(w_cents AS DOUBLE) * 1152921504606846976.0 / u
               AS priority
      FROM w
    ),
    top AS (
      SELECT * FROM pri
      ORDER BY priority DESC, event_id LIMIT {_PRIO_K + 1}
    ),
    tau AS (SELECT min(priority) AS tau FROM top),
    sel AS (
      SELECT * FROM top
      ORDER BY priority DESC, event_id LIMIT {_PRIO_K}
    )
    SELECT s.event_id, s.w_cents,
           CAST(floor(greatest(CAST(s.w_cents AS DOUBLE), t.tau))
                AS BIGINT) AS ht_cents
    FROM sel s CROSS JOIN tau t
    """,
)
def stream_run_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACTUAL STREAMING priority sampling: file micro-batch source →
    8-way SHARDED bounded-state heaps
    (streaming/events.py:stateful_priority_sample — top-(k+1) triples
    per shard, state bounded regardless of stream length) →
    update-mode snapshots → merge: union the latest shard snapshots,
    re-rank, re-take top-(k+1).  Priority sampling's mergeability is
    exactly what makes it THE weighted-sample at 100 TB (per-shard
    heaps union across executors/days/clusters); here the merged
    live sample hash-checks against the one-shot batch SQL over the
    same rows — the oracle IS the mergeability proof.  Floored-cents
    Horvitz-Thompson weights as in the batch twin."""
    from ctgov_ai_etl_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        stateful_priority_sample,
    )

    snaps = run_stream_to_memory(
        stateful_priority_sample(read_events_stream(spark, sf_dir), _PRIO_K),
        mode="update",
    )
    latest = snaps.groupBy("shard").agg(
        F.max(F.struct("rows_seen", "ids", "ws", "prios")).alias("s")
    )
    cand = latest.select(
        F.explode(F.arrays_zip("s.ids", "s.ws", "s.prios")).alias("e")
    ).select(
        F.col("e.ids").alias("event_id"),
        F.col("e.ws").alias("w_cents"),
        F.col("e.prios").alias("priority"),
    )
    top = cand.orderBy(F.col("priority").desc(), "event_id").limit(
        _PRIO_K + 1
    )
    tau = top.agg(F.min("priority").alias("tau"))
    sel = top.orderBy(F.col("priority").desc(), "event_id").limit(_PRIO_K)
    return sel.crossJoin(F.broadcast(tau)).select(
        "event_id",
        "w_cents",
        F.floor(F.greatest(F.col("w_cents").cast("double"), F.col("tau")))
        .cast("long")
        .alias("ht_cents"),
    )


# ------------------------------------------- array-overlap join


@query(
    "join_array_overlap",
    oracle="""
    WITH tagged AS (
      SELECT doc_id,
             -- [1:3] is INCLUSIVE in DuckDB (3 elements, matching
             -- Spark's slice(arr, 1, 3))
             list_distinct(string_split(text, ' ')[1:3]) AS tags
      FROM documents WHERE doc_id < 500
    ),
    ex AS (
      SELECT doc_id, unnest(tags) AS tag FROM tagged
    )
    SELECT a.doc_id AS a, b.doc_id AS b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM ex a JOIN ex b ON a.tag = b.tag AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
)
def join_array_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-VALUED JOIN on overlapping tag arrays (match documents
    sharing >= 2 tags) — expressed the way it survives 100 TB: NOT
    `arrays_overlap` as a theta-join predicate (which plans as a
    cartesian), but explode-both-sides -> one EQUALITY shuffle on the
    tag -> pair aggregation with the overlap threshold as a HAVING.
    Shared tags count once each (tags are de-duplicated per doc
    first), each qualifying pair aggregates from its shared-tag rows,
    and skew is bounded by per-tag document frequency (a stopword-ish
    hub tag fans out like any hot join key — salt or filter by df at
    real scale; here the slice cap documents the demo bound)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    tagged = d.select(
        "doc_id",
        F.array_distinct(F.slice(F.split("text", " "), 1, 3)).alias("tags"),
    )
    ex = tagged.select("doc_id", F.explode("tags").alias("tag"))
    a = ex.select(F.col("doc_id").alias("a"), "tag")
    b = ex.select(F.col("doc_id").alias("b"), "tag")
    return (
        a.join(b, "tag")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


# --------------------------------------- time-decay attribution


_DECAY_WINDOW_DAYS = 7


@query(
    "attribution_time_decay",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE ts IS NOT NULL
    ),
    conv AS (
      SELECT user_id, event_id AS conv_id, day AS conv_day, cents
      FROM ev WHERE event_type = 'purchase'
    ),
    touch AS (
      SELECT user_id, event_id AS touch_id, event_type AS touch_type,
             day AS touch_day
      FROM ev WHERE event_type <> 'purchase'
    ),
    pairs AS (
      SELECT c.conv_id, c.cents, t.touch_id, t.touch_type,
             CAST(CASE WHEN {_DECAY_WINDOW_DAYS} - (c.conv_day - t.touch_day)
                       BETWEEN 0 AND {_DECAY_WINDOW_DAYS}
                  THEN 1 << CAST({_DECAY_WINDOW_DAYS}
                                 - (c.conv_day - t.touch_day) AS INT)
                  ELSE 0 END AS BIGINT) AS w
      FROM conv c JOIN touch t
        ON t.user_id = c.user_id
       AND t.touch_day <= c.conv_day
       AND t.touch_day >= c.conv_day - {_DECAY_WINDOW_DAYS}
    ),
    tot AS (
      SELECT conv_id, CAST(sum(w) AS BIGINT) AS wsum FROM pairs
      GROUP BY conv_id
    )
    SELECT p.touch_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum({sql_fdiv('p.cents * p.w', 't.wsum')}) AS BIGINT)
             AS credited_cents
    FROM pairs p JOIN tot t USING (conv_id)
    WHERE t.wsum > 0 AND p.w > 0
    GROUP BY p.touch_type
    """,
)
def attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-DECAY attribution — the third standard model beside
    last-touch and linear (attribution_last_touch/_linear): each
    purchase credits its preceding-week touches with weight halving
    per day of age.  Weights are DYADIC (1 << (window - age)) so they
    stay exact int64, and each touch's credit is the exact floor
    division cents*w // sum(w) — no float decay curve to disagree
    on.  The pair stage is a user-keyed join with a calendar-bounded
    fanout (7-day lookback); credits aggregate partially by touch
    type.  The floor-division remainder (< n_touches cents per
    conversion) is deliberately unassigned — deterministic on both
    engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    base = ev.select(
        "user_id",
        "event_id",
        "event_type",
        fdiv(F.unix_micros("ts"), F.lit(_US_PER_DAY)).alias("day"),
        cents("value").alias("cents"),
    )
    conv = base.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("conv_id"),
        F.col("day").alias("conv_day"),
        "cents",
    )
    touch = base.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
        F.col("day").alias("touch_day"),
    )
    age = F.col("conv_day") - F.col("touch_day")
    # pyspark's F.shiftleft wants a literal bit count; the SQL form
    # takes a column.  The when() guard pins the shift to the
    # 0..window domain (the 0..63 shift-domain convention).
    w = (
        F.when(
            (_DECAY_WINDOW_DAYS - age >= 0)
            & (_DECAY_WINDOW_DAYS - age <= _DECAY_WINDOW_DAYS),
            F.expr(
                f"shiftleft(1, CAST({_DECAY_WINDOW_DAYS} "
                "- (conv_day - touch_day) AS INT))"
            ),
        )
        .otherwise(0)
        .cast("long")
    )
    # Both frames derive from one lineage (`base`); explicit aliases
    # keep the equi-join condition unambiguous (without them Spark
    # resolves both sides to the same attribute and WARNs about a
    # "trivially true equals predicate").
    pairs = (
        conv.alias("conv")
        .join(
            touch.alias("touch"),
            (F.col("conv.user_id") == F.col("touch.user_id"))
            & (F.col("touch_day") <= F.col("conv_day"))
            & (F.col("touch_day") >= F.col("conv_day") - _DECAY_WINDOW_DAYS),
        )
        .select("conv_id", "cents", "touch_id", "touch_type", w.alias("w"))
    )
    tot = pairs.groupBy("conv_id").agg(
        F.sum("w").cast("long").alias("wsum")
    )
    return (
        pairs.join(tot, "conv_id")
        .filter((F.col("wsum") > 0) & (F.col("w") > 0))
        .groupBy("touch_type")
        .agg(
            F.count("*").cast("long").alias("n_touches"),
            F.sum(fdiv(F.col("cents") * F.col("w"), F.col("wsum")))
            .cast("long")
            .alias("credited_cents"),
        )
    )


# ------------------------------------------ inter-annotator kappa


@query(
    "stat_cohens_kappa",
    oracle="""
    WITH lab AS (
      SELECT CAST(('0x' || substring(md5('a:' ||
               CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 3 AS a,
             CASE WHEN CAST(('0x' || substring(md5('agree:' ||
                    CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                    % 10 < 7
                  THEN CAST(('0x' || substring(md5('a:' ||
                         CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                         % 3
                  ELSE CAST(('0x' || substring(md5('b:' ||
                         CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
                         % 3
             END AS b
      FROM orders
    ),
    cells AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS n FROM lab GROUP BY a, b
    )
    SELECT CAST(c.a AS INT) AS a, CAST(c.b AS INT) AS b, c.n,
           round((CAST(m2.nt AS DOUBLE) * m2.diag - CAST(m2.src AS DOUBLE))
                 / (CAST(m2.nt AS DOUBLE) * m2.nt
                    - CAST(m2.src AS DOUBLE)), 6) AS kappa
    FROM cells c CROSS JOIN (
      SELECT (SELECT CAST(sum(n) AS BIGINT) FROM cells) AS nt,
             (SELECT CAST(sum(n) AS BIGINT) FROM cells WHERE a = b)
               AS diag,
             (SELECT CAST(sum(CAST(ra.rn AS HUGEINT) * cb.cn) AS HUGEINT)
              FROM (SELECT a, sum(n) AS rn FROM cells GROUP BY a) ra
              JOIN (SELECT b, sum(n) AS cn FROM cells GROUP BY b) cb
                ON ra.a = cb.b) AS src
    ) m2
    """,
)
def stat_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa inter-annotator agreement — the labeling-QA
    metric every human-annotation pipeline gates on before its labels
    become training data: two deterministic md5 'annotators' (B
    copies A 70% of the time) build a 3x3 confusion matrix, and
    kappa = (n*diag - sum(row_i*col_i)) / (n^2 - sum(row_i*col_i))
    stays in EXACT integers until one double division.  One
    data-scale groupBy to 9 cells; the margins join is
    contingency-sized.  Output carries the full matrix plus the
    shared kappa so the audit is one frame."""
    o = load_table(spark, sf_dir, "orders")
    ha = F.pmod(portable_hash60(F.col("o_orderkey"), salt="a"), F.lit(3))
    hb = F.pmod(portable_hash60(F.col("o_orderkey"), salt="b"), F.lit(3))
    agree = F.pmod(
        portable_hash60(F.col("o_orderkey"), salt="agree"), F.lit(10)
    )
    lab = o.select(
        ha.alias("a"), F.when(agree < 7, ha).otherwise(hb).alias("b")
    )
    cells = lab.groupBy("a", "b").agg(F.count("*").cast("long").alias("n"))
    ra = cells.groupBy("a").agg(F.sum("n").cast("long").alias("rn"))
    cb = cells.groupBy("b").agg(F.sum("n").cast("long").alias("cn"))
    src = (
        ra.join(cb, ra.a == cb.b)
        .agg(
            F.sum(F.col("rn").cast("decimal(38,0)") * F.col("cn")).alias(
                "src"
            )
        )
    )
    tots = cells.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("diag"),
    )
    kappa = F.round(
        (F.col("nt").cast("double") * F.col("diag") - F.col("src").cast("double"))
        / (
            F.col("nt").cast("double") * F.col("nt")
            - F.col("src").cast("double")
        ),
        6,
    )
    return (
        cells.crossJoin(F.broadcast(tots))
        .crossJoin(F.broadcast(src))
        .select(
            F.col("a").cast("int").alias("a"),
            F.col("b").cast("int").alias("b"),
            "n",
            kappa.alias("kappa"),
        )
    )


# --------------------------------- Bradley-Terry preference model

_BT_ITERS = 3
# item index = first char of o_orderpriority ('1'..'5') - 1
_BT_K = 5


def _bt_oracle() -> str:
    pair_src = """
      SELECT CAST(CAST(substr(a.o_orderpriority, 1, 1) AS INT) - 1 AS INT)
               AS ia,
             CAST(CAST(substr(b.o_orderpriority, 1, 1) AS INT) - 1 AS INT)
               AS ib,
             CASE WHEN CAST(round(a.o_totalprice * 100) AS BIGINT)
                       > CAST(round(b.o_totalprice * 100) AS BIGINT)
                  THEN 1
                  WHEN CAST(round(a.o_totalprice * 100) AS BIGINT)
                       = CAST(round(b.o_totalprice * 100) AS BIGINT)
                   AND a.o_orderpriority < b.o_orderpriority
                  THEN 1 ELSE 0 END AS a_wins
      FROM orders a JOIN orders b
        ON a.o_custkey = b.o_custkey
       AND a.o_orderkey < b.o_orderkey
       AND a.o_orderpriority <> b.o_orderpriority
    """
    parts = [
        f"pairs AS ({pair_src})",
        """wins AS (
      SELECT ia AS i, ib AS j,
             CAST(sum(a_wins) AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS g
      FROM pairs GROUP BY ia, ib
    )""",
        """mat AS (
      -- symmetric game counts + per-item total wins, dense 5x5
      SELECT i,
             CAST(sum(w) AS BIGINT) AS big_w
      FROM (
        SELECT i, w FROM wins
        UNION ALL
        SELECT j AS i, g - w AS w FROM wins
      ) GROUP BY i
    )""",
        """g5 AS (
      SELECT i,
             """ + ",\n             ".join(
            f"CAST(sum(CASE WHEN j = {c} THEN g ELSE 0 END) AS BIGINT)"
            f" AS g{c}"
            for c in range(_BT_K)
        ) + """
      FROM (
        SELECT i, j, g FROM wins
        UNION ALL
        SELECT j AS i, i AS j, g FROM wins
      ) GROUP BY i
    )""",
        "p0 AS (SELECT "
        + ", ".join(f"1.0 AS p{c}" for c in range(_BT_K))
        + ")",
    ]
    for t in range(1, _BT_ITERS + 1):
        terms = " + ".join(
            f"g5.g{c} / (CASE m.i "
            + " ".join(f"WHEN {d} THEN p.p{d}" for d in range(_BT_K))
            + f" END + p.p{c})"
            for c in range(_BT_K)
        )
        parts.append(
            f"""it{t} AS (
      SELECT m.i, CAST(m.big_w AS DOUBLE) / nullif({terms}, 0) AS p
      FROM mat m JOIN g5 ON g5.i = m.i CROSS JOIN p{t - 1} p
    )"""
        )
        parts.append(
            f"p{t} AS (SELECT "
            + ", ".join(
                f"max(CASE WHEN i = {c} THEN p END) AS p{c}"
                for c in range(_BT_K)
            )
            + f" FROM it{t})"
        )
    final_terms = " + ".join(f"p.p{c}" for c in range(_BT_K))
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT it.i AS item, m.big_w AS wins,
           round(it.p / ({final_terms}), 6) AS strength
    FROM it{_BT_ITERS} it JOIN mat m ON m.i = it.i
    CROSS JOIN p{_BT_ITERS} p"""
    )


@query("ml_bradley_terry", oracle=_bt_oracle())
def ml_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference aggregation — the pairwise-comparison
    model RLHF preference pipelines fit before reward modeling:
    same-customer order pairs vote between priority classes (higher
    exact-cents price wins, deterministic tie-break), and 3
    minorization-maximization rounds solve
    p_i <- W_i / sum_j g_ij/(p_i+p_j) on the 5-item frame.  The
    denominators are EXPLICIT 5-term expressions (pivoted columns),
    so the double additions run in the same left-to-right order on
    both engines — the unordered-SUM pitfall never arises — and the
    final strengths normalize + round at 6 dp.  One data-scale
    per-customer pair join; everything after is a 5-row frame."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (F.substring("o_orderpriority", 1, 1).cast("int") - 1).alias("item"),
        "o_orderpriority",
        cents("o_totalprice").alias("cents"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (F.col("a.o_orderpriority") != F.col("b.o_orderpriority")),
    ).select(
        F.col("a.item").alias("ia"),
        F.col("b.item").alias("ib"),
        F.when(F.col("a.cents") > F.col("b.cents"), 1)
        .when(
            (F.col("a.cents") == F.col("b.cents"))
            & (F.col("a.o_orderpriority") < F.col("b.o_orderpriority")),
            1,
        )
        .otherwise(0)
        .alias("a_wins"),
    )
    wins = pairs.groupBy("ia", "ib").agg(
        F.sum("a_wins").cast("long").alias("w"),
        F.count("*").cast("long").alias("g"),
    )
    both = wins.select("ia", "ib", "w", "g").unionAll(
        wins.select(
            F.col("ib").alias("ia"),
            F.col("ia").alias("ib"),
            (F.col("g") - F.col("w")).alias("w"),
            "g",
        )
    )
    mat = both.groupBy(F.col("ia").alias("i")).agg(
        F.sum("w").cast("long").alias("big_w")
    )
    g5 = both.groupBy(F.col("ia").alias("i")).agg(
        *[
            F.sum(F.when(F.col("ib") == c, F.col("g")).otherwise(0))
            .cast("long")
            .alias(f"g{c}")
            for c in range(_BT_K)
        ]
    )
    base = mat.join(g5, "i")
    prow = None  # 1-row frame of p0..p4
    cur = None
    for t in range(_BT_ITERS + 1):
        if t == 0:
            prow = base.sparkSession.range(1).select(
                *[F.lit(1.0).alias(f"p{c}") for c in range(_BT_K)]
            )
            continue
        p_self = None
        for d in range(_BT_K):
            clause = F.when(F.col("i") == d, F.col(f"p{d}"))
            p_self = clause if p_self is None else p_self.when(
                F.col("i") == d, F.col(f"p{d}")
            )
        # explicit left-to-right 5-term denominator (order-stable)
        den = None
        for c in range(_BT_K):
            term = F.col(f"g{c}") / (p_self + F.col(f"p{c}"))
            den = term if den is None else den + term
        cur = base.crossJoin(F.broadcast(prow)).select(
            "i",
            "big_w",
            (
                F.col("big_w").cast("double")
                / F.nullif(den, F.lit(0.0))
            ).alias("p"),
        )
        prow = cur.agg(
            *[
                F.max(F.when(F.col("i") == c, F.col("p"))).alias(f"p{c}")
                for c in range(_BT_K)
            ]
        )
    total = None
    for c in range(_BT_K):
        total = (
            F.col(f"p{c}") if total is None else total + F.col(f"p{c}")
        )
    return cur.crossJoin(F.broadcast(prow)).select(
        F.col("i").cast("int").alias("item"),
        F.col("big_w").alias("wins"),
        F.round(F.col("p") / total, 6).alias("strength"),
    )
