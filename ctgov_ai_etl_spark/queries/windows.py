"""Window functions (SURVEY.md §2.3 'Window functions').

All window specs order by a unique tie-breaker key so results are
deterministic under any partitioning — the same discipline the
reference needs for its positional limit semantics (SURVEY.md §7,
R8).  Window partitions shuffle once on the partition key; frames run
within the sorted partition with no further exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.queries.registry import query
from ctgov_ai_etl_spark.tables import load_table


@query(
    "win_topk_per_group",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c_mktsegment, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
    ) t WHERE rn <= 3
    """,
)
def win_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number — the scalable top-k idiom (one
    shuffle on the group key; no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "win_rank_family",
    oracle="""
    SELECT s_suppkey,
           CAST(rank()        OVER (ORDER BY s_acctbal DESC) AS INT) AS rnk,
           CAST(dense_rank()  OVER (ORDER BY s_acctbal DESC) AS INT) AS drnk,
           round(percent_rank() OVER (ORDER BY s_acctbal DESC), 9) AS prnk,
           CAST(ntile(4)      OVER (ORDER BY s_acctbal DESC) AS INT) AS quartile
    FROM supplier
    """,
)
def win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over one ordering.

    SMALL-DIMENSION ONLY: the unpartitioned window funnels the input
    through one reducer — fine for the 100-row supplier table it runs
    on, wrong for a fact table.  The fact-table formulation is
    ``win_rank_distributed`` (range-partition → local rank → offsets);
    copy THAT shape when ranking anything large."""
    s = load_table(spark, sf_dir, "supplier")
    w = W.orderBy(F.col("s_acctbal").desc())
    return s.select(
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_rank_distributed",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC)
                AS BIGINT) AS global_rank
    FROM orders
    """,
)
def win_rank_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL ranking of a fact table with NO single-reducer window:
    ``operators.limits.global_rank`` range-partitions on the order key
    (parallel sampled shuffle), ranks locally per partition, then
    shifts by broadcast per-partition row-count offsets.  Same result
    as ``row_number() OVER (ORDER BY ...)`` — the oracle replays
    exactly that — but every stage is parallel, so the shape survives a
    fact table 1000× this size.  Descending keys rank by their negation
    (range partitioning is ascending)."""
    from ctgov_ai_etl_spark.operators.limits import global_rank

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", (-F.col("o_totalprice")).alias("__neg_price")
    )
    ranked = global_rank(o, ["__neg_price", "o_orderkey"])
    return ranked.select(
        "o_orderkey", "o_totalprice", F.col("__pos").alias("global_rank")
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER w AS BIGINT) AS us_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics with an exact integer time delta
    (microseconds, not float seconds — order-independent)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (us - F.lag(us).over(w)).cast("long").alias("us_since_prev"),
    )


@query(
    "scd2_history",
    oracle="""
    SELECT o_custkey, o_orderstatus AS status,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER w AS valid_to,
           (lead(o_orderdate) OVER w IS NULL) AS is_current
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 historization: each per-customer status change
    becomes an effective-dated interval [valid_from, valid_to) with an
    is_current flag on the open row — the companion to SCD-1
    `merge_upsert_orders` (overwrite) when history must be KEPT.
    One shuffle (the per-key window); ties broken by order key so the
    intervals are deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100
             AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (rows frame; integer-cents so the
    running value is exact at every row)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w).cast("double") / 100).alias("running_spend"),
    )


@query(
    "win_sliding_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(round(value * 1e6) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / (1e6 * count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
             AS moving_avg
    FROM events
    """,
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row moving average (exact integer-micro arithmetic)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    micros = F.round(F.col("value") * 1e6).cast("long")
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(micros).over(w).cast("double") / (F.lit(1e6) * F.count("*").over(w))).alias(
            "moving_avg"
        ),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS last_type,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over an unbounded frame, collapsed to one row
    per key."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.count("*").over(W.partitionBy("user_id")).alias("n_events"),
    ).distinct()


_TS_BUCKET_US = 21_600_000_000  # 6-hour resample grid


@query(
    "ts_resample_ffill",
    oracle=f"""
    WITH eb AS (
      SELECT user_id, epoch_us(ts) // {_TS_BUCKET_US} AS b, ts, event_id, value
      FROM events
    ),
    bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM eb),
    grid AS (SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
    users AS (SELECT DISTINCT user_id FROM events),
    cells AS (SELECT u.user_id, g.b FROM users u CROSS JOIN grid g),
    lastv AS (
      SELECT user_id, b, value FROM (
        SELECT user_id, b, value,
               row_number() OVER (PARTITION BY user_id, b
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM eb
      ) WHERE rn = 1
    )
    SELECT c.user_id,
           make_timestamp(c.b * {_TS_BUCKET_US}) AS bucket_ts,
           last_value(l.value IGNORE NULLS) OVER (
             PARTITION BY c.user_id ORDER BY c.b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
           (l.b IS NULL) AS is_gap
    FROM cells c LEFT JOIN lastv l ON l.user_id = c.user_id AND l.b = c.b
    """,
)
def ts_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill (the hypertable operation):
    every user is projected onto a fixed 6-hour grid spanning the
    corpus, each cell takes the LAST event value inside it
    (deterministic (ts, event_id) tie-break via struct-max), and empty
    cells forward-fill from the previous non-empty one (marked
    ``is_gap``).  Scale shape: the grid derives from one 1-row bounds
    aggregate and broadcasts against the user dimension; the per-cell
    last-value is a partially-aggregated struct-max groupBy; the fill
    is a per-user running window — everything shuffles on user_id
    once, so a 100 TB event store resamples as wide as its entity
    count.  Leading cells before a user's first event stay null, as
    in the SQL replay."""
    e = load_table(spark, sf_dir, "events")
    eb = e.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_TS_BUCKET_US}").alias("b"),
        "ts",
        "event_id",
        "value",
    )
    bounds = eb.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    grid = bounds.select(F.explode(F.sequence("b0", "b1")).alias("b"))
    users = e.select("user_id").distinct()
    cells = users.crossJoin(F.broadcast(grid))
    last = eb.groupBy("user_id", "b").agg(
        F.max(F.struct("ts", "event_id", "value")).alias("m")
    )
    j = cells.join(last, ["user_id", "b"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return j.select(
        "user_id",
        F.timestamp_micros(F.col("b") * _TS_BUCKET_US).alias("bucket_ts"),
        F.last(F.col("m.value"), ignorenulls=True).over(w).alias("value_filled"),
        F.col("m").isNull().alias("is_gap"),
    )


@query(
    "ts_interpolate_linear",
    oracle=f"""
    WITH eb AS (
      SELECT user_id, epoch_us(ts) // {_TS_BUCKET_US} AS b, ts, event_id, value
      FROM events
    ),
    bounds AS (SELECT min(b) AS b0, max(b) AS b1 FROM eb),
    grid AS (SELECT unnest(generate_series(b0, b1)) AS b FROM bounds),
    users AS (SELECT DISTINCT user_id FROM events),
    cells AS (SELECT u.user_id, g.b FROM users u CROSS JOIN grid g),
    lastv AS (
      SELECT user_id, b, value FROM (
        SELECT user_id, b, value,
               row_number() OVER (PARTITION BY user_id, b
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM eb
      ) WHERE rn = 1
    ),
    j AS (
      SELECT c.user_id, c.b, l.value AS v, l.b IS NOT NULL AS known
      FROM cells c LEFT JOIN lastv l ON l.user_id = c.user_id AND l.b = c.b
    ),
    anch AS (
      SELECT user_id, b, v, known,
             last_value(CASE WHEN known THEN b END IGNORE NULLS) OVER wp AS pb,
             last_value(CASE WHEN known THEN v END IGNORE NULLS) OVER wp AS pv,
             first_value(CASE WHEN known THEN b END IGNORE NULLS) OVER wn AS nb,
             first_value(CASE WHEN known THEN v END IGNORE NULLS) OVER wn AS nv
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY b
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY b
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           make_timestamp(b * {_TS_BUCKET_US}) AS bucket_ts,
           CASE WHEN known THEN round(v, 6)
                WHEN pb IS NOT NULL AND nb IS NOT NULL
                THEN round(pv + (nv - pv) * (b - pb) / (nb - pb), 6)
           END AS value_interp,
           CASE WHEN known THEN 'known'
                WHEN pb IS NOT NULL AND nb IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS kind
    FROM anch
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series LINEAR interpolation on the resample grid — the
    companion to ``ts_resample_ffill`` for continuous measures (a
    forward fill repeats stale values; interpolation reconstructs the
    trend between known anchors).  Gap cells strictly between two
    known cells get pv + (nv−pv)·(b−pb)/(nb−pb); cells before a
    user's first / after their last anchor are 'edge' (null).

    Scale shape: identical to the ffill query — one broadcast grid ×
    user dimension, one per-(user, bucket) struct-max aggregation,
    then TWO frames over the same user_id partition sort (previous
    and next anchor), which Spark plans as one shuffle + one sort.
    Anchor (b, value) pairs stay aligned because both columns are
    null-gated on the same known flag inside the frame.  Determinism:
    the anchors are exact; the interpolation arithmetic is IEEE
    double with a fixed association order, replayed identically by
    the oracle; output rounds at 6 dp."""
    e = load_table(spark, sf_dir, "events")
    eb = e.select(
        "user_id",
        F.expr(f"unix_micros(ts) div {_TS_BUCKET_US}").alias("b"),
        "ts",
        "event_id",
        "value",
    )
    bounds = eb.agg(F.min("b").alias("b0"), F.max("b").alias("b1"))
    grid = bounds.select(F.explode(F.sequence("b0", "b1")).alias("b"))
    users = e.select("user_id").distinct()
    cells = users.crossJoin(F.broadcast(grid))
    last = eb.groupBy("user_id", "b").agg(
        F.max(F.struct("ts", "event_id", "value")).alias("m")
    )
    j = cells.join(last, ["user_id", "b"], "left").select(
        "user_id",
        "b",
        F.col("m.value").alias("v"),
        F.col("m").isNotNull().alias("known"),
    )
    wp = (
        W.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = (
        W.partitionBy("user_id")
        .orderBy("b")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    known_b = F.when(F.col("known"), F.col("b"))
    known_v = F.when(F.col("known"), F.col("v"))
    anch = j.select(
        "user_id",
        "b",
        "v",
        "known",
        F.last(known_b, ignorenulls=True).over(wp).alias("pb"),
        F.last(known_v, ignorenulls=True).over(wp).alias("pv"),
        F.first(known_b, ignorenulls=True).over(wn).alias("nb"),
        F.first(known_v, ignorenulls=True).over(wn).alias("nv"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.col("b") - F.col("pb")
    ) / (F.col("nb") - F.col("pb"))
    has_both = F.col("pb").isNotNull() & F.col("nb").isNotNull()
    return anch.select(
        "user_id",
        F.timestamp_micros(F.col("b") * _TS_BUCKET_US).alias("bucket_ts"),
        F.when(F.col("known"), F.round(F.col("v"), 6))
        .when(has_both, F.round(interp, 6))
        .alias("value_interp"),
        F.when(F.col("known"), F.lit("known"))
        .when(has_both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("kind"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             min(ts) FILTER (WHERE event_type = 'view') AS t_view
      FROM events GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, s.t_view,
             min(e.ts) FILTER (WHERE e.event_type = 'click'
                               AND e.ts > s.t_view) AS t_click
      FROM events e JOIN steps s USING (user_id)
      GROUP BY e.user_id, s.t_view
    ),
    s3 AS (
      SELECT e.user_id, s.t_view, s.t_click,
             min(e.ts) FILTER (WHERE e.event_type = 'purchase'
                               AND e.ts > s.t_click) AS t_purchase
      FROM events e JOIN s2 s USING (user_id)
      GROUP BY e.user_id, s.t_view, s.t_click
    )
    SELECT CAST(count(*) FILTER (WHERE t_view IS NOT NULL) AS BIGINT)
             AS n_view,
           CAST(count(*) FILTER (WHERE t_click IS NOT NULL) AS BIGINT)
             AS n_view_click,
           CAST(count(*) FILTER (WHERE t_purchase IS NOT NULL) AS BIGINT)
             AS n_view_click_purchase
    FROM s3
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDERED funnel analysis (view → click → purchase): per user,
    the earliest view, the earliest click strictly AFTER that view,
    the earliest purchase strictly after that click — then one row of
    stage counts.  The ordered-sequence semantics ("a click before
    the first view doesn't count") is what separates a funnel from
    three independent filters, and it computes WITHOUT a window over
    raw events: three conditional-min aggregations keyed on user_id,
    each partially aggregated map-side (one row per user survives
    each shuffle).  At 100 TB the event table is touched three times
    map-side but shuffled only as per-user minima — the standard
    iterative funnel layout; k-step funnels chain k such passes."""
    e = load_table(spark, sf_dir, "events")
    t1 = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    t2 = (
        e.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id", "t_view")
        .agg(F.min("ts").alias("t_click"))
    )
    t3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        t1.join(t2.select("user_id", "t_click"), "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count("t_view").cast("long").alias("n_view"),
            F.count("t_click").cast("long").alias("n_view_click"),
            F.count("t_purchase").cast("long").alias("n_view_click_purchase"),
        )
    )


_WEEK_US = 7 * 86_400_000_000


@query(
    "retention_cohorts",
    oracle=f"""
    WITH cohort AS (
      SELECT user_id, min(epoch_us(ts) // {_WEEK_US}) AS w0
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    active AS (
      SELECT DISTINCT e.user_id, epoch_us(e.ts) // {_WEEK_US} AS w
      FROM events e
    )
    SELECT c.w0 AS cohort_week,
           CAST(a.w - c.w0 AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM cohort c JOIN active a USING (user_id)
    WHERE a.w >= c.w0
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the growth-analytics staple: users
    grouped by their signup week (first 'signup' event), counted as
    retained in every later week they show ANY activity.  Weeks are
    integer epoch-week indices (epoch µs div week) so the bucketing
    is engine-exact, no calendar semantics to disagree on.  Shape:
    one per-user min aggregation (cohort), one distinct over (user,
    week) — both partially aggregated — and a broadcast-joinable
    cohort dimension; the final matrix is |cohorts| × |offsets|
    rows.  At 100 TB the event table shuffles once per aggregation on
    user_id, never on time."""
    e = load_table(spark, sf_dir, "events")
    week = F.expr(f"unix_micros(ts) div {_WEEK_US}")
    cohort = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(week).alias("w0"))
    )
    active = e.select("user_id", week.alias("w")).distinct()
    return (
        active.join(cohort, "user_id")
        .filter(F.col("w") >= F.col("w0"))
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (F.col("w") - F.col("w0")).cast("long").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
    )


@query(
    "win_ntile_family",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(row_number() OVER w AS INT) AS rn
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
)
def win_ntile_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distribution-rank window family — ntile (equal-count
    bucketing, the quantile-binning primitive), percent_rank and
    cume_dist (relative standing) — over a per-priority price
    ordering.  One shuffle on the partition key, sort within; the
    (price desc, key asc) order is total, so every rank function is
    deterministic and both engines agree exactly (percent_rank /
    cume_dist are ratios of integer ranks — exact in double until
    astronomically wide partitions; rounded at 6 dp anyway).

    Scale note: o_orderpriority has cardinality 5, so each partition
    funnels into one task — correct as the family exemplar, but at
    100x scale route quantile binning through global_rank's
    distributed rank + arithmetic ntile instead (see
    agg_histogram_equidepth and SCALE.md's low-cardinality-window
    entry)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.row_number().over(w).cast("int").alias("rn"),
    )


@query(
    "anomaly_zscore",
    oracle="""
    WITH m AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(CAST(round(value * 1000000) AS BIGINT) AS HUGEINT)) AS s1,
             sum(CAST(CAST(round(value * 1000000) AS BIGINT) AS HUGEINT)
                 * CAST(round(value * 1000000) AS BIGINT)) AS s2
      FROM events GROUP BY user_id
    ),
    z AS (
      SELECT e.event_id, e.user_id, e.value, m.n,
             CAST(CAST(round(e.value * 1000000) AS BIGINT) * m.n - m.s1
                  AS DOUBLE)
               / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE)) AS zn
      FROM events e JOIN m USING (user_id)
      WHERE m.n >= 2 AND m.n * m.s2 > m.s1 * m.s1
    )
    SELECT event_id, user_id, round(value, 6) AS value,
           round(zn * sqrt(CAST(n AS DOUBLE)), 6) AS zscore
    FROM z
    WHERE abs(zn * sqrt(CAST(n AS DOUBLE))) >= 2.5
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity z-score outlier detection — the statistical QA
    filter (sensor spikes, corrupt measurements, bot bursts): events
    whose value sits ≥ 2.5 population standard deviations from their
    user's mean.  EXACT moment arithmetic: values fix to integer
    micro-units, so n, Σx, Σx² are exact int64 under any partitioning
    and the z-score z = (x·n − Σx)/√(n·Σx² − (Σx)²)·√n is a pure
    function of exact integers through IEEE sqrt/divide — the oracle
    replays it bit-for-bit.  Shape: one partially-aggregated moments
    pass per user (three numbers of state per key), broadcast back
    against the events — no window, no sort, two shuffles total at
    any scale.  Degenerate users (single event or zero variance) are
    excluded by construction."""
    e = load_table(spark, sf_dir, "events")
    # Moments in DECIMAL(38,0) (the CC convergence-sum convention):
    # s1**2 for micro-unit values reaches ~1e24 — far past int64, which
    # throws under Spark 4's default ANSI mode. decimal(38,0) keeps the
    # arithmetic EXACT (not float) through the variance term; the
    # oracle mirrors with HUGEINT.
    v_micro = F.round(F.col("value") * 1_000_000).cast("long")
    vm_dec = v_micro.cast("decimal(38,0)")
    m = e.select(
        "user_id", v_micro.alias("vm"), vm_dec.alias("vmd")
    ).groupBy("user_id").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("vmd").alias("s1"),
        F.sum(F.col("vmd") * F.col("vm")).alias("s2"),
    )
    j = e.select("event_id", "user_id", "value", v_micro.alias("vm")).join(
        F.broadcast(m), "user_id"
    )
    nd = F.col("n").cast("decimal(38,0)")
    var_n2 = nd * F.col("s2") - F.col("s1") * F.col("s1")
    zn = (F.col("vm").cast("decimal(38,0)") * F.col("n") - F.col("s1")).cast(
        "double"
    ) / F.sqrt(var_n2.cast("double"))
    z = zn * F.sqrt(F.col("n").cast("double"))
    return (
        j.filter((F.col("n") >= 2) & (var_n2 > F.lit(0)))
        .select(
            "event_id",
            "user_id",
            F.round("value", 6).alias("value"),
            F.round(z, 6).alias("zscore"),
        )
        .filter(F.abs(z) >= 2.5)
    )


@query(
    "ts_sessionize_capped",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) > epoch_us(lag(ts) OVER w) + 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS INT) AS session_id
      FROM marked
    ),
    anchored AS (
      SELECT user_id, ts, event_id, session_id,
             min(epoch_us(ts)) OVER (PARTITION BY user_id, session_id)
               AS start_us
      FROM sess
    )
    SELECT user_id, ts, event_id, session_id,
           CAST((epoch_us(ts) - start_us) // 3600000000 AS INT)
             AS subsession_id,
           make_timestamp(start_us
             + ((epoch_us(ts) - start_us) // 3600000000) * 3600000000)
             AS sub_start
    FROM anchored
    """,
)
def ts_sessionize_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap + duration-cap sessionization (operators/intervals.py
    capped_sessions): 30-minute inactivity gap sessions split into
    1-hour duration-capped sub-sessions anchored at the gap-session
    start — the telemetry convention native ``session_window`` cannot
    express (it knows gaps, not caps).  Two window passes over ONE
    user_id shuffle (Spark reuses the exchange); all time arithmetic
    in exact integer microseconds (unix_micros / epoch_us) so both
    engines floor-divide identical int64s.  Ties on ts break by
    event_id — fully deterministic."""
    from ctgov_ai_etl_spark.operators.intervals import capped_sessions

    # NULL ts carry no event time to sessionize — and Spark orders
    # NULLS FIRST where DuckDB orders NULLS LAST, so leaving them in
    # would silently diverge from the oracle (advisor r8).
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return capped_sessions(
        ev, "user_id", "ts", "event_id", gap_seconds=1800, cap_seconds=3600
    )


@query(
    "anomaly_mad",
    oracle="""
    WITH base AS (
      SELECT event_id, event_type, value,
             CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(vm * 2, 0.5) AS m2
      FROM base GROUP BY event_type
    ),
    dev AS (
      SELECT b.event_id, b.event_type, b.value,
             CAST(b.vm * 2 AS DOUBLE) - m.m2 AS sdev2
      FROM base b JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(abs(sdev2) * 2, 0.5) AS mad4
      FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type, round(d.value, 6) AS value,
           round(2 * d.sdev2 / (1.4826 * m.mad4), 6) AS robust_z
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad4 > 0
      AND abs(2 * d.sdev2 / (1.4826 * m.mad4)) >= 3.5
    """,
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEDIAN/MAD robust outlier detection — the heavy-tail-safe
    sibling of anomaly_zscore (a mean/stddev z-score lets one extreme
    value inflate sigma and mask every other outlier; median and MAD
    have a 50% breakdown point).  robust_z = (x - median) /
    (1.4826 * MAD) >= 3.5, the standard Iglewicz-Hodges cut.

    Exactness: values fix to integer micro-units; medians compute
    over DOUBLED integers so the even-count midpoint (a+b)/2 is an
    exactly-representable integer double — both engines interpolate
    lower + 0.5*(upper-lower) over identical int64s, bit-for-bit.
    Shape: two grouped exact percentiles per event_type (sort within
    the 5 groups — at 100 TB swap F.percentile for approx_percentile
    and loosen the oracle to a bound check) broadcast back against
    the events; no global sort."""
    from ctgov_ai_etl_spark.operators.quality import mad_outliers

    e = load_table(spark, sf_dir, "events")
    flagged = mad_outliers(
        e, "event_type", "value", keep_cols=["event_id"], threshold=3.5
    )
    return flagged.select(
        "event_id",
        "event_type",
        F.round("value", 6).alias("value"),
        F.round("robust_z", 6).alias("robust_z"),
    )


@query(
    "win_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(sum(CAST(round(value * 1e6) AS BIGINT)) OVER w AS DOUBLE)
             / 1e6 AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based RANGE window frame — the trailing-hour sum/count per
    user that a ROWS frame cannot express (rows ≠ time; bursty keys
    put 50 events in a minute, quiet keys one in a day).  The frame
    orders by exact integer microseconds and spans [ts − 1 h, ts]
    inclusive; RANGE semantics make equal-timestamp peers share the
    frame identically in both engines, so no tie-break column is
    needed.  Exact integer-micro sums.  Shape: one user_id shuffle +
    per-key sort, state = the trailing hour's rows per key — the
    standard time-windowed feature layout at any scale."""
    ev = load_table(spark, sf_dir, "events")
    micros = F.round(F.col("value") * 1e6).cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_1h"),
        (F.sum(micros).over(w).cast("double") / F.lit(1e6)).alias("sum_1h"),
    )


@query(
    "win_streak_longest",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INT) AS anchor
      FROM days
    ),
    streaks AS (
      SELECT user_id, min(d) AS streak_start, CAST(count(*) AS BIGINT) AS len
      FROM isl GROUP BY user_id, anchor
    )
    SELECT user_id, len AS longest_streak, streak_start
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY len DESC, streak_start) AS rn
      FROM streaks
    )
    WHERE rn = 1
    """,
)
def win_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LONGEST CONSECUTIVE-DAY STREAK per user — the retention metric
    behind 'day streaks': distinct active days, the date-minus-
    row_number island anchor (consecutive days share an anchor), one
    count per island, deterministic best pick (longest, then
    earliest).  Shape: day-level dedup collapses events before any
    window (the window sees <= 1 row per user-day), then two narrow
    aggregations — per-key state is active DAYS, not events."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "anchor").agg(
        F.min("d").alias("streak_start"),
        F.count("*").cast("long").alias("len"),
    )
    w2 = W.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak"),
            "streak_start",
        )
    )
