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
