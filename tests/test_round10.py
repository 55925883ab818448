"""Round-10 wave: semantic properties the oracle comparison can't
state directly (determinism under repartitioning, reference
recurrences, invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ctgov_ai_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_label_propagation_deterministic_under_partitioning(spark):
    q = load_all()["graph_label_propagation"].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    a = _rows(q(spark, SF), "community", "n_members", "min_node")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _rows(q(spark, SF), "community", "n_members", "min_node")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
    # every community's representative is one of its own members
    for community, _, min_node in a:
        assert min_node >= 0


def test_holt_matches_pure_python_reference(spark):
    q = load_all()["ts_holt_linear"].fn
    out = {r["event_type"]: r for r in q(spark, SF).collect()}
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .filter(F.col("ts").isNotNull())
        .groupBy(
            "event_type",
            (F.unix_micros("ts") - F.pmod(F.unix_micros("ts"), F.lit(86_400_000_000)))
            .alias("day"),
        )
        .agg(F.count("*").alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    for et, pts in series.items():
        l = b = None
        for _, x in sorted(pts):
            xm = x * 1_000_000
            if l is None:
                l, b = xm, 0
            else:
                ln = (xm + l + b) // 2
                b = (ln - l + b) // 2
                l = ln
        assert out[et]["level_micro"] == l
        assert out[et]["trend_micro"] == b
        assert out[et]["forecast7_micro"] == l + 7 * b
        assert out[et]["n_days"] == len(pts)


def test_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    q = load_all()["stat_bootstrap_ci"].fn
    rows1 = _rows(
        q(spark, SF), "event_type", "mean_micro", "ci_lo_micro", "ci_hi_micro"
    )
    rows2 = _rows(
        q(spark, SF), "event_type", "mean_micro", "ci_lo_micro", "ci_hi_micro"
    )
    assert rows1 == rows2  # md5 resampler: identical across runs
    for _, mean, lo, hi in rows1:
        assert lo <= hi
        # m-out-of-n bootstrap means cluster around the sample mean
        assert lo <= mean * 1.5 and hi >= mean * 0.5


def test_kneser_ney_probabilities_bounded(spark):
    q = load_all()["text_bigram_kneser_ney"].fn
    rows = q(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["pkn_ppm"] <= 1_100_000  # ppm, small overshoot ok
        assert 1 <= r["rk"] <= 3


def test_crypto_shred_audit_consistency(spark):
    q = load_all()["gov_crypto_shred"].fn
    rows = q(spark, SF).collect()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    total = ev.count()
    shredded = ev.filter(F.col("user_id") % 17 == 0).count()
    assert sum(r["n_events"] for r in rows) == total
    assert sum(r["n_shredded"] for r in rows) == shredded
    for r in rows:
        assert r["n_tokens"] <= r["n_events"] - r["n_shredded"]


def test_power_iteration_is_unit_scaled_and_stable(spark):
    q = load_all()["emb_pca_power_iteration"].fn
    rows1 = _rows(q(spark, SF), "dim", "eigvec_scaled")
    rows2 = _rows(q(spark, SF), "dim", "eigvec_scaled")
    assert rows1 == rows2
    mags = [abs(v) for _, v in rows1]
    assert max(mags) <= 1_000_000  # normalized to max-abs <= 1e6
    assert max(mags) >= 400_000  # and not collapsed to zero


def test_streaming_holt_equals_batch_twin(spark):
    """The live smoother's latest snapshot must equal the batch
    recurrence over the same rows — streaming-equals-batch for the
    provisional-fold emission contract."""
    reg = load_all()
    batch = _rows(
        reg["ts_holt_linear"].fn(spark, SF),
        "event_type", "n_days", "level_micro", "trend_micro",
        "forecast7_micro",
    )
    stream = _rows(
        reg["stream_run_holt"].fn(spark, SF),
        "event_type", "n_days", "level_micro", "trend_micro",
        "forecast7_micro",
    )
    assert batch == stream


def test_fk_orphans_zero_on_consistent_fixture(spark):
    """The TPC-H-ish fixture is referentially consistent: every edge
    must profile to zero orphans (a nonzero count here would mean
    the profiler itself fabricates violations)."""
    rows = load_all()["dq_fk_orphans"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_orphans"] == 0 and r["orphan_ppm"] == 0
        assert r["n_child"] > 0


def test_seasonal_decompose_components_sum_to_zeroish(spark):
    """Additive seasonal components over a centered moving average
    must roughly cancel: the dow means of the detrended series sum
    near zero relative to series scale."""
    rows = load_all()["ts_seasonal_decompose"].fn(spark, SF).collect()
    assert len(rows) == 7
    total = sum(r["seasonal_x7_cents"] for r in rows)
    scale = max(abs(r["seasonal_x7_cents"]) for r in rows) or 1
    assert abs(total) <= 7 * scale  # cancellation, not blow-up
