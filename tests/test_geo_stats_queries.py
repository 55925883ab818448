"""Round-11 wave: semantic properties the oracle comparison can't
state directly (reference implementations, invariants, monotonicity,
streaming-equals-batch)."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ------------------------------------------------------------ geohash


def _ref_geohash(lat: float, lng: float, chars: int = 5) -> str:
    """Independent reference geohash: classic interval-halving."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lng_lo, lng_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    bit_count = 0
    for _ in range(chars * 5):
        if even:
            mid = (lng_lo + lng_hi) / 2
            if lng >= mid:
                bits = (bits << 1) | 1
                lng_lo = mid
            else:
                bits <<= 1
                lng_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits = (bits << 1) | 1
                lat_lo = mid
            else:
                bits <<= 1
                lat_hi = mid
        even = not even
        bit_count += 1
        if bit_count == 5:
            out.append(alphabet[bits])
            bits, bit_count = 0, 0
    return "".join(out)


def test_geohash_expression_matches_reference(spark):
    """The generated bit-interleave SQL expression equals the classic
    interval-halving geohash on known and random points (incl. the
    Wikipedia example u4pru for 57.64911, 10.40744)."""
    from ctgov_ai_etl_spark.queries.geo import _geohash5_expr

    pts = [
        (57_649_110, 10_407_440),  # wikipedia: u4pru...
        (0, 0),
        (-89_999_999, -179_999_999),
        (89_999_999, 179_999_999),
        (48_858_370, 2_294_480),  # eiffel tower
    ]
    rng = np.random.default_rng(7)
    for _ in range(10):
        pts.append(
            (
                int(rng.integers(-90_000_000, 90_000_000)),
                int(rng.integers(-180_000_000, 180_000_000)),
            )
        )
    rows = spark.createDataFrame(pts, "lat long, lng long").select(
        "lat",
        "lng",
        F.expr(
            "CAST(((lat + 90000000) * 4096 - "
            "pmod((lat + 90000000) * 4096, 180000000)) / 180000000 "
            "AS BIGINT)"
        ).alias("lat_cell"),
        F.expr(
            "CAST(((lng + 180000000) * 8192 - "
            "pmod((lng + 180000000) * 8192, 360000000)) / 360000000 "
            "AS BIGINT)"
        ).alias("lng_cell"),
    )
    got = rows.select(
        "lat", "lng", F.expr(_geohash5_expr("lat_cell", "lng_cell")).alias("gh")
    ).collect()
    assert got[0]["gh"] == "u4pru"
    for r in got:
        assert r["gh"] == _ref_geohash(r["lat"] / 1e6, r["lng"] / 1e6), (
            r["lat"],
            r["lng"],
        )


def test_geo_join_pairs_complete_vs_bruteforce(spark):
    """The 9-cell bucketed epsilon-join finds EXACTLY the brute-force
    pair set (no boundary pair lost, none duplicated)."""
    from ctgov_ai_etl_spark.queries.geo import _geo_points, _GEO_EPS

    q = load_all()["geo_geohash_join"].fn
    got = _rows(q(spark, SF), "a", "b", "cheb_micro")
    pts = {
        r["k"]: (r["lat"], r["lng"])
        for r in _geo_points(spark, SF).filter(F.col("k") <= 2000).collect()
    }
    expect = []
    keys = sorted(pts)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            dlat = abs(pts[a][0] - pts[b][0])
            dlng = abs(pts[a][1] - pts[b][1])
            if dlat <= _GEO_EPS and dlng <= _GEO_EPS:
                expect.append((a, b, max(dlat, dlng)))
    assert got == sorted(expect)


def test_fence_transitions_change_tiles(spark):
    q = load_all()["geo_fence_transitions"].fn
    rows = q(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["from_tile"] != r["to_tile"]
        assert 0 <= r["from_tile"] < 256 and 0 <= r["to_tile"] < 256


def test_stream_geo_fence_equals_batch(spark):
    batch = _rows(
        load_all()["geo_fence_transitions"].fn(spark, SF),
        "user_id",
        "event_id",
        "ts_us",
        "from_tile",
        "to_tile",
    )
    streamed = _rows(
        load_all()["stream_run_geo_fence"].fn(spark, SF),
        "user_id",
        "event_id",
        "ts_us",
        "from_tile",
        "to_tile",
    )
    assert streamed == batch


# ----------------------------------------------------- rank statistics


def _daily(spark):
    from ctgov_ai_etl_spark.queries.analytics import _daily_orders

    rows = _daily_orders(spark, SF).collect()
    rows.sort(key=lambda r: r["day"])
    return (
        np.array([r["x"] for r in rows], dtype=np.int64),
        np.array([r["y"] for r in rows], dtype=np.int64),
    )


def test_kendall_tau_matches_numpy_reference(spark):
    x, y = _daily(spark)
    n = len(x)
    c = d = tx = ty = 0
    for i in range(n):
        dx = np.sign(x[i + 1 :] - x[i])
        dy = np.sign(y[i + 1 :] - y[i])
        c += int(((dx * dy) > 0).sum())
        d += int(((dx * dy) < 0).sum())
        tx += int((dx == 0).sum())
        ty += int((dy == 0).sum())
    row = load_all()["stat_kendall_tau"].fn(spark, SF).first()
    assert (row["n_c"], row["n_d"], row["ties_x"], row["ties_y"]) == (
        c,
        d,
        tx,
        ty,
    )
    npairs = n * (n - 1) // 2
    tau = (c - d) / np.sqrt(
        float(npairs - tx) * float(npairs - ty)
    )
    assert abs(row["tau_b"] - tau) < 1e-6
    assert -1.0 <= row["tau_b"] <= 1.0


def test_theil_sen_median_between_extremes(spark):
    row = load_all()["stat_theil_sen"].fn(spark, SF).first()
    med = row["median_slope_ppm_x2"] / 2
    assert row["min_slope_ppm"] <= med <= row["max_slope_ppm"]
    # reference on the quantized integer slopes (WEEKLY frame since
    # the r11 bench trim — the exact-percentile median is a
    # single-reducer sort, so the pair frame stays small)
    from ctgov_ai_etl_spark.functions.exact import cents, fdiv
    from ctgov_ai_etl_spark.tables import load_table

    wk = (
        load_table(spark, SF, "orders")
        .groupBy(
            fdiv(
                F.unix_micros("o_orderdate"), F.lit(7 * 86_400_000_000)
            ).alias("wk")
        )
        .agg(F.sum(cents("o_totalprice")).cast("long").alias("y"))
        .collect()
    )
    rows = sorted(wk, key=lambda r: r["wk"])
    dd = np.array([r["wk"] for r in rows], dtype=np.int64)
    yy = np.array([r["y"] for r in rows], dtype=np.int64)
    slopes = []
    for i in range(len(dd)):
        num = (yy[i + 1 :] - yy[i]) * 1_000_000
        den = dd[i + 1 :] - dd[i]
        slopes.extend((num - (num % den + den) % den) // den)
    slopes = np.sort(np.array(slopes, dtype=np.int64))
    m = len(slopes)
    ref = (
        slopes[m // 2] * 2
        if m % 2
        else slopes[m // 2 - 1] + slopes[m // 2]
    )
    assert row["median_slope_ppm_x2"] == ref


# -------------------------------------------------- isotonic / stump


def test_isotonic_fit_is_monotone_and_pava_equal(spark):
    rows = sorted(
        load_all()["ml_isotonic_regression"].fn(spark, SF).collect(),
        key=lambda r: r["bucket"],
    )
    iso = [r["iso_rate"] for r in rows]
    assert iso == sorted(iso)  # monotone non-decreasing
    # PAVA reference (pool adjacent violators on float rates)
    pools = [[float(r["hits"]), float(r["n"])] for r in rows]
    out = []
    for p in pools:
        out.append(p)
        while len(out) > 1 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1]:
            b = out.pop()
            out[-1][0] += b[0]
            out[-1][1] += b[1]
    # expand pools back to buckets
    ref = []
    i = 0
    for h, n in out:
        cnt = 0
        total = 0.0
        while total < n - 1e-9:
            total += rows[i + cnt]["n"]
            cnt += 1
        ref.extend([h / n] * cnt)
        i += cnt
    assert len(ref) == len(iso)
    for a, b in zip(iso, ref):
        assert abs(a - b) < 1e-6


def test_decision_stump_never_worse_than_root(spark):
    row = load_all()["ml_decision_stump"].fn(spark, SF).first()
    assert row["weighted_gini"] <= row["root_gini"] + 1e-9
    assert row["n_left"] > 0 and row["n_right"] > 0
    assert 0 <= row["pos_left"] <= row["n_left"]
    assert 0 <= row["pos_right"] <= row["n_right"]


# ------------------------------------------- coreset / sampling / ts


def test_kcenter_matches_numpy_farthest_first(spark):
    rows = sorted(
        load_all()["sample_kcenter_coreset"].fn(spark, SF).collect(),
        key=lambda r: r["round"],
    )
    from ctgov_ai_etl_spark.tables import load_table

    e = (
        load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") < 500)
        .collect()
    )
    ids = np.array([r["vec_id"] for r in e])
    vecs = np.array(
        [[round(float(x) * 1e6) for x in r["embedding"]] for r in e],
        dtype=np.int64,
    )
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    centers = [0]
    mind = ((vecs - vecs[ids == 0][0]) ** 2).sum(axis=1)
    expect = [(0, 0, None)]
    for r in range(1, 8):
        # deterministic: max distance, tie -> smallest id
        best = np.lexsort((ids, -mind))[0]
        expect.append((r, int(ids[best]), int(mind[best])))
        d_new = ((vecs - vecs[best]) ** 2).sum(axis=1)
        mind = np.minimum(mind, d_new)
    got = [(r["round"], r["center_id"], r["radius_sq"]) for r in rows]
    assert got == expect
    radii = [t[2] for t in expect[1:]]
    assert radii == sorted(radii, reverse=True)  # non-increasing


def test_priority_sample_ht_weights_dominate(spark):
    rows = load_all()["sample_priority_weighted"].fn(spark, SF).collect()
    assert len(rows) == 100
    for r in rows:
        assert r["ht_cents"] >= r["w_cents"]


def test_motif_pairs_ranked_and_nonoverlapping(spark):
    rows = sorted(
        load_all()["ts_motif_ssd"].fn(spark, SF).collect(),
        key=lambda r: r["rk"],
    )
    assert len(rows) == 5
    ssds = [r["ssd"] for r in rows]
    assert ssds == sorted(ssds)
    for r in rows:
        assert r["day_b"] - r["day_a"] >= 7  # non-overlapping windows


def test_changepoint_splits_nest(spark):
    rows = {r["segment"]: r for r in load_all()["ts_changepoint_binseg"].fn(spark, SF).collect()}
    assert set(rows) == {"full", "left", "right"}
    assert rows["left"]["split_day"] < rows["full"]["split_day"]
    assert rows["right"]["split_day"] > rows["full"]["split_day"]
    for r in rows.values():
        assert r["score"] >= 0


# ------------------------------------------------- privacy / uuid


def test_t_closeness_bounded(spark):
    rows = load_all()["dq_t_closeness"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["t_emd"] <= 1.0 + 1e-9
        assert r["at_risk"] == (r["t_emd"] > 0.2)


def test_uuid_format_and_determinism(spark):
    q = load_all()["fn_uuid_deterministic"].fn
    rows = {r["doc_id"]: r["uuid3"] for r in q(spark, SF).collect()}
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    for u in rows.values():
        assert pat.match(u), u
    rows2 = {r["doc_id"]: r["uuid3"] for r in q(spark, SF).collect()}
    assert rows == rows2
    assert len(set(rows.values())) == len(rows)  # content-distinct


# ----------------------------------------------- wave 4: eval / bmp


def test_roc_auc_bounded_and_monotone(spark):
    rows = sorted(
        load_all()["ml_roc_curve"].fn(spark, SF).collect(),
        key=lambda r: -r["threshold_bucket"],
    )
    assert rows
    auc = rows[0]["auc"]
    assert 0.0 <= auc <= 1.0
    tprs = [r["tpr_ppm"] for r in rows]
    fprs = [r["fpr_ppm"] for r in rows]
    # cumulating in descending threshold order: both rates monotone up
    assert tprs == sorted(tprs) and fprs == sorted(fprs)
    assert tprs[-1] == 1_000_000 and fprs[-1] == 1_000_000
    for r in rows:
        assert all(r["auc"] == auc for r in rows)


def test_calibration_ece_consistent(spark):
    rows = load_all()["ml_calibration_ece"].fn(spark, SF).collect()
    assert rows
    n = sum(r["n"] for r in rows)
    # the reported ECE equals the direct weighted mean of the gaps
    num = sum(r["n"] * r["gap_ppm"] for r in rows)
    ece = (num - (num % n + n) % n) // n
    for r in rows:
        assert r["ece_ppm"] == ece
        assert 0 <= r["acc_ppm"] <= 1_000_000
        assert 0 <= r["conf_ppm"] <= 1_000_000


def test_power_mde_shrinks_with_n(spark):
    rows = sorted(
        load_all()["stat_power_mde"].fn(spark, SF).collect(),
        key=lambda r: r["n_per_arm"],
    )
    mdes = [r["mde_dollars"] for r in rows]
    assert mdes == sorted(mdes, reverse=True)  # more n, smaller MDE
    # 10x the arm shrinks MDE by ~sqrt(10)
    assert abs(mdes[0] / mdes[1] - 10 ** 0.5) < 1e-3


def test_stream_priority_sample_equals_batch_semantics(spark):
    """The merged sharded-heap sample must equal the one-shot batch
    computation over the same events (mergeability)."""
    import hashlib

    rows = load_all()["stream_run_priority_sample"].fn(spark, SF).collect()
    assert len(rows) == 100
    from ctgov_ai_etl_spark.tables import load_table

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_id", F.round(F.col("value") * 100).cast("long").alias("w"))
        .collect()
    )
    pri = []
    for r in ev:
        u = int(hashlib.md5(f"pri:{r['event_id']}".encode()).hexdigest()[:15], 16) + 1
        pri.append((float(r["w"]) * 1152921504606846976.0 / u, r["event_id"], r["w"]))
    pri.sort(key=lambda t: (-t[0], t[1]))
    expect_ids = [t[1] for t in pri[:100]]
    assert sorted(r["event_id"] for r in rows) == sorted(expect_ids)
    tau = pri[100][0]
    for r in rows:
        w = dict((t[1], t[2]) for t in pri[:100])[r["event_id"]]
        import math

        assert r["ht_cents"] == math.floor(max(float(w), tau))


def test_bmp_codec_edges():
    from ctgov_ai_etl_spark.functions.imagecodec import (
        decode_bmp,
        decode_image_bytes,
        encode_bmp,
    )

    # width 5: stride 15 needs 1 pad byte — padding must not leak
    px = bytes(range(75)) + bytes(75)
    bmp = encode_bmp(5, 10, px[: 5 * 10 * 3])
    w, h, s, n = decode_bmp(bmp)
    assert (w, h, n) == (5, 10, 150)
    assert s == sum(px[:150])
    assert decode_image_bytes(bmp)[:2] == (5, 10)
    import pytest as _pt

    with _pt.raises(ValueError):
        decode_bmp(b"BMshort")
    with _pt.raises(NotImplementedError):
        # 8-bit BMP is outside the stdlib seam
        bad = bytearray(bmp)
        bad[28] = 8
        decode_bmp(bytes(bad))


# --------------------------------------------- wave 6: eval stats


def test_cohens_kappa_bounded_and_shared(spark):
    rows = load_all()["stat_cohens_kappa"].fn(spark, SF).collect()
    assert rows
    kappas = {r["kappa"] for r in rows}
    assert len(kappas) == 1  # one statistic, shared across the matrix
    k = kappas.pop()
    assert -1.0 <= k <= 1.0
    # B copies A 70% of the time: agreement must beat chance
    assert k > 0.3


def test_bradley_terry_strengths_normalized(spark):
    rows = load_all()["ml_bradley_terry"].fn(spark, SF).collect()
    assert len(rows) == 5
    total = sum(r["strength"] for r in rows)
    assert abs(total - 1.0) < 1e-4
    for r in rows:
        assert r["strength"] > 0
        assert r["wins"] >= 0
