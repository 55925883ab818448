"""Round-12 continuation wave: pure-Python reference replays and
invariants for the blocklist gate, n-gram novelty, DSIR weights,
time-series CV, personalized PageRank, boosted stumps, and the
exact-integer point-in-polygon test."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ctgov_ai_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


# -------------------------------------------------- blocklist gate


def test_blocklist_counts_distinct_terms(spark):
    from ctgov_ai_etl_spark.queries.semantic import (
        _BLOCKLIST_MIN_HITS,
        _BLOCKLIST_TERMS,
    )

    reg = load_all()
    rows = {
        r["doc_id"]: r
        for r in reg["text_blocklist_filter"].fn(spark, SF).collect()
    }
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert set(rows) == set(docs)  # clean docs kept with n_hit = 0
    for doc_id, text in docs.items():
        expect = len(set(text.split()) & set(_BLOCKLIST_TERMS))
        assert rows[doc_id]["n_hit"] == expect
        assert rows[doc_id]["blocked"] == (expect >= _BLOCKLIST_MIN_HITS)


def test_blocklist_stream_twin_matches_batch(spark):
    reg = load_all()
    batch = {
        tuple(r)
        for r in reg["text_blocklist_filter"].fn(spark, SF).collect()
    }
    stream = {
        tuple(r) for r in reg["stream_run_blocklist"].fn(spark, SF).collect()
    }
    assert batch == stream


# ------------------------------------------------- bigram novelty


def test_ngram_novelty_reference_replay(spark):
    reg = load_all()
    rows = {
        r["doc_id"]: r for r in reg["text_ngram_novelty"].fn(spark, SF).collect()
    }
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    )
    first: dict[str, int] = {}
    per_doc: dict[int, set[str]] = {}
    for doc_id, text in docs:
        toks = text.split()
        bgs = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
        per_doc[doc_id] = bgs
        for bg in bgs:
            first.setdefault(bg, doc_id)
    for doc_id, bgs in per_doc.items():
        if not bgs:
            assert doc_id not in rows
            continue
        novel = sum(1 for bg in bgs if first[bg] == doc_id)
        r = rows[doc_id]
        assert r["n_bigrams"] == len(bgs)
        assert r["n_novel"] == novel
        assert r["novelty_ppm"] == novel * 1_000_000 // len(bgs)
    # the earliest document is by construction fully novel
    first_doc = docs[0][0]
    assert rows[first_doc]["novelty_ppm"] == 1_000_000


# ---------------------------------------------------- DSIR weights


def test_dsir_targets_rank_higher(spark):
    """The mean log-importance weight of target-language (en)
    documents must exceed the non-target mean (the defining DSIR
    property), and the top-k output is sorted desc with doc_id
    tie-break."""
    reg = load_all()
    out = reg["sample_dsir_importance"].fn(spark, SF).collect()
    assert 0 < len(out) <= 50
    keys = [(-r["log_w_micro"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)
    assert sum(1 for r in out if r["lang"] == "en") > len(out) // 2


# ------------------------------------------------- time-series CV


def test_tscv_growing_window(spark):
    reg = load_all()
    rows = sorted(
        reg["split_time_series_cv"].fn(spark, SF).collect(),
        key=lambda r: r["fold"],
    )
    assert [r["fold"] for r in rows] == [1, 2, 3, 4]
    n_train = [r["n_train"] for r in rows]
    assert n_train == sorted(n_train)  # growing window
    cents = [r["train_cents"] for r in rows]
    assert cents == sorted(cents)
    # each fold's train grows by exactly the previous fold's test
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_train"] == prev["n_train"] + prev["n_test"]


# ------------------------------------------ personalized PageRank


def _ppr_reference(edges, seeds, iters=3, d=85, scale=1_000_000):
    nodes = {n for e in edges for n in e}
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (100 - d) * scale // 100
    r = {n: (scale if n in seeds else 0) for n in nodes}
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for s, t in edges:
            m[t] += r[s] // outdeg[s]
        r = {
            n: (base if n in seeds else 0) + d * m[n] // 100 for n in nodes
        }
    return r


def test_personalized_pagerank_hand_graph(spark):
    from ctgov_ai_etl_spark.operators.graph import personalized_pagerank

    random.seed(7)
    edges = list(
        {
            (random.randrange(12), random.randrange(12))
            for _ in range(40)
        }
    )
    edges = [(s, t) for s, t in edges if s != t]
    seeds = {n for n in range(12) if n % 3 == 0}
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["rank_micro"]
        for r in personalized_pagerank(
            df, lambda n: n % 3 == F.lit(0), iters=3
        ).collect()
    }
    want = _ppr_reference(edges, seeds)
    assert got == want


def test_personalized_pagerank_unreachable_is_zero(spark):
    """A node with no seed-reachable in-path and no seed membership
    must score exactly 0 (integer arithmetic, not epsilon)."""
    from ctgov_ai_etl_spark.operators.graph import personalized_pagerank

    # seed 0 -> 1 -> 2; island 7 -> 8 disconnected from the seed
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (7, 8)], ["src", "dst"]
    )
    got = {
        r["node"]: r["rank_micro"]
        for r in personalized_pagerank(
            df, lambda n: n == F.lit(0), iters=3
        ).collect()
    }
    assert got[7] == 0 and got[8] == 0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0


# ------------------------------------------------- boosted stumps


def _best_stump(pairs):
    """Brute-force max of sum_l^2/n_l + sum_r^2/n_r over thresholds,
    (score desc, bucket asc) tie-break — the query's argmax rule."""
    from collections import defaultdict

    h = defaultdict(lambda: [0, 0])
    for f, v in pairs:
        h[f][0] += 1
        h[f][1] += v
    ks = sorted(h)
    nt = sum(n for n, _ in h.values())
    st = sum(s for _, s in h.values())
    best = None
    nl = sl = 0
    for k in ks:
        nl += h[k][0]
        sl += h[k][1]
        if nl == nt:
            break
        score = sl * sl / nl + (st - sl) * (st - sl) / (nt - nl)
        cand = (-score, k)
        if best is None or cand < best:
            best = cand
    return best[1]


def test_gbdt_stump_matches_bruteforce(spark):
    # check the real query's round-1 split on fixture data against a
    # brute-force SSE-equivalent search with the same tie-break
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    fixture_pairs = [
        (int(r["l_quantity"]), round(r["l_extendedprice"] * 100) * 1000)
        for r in li.select("l_quantity", "l_extendedprice").collect()
    ]
    reg = load_all()
    rows = {r["round"]: r for r in reg["ml_gbdt_stumps"].fn(spark, SF).collect()}
    assert rows[1]["split_at"] == _best_stump(fixture_pairs)
    # residual invariant: round-2 leaf means must bracket zero or be
    # small relative to round-1 leaf spread (residuals are centered
    # per leaf up to floor rounding)
    r1 = rows[1]
    assert r1["n_left"] + r1["n_right"] == len(fixture_pairs)
    r2 = rows[2]
    spread1 = abs(r1["mean_right_milli"] - r1["mean_left_milli"])
    assert abs(r2["mean_left_milli"]) < spread1
    assert abs(r2["mean_right_milli"]) < spread1


# -------------------------------------------------- point-in-polygon


def _ray_cast(px, py, ring):
    n = len(ring)
    c = 0
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if y1 == y2:
            continue
        if y1 < y2 and y1 <= py < y2:
            if (px - x1) * (y2 - y1) < (py - y1) * (x2 - x1):
                c += 1
        elif y2 < y1 and y2 <= py < y1:
            if (px - x1) * (y2 - y1) > (py - y1) * (x2 - x1):
                c += 1
    return c % 2 == 1


def test_polygon_rings_are_simple():
    from ctgov_ai_etl_spark.queries.geo import _POLYGONS

    def cross(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (
            q[0] - o[0]
        )

    for ring in _POLYGONS.values():
        n = len(ring)
        segs = [(ring[i], ring[(i + 1) % n]) for i in range(n)]
        for i in range(n):
            for j in range(i + 2, n):
                if i == 0 and j == n - 1:
                    continue  # adjacent through the wrap
                a, b = segs[i]
                c, d = segs[j]
                d1, d2 = cross(c, d, a), cross(c, d, b)
                d3, d4 = cross(a, b, c), cross(a, b, d)
                assert not (
                    (d1 > 0) != (d2 > 0) and (d3 > 0) != (d4 > 0)
                ), "polygon ring self-intersects"


def test_polygon_contains_reference_replay(spark):
    from ctgov_ai_etl_spark.queries.geo import (
        _POLYGONS,
        _crossings_expr,
        _geo_points,
    )

    pts = _geo_points(spark, SF).collect()
    for name, ring in _POLYGONS.items():
        got = {
            r["k"]
            for r in _geo_points(spark, SF)
            .filter(
                F.expr(_crossings_expr("lng", "lat", ring)) % 2 == 1
            )
            .collect()
        }
        want = {
            r["k"] for r in pts if _ray_cast(r["lng"], r["lat"], ring)
        }
        assert got == want
        assert want  # fixture polygons actually contain points


# ------------------------------------------------------ banded DTW


def _dtw_ref(a, b, band):
    import math

    n = len(a)
    INF = math.inf
    c = {}
    for i in range(1, n + 1):
        for j in range(max(1, i - band), min(n, i + band) + 1):
            d = abs(a[i - 1] - b[j - 1])
            if i == 1 and j == 1:
                c[(i, j)] = d
                continue
            best = min(
                c.get((i - 1, j - 1), INF),
                c.get((i - 1, j), INF),
                c.get((i, j - 1), INF),
            )
            c[(i, j)] = d + best
    return c[(n, n)]


def test_dtw_cells_match_reference(spark):
    from ctgov_ai_etl_spark.queries.analytics import (
        _DTW_BAND,
        _DTW_N,
        _dtw_cells,
    )

    random.seed(3)
    rows = []
    for trial in range(20):
        a = [random.randrange(0, 10_000) for _ in range(_DTW_N)]
        b = [random.randrange(0, 10_000) for _ in range(_DTW_N)]
        rows.append((trial, *a, *b))
    cols = (
        ["trial"]
        + [f"a{k}" for k in range(1, _DTW_N + 1)]
        + [f"b{k}" for k in range(1, _DTW_N + 1)]
    )
    df = spark.createDataFrame(rows, cols)
    for col, expr in _dtw_cells():
        df = df.withColumn(col, F.expr(expr))
    got = {
        r["trial"]: r[f"c_{_DTW_N}_{_DTW_N}"] for r in df.collect()
    }
    for trial, *rest in rows:
        a, b = rest[:_DTW_N], rest[_DTW_N:]
        assert got[trial] == _dtw_ref(a, b, _DTW_BAND)


def test_dtw_identical_series_zero(spark):
    from ctgov_ai_etl_spark.queries.analytics import _DTW_N, _dtw_cells

    vals = [((k * 37) % 11) * 100 for k in range(_DTW_N)]
    df = spark.createDataFrame(
        [tuple(vals + vals)],
        [f"a{k}" for k in range(1, _DTW_N + 1)]
        + [f"b{k}" for k in range(1, _DTW_N + 1)],
    )
    for col, expr in _dtw_cells():
        df = df.withColumn(col, F.expr(expr))
    assert df.collect()[0][f"c_{_DTW_N}_{_DTW_N}"] == 0


# ------------------------------------------------- entropy profile


def test_entropy_profile_bounds(spark):
    import math

    reg = load_all()
    rows = {r["col"]: r for r in reg["dq_entropy_profile"].fn(spark, SF).collect()}
    assert set(rows) == {"o_orderstatus", "o_orderpriority", "o_orderyear"}
    for r in rows.values():
        # 0 <= H <= ln(n_distinct) (+1 micro for the per-term rounding)
        assert -2 <= r["entropy_micro"] <= math.log(r["n_distinct"]) * 1e6 + 2
        assert 0 < r["max_share_ppm"] <= 1_000_000
    # uniform-ish year column must carry more entropy than status
    assert (
        rows["o_orderyear"]["entropy_micro"]
        > rows["o_orderstatus"]["entropy_micro"]
    )


# ------------------------------------------- streaming DSIR gate


def test_dsir_gate_admits_nonnegative_only(spark):
    reg = load_all()
    out = reg["stream_run_dsir_gate"].fn(spark, SF).collect()
    assert out
    assert all(r["log_w_micro"] >= 0 for r in out)
    # the target language's ADMISSION RATE must strictly beat every
    # other language's (the synthetic corpus shares one vocabulary,
    # so absolute separation is mild — the rate ordering is the
    # robust DSIR property)
    langs = dict(
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    )
    from collections import Counter

    admitted = Counter(langs[r["doc_id"]] for r in out)
    total = Counter(langs.values())
    rates = {lg: admitted.get(lg, 0) / total[lg] for lg in total}
    assert all(rates["en"] > v for lg, v in rates.items() if lg != "en")


# --------------------------------------- Markov removal attribution


def test_markov_removal_invariants(spark):
    reg = load_all()
    rows = reg["attribution_markov_removal"].fn(spark, SF).collect()
    assert len(rows) == 4
    v_full = rows[0]["v_full_ppm"]
    assert all(r["v_full_ppm"] == v_full for r in rows)
    assert 0 < v_full <= 1_000_000
    for r in rows:
        # removing a channel can only lose conversion probability
        assert 0 <= r["v_removed_ppm"] <= v_full
        assert 0 <= r["removal_ppm"] <= 1_000_000
    # credit shares sum to 1e6 up to floor-division slack (< 4 ppm)
    total_share = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - 4 <= total_share <= 1_000_000


def test_markov_chain_algebra_hand_case(spark):
    """2-channel hand chain: start -> a (100%), a -> conv (50%) /
    a -> b (50%), b -> conv (100%).  v(start) at any horizon >= 2 is
    1.0; removing b drops it to 0.5; removing a to 0."""
    from ctgov_ai_etl_spark.queries.analytics import _mkv_horizon_exprs

    # build the pivot frame by hand with only click/view active
    # (click = a, view = b); all other probabilities 0
    cols = {}
    from ctgov_ai_etl_spark.queries.analytics import (
        _MKV_CHANNELS,
        _MKV_STATES,
    )

    for s in _MKV_STATES:
        for t in tuple(_MKV_CHANNELS) + ("conv",):
            cols[f"p_{s}_{t}"] = 0
    cols["p_start_click"] = 1_000_000
    cols["p_click_conv"] = 500_000
    cols["p_click_view"] = 500_000
    cols["p_view_conv"] = 1_000_000
    df = spark.createDataFrame([tuple(cols.values())], list(cols))
    for h in range(7):
        for col, expr in _mkv_horizon_exprs(h, "div"):
            df = df.withColumn(col, F.expr(expr))
    r = df.collect()[0]
    assert r["v6_start_full"] == 1_000_000
    assert r["v6_start_rm_view"] == 500_000
    assert r["v6_start_rm_click"] == 0


# -------------------------------------- histogram logistic steps


def test_logistic_histogram_first_step_rational(spark):
    """At w = 0 every sigmoid is exactly 0.5, so grad0 must equal
    (N/2 - P)*1e6 computed from the raw fixture counts; and the step
    must move w1 toward separating the classes (nonzero unless the
    data is perfectly balanced per bucket)."""
    reg = load_all()
    rows = {r["step"]: r for r in reg["ml_logistic_histogram"].fn(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet")
    n = o.count()
    p = o.filter(F.col("o_orderstatus") == "F").count()
    # n*500000 - p*1000000, summed over buckets == global identity
    assert rows[1]["grad0"] == n * 500_000 - p * 1_000_000
    assert rows[2]["step"] == 2
    # gradient magnitude must shrink after the step in the bias
    # coordinate (fixed-step descent on a convex loss)
    assert abs(rows[2]["grad0"]) <= abs(rows[1]["grad0"])


# ------------------------------------------------------- WOE / IV


def test_woe_iv_reference_replay(spark):
    import math

    reg = load_all()
    rows = {r["grp"]: r for r in reg["feature_woe_iv"].fn(spark, SF).collect()}
    o = spark.read.parquet(f"{SF}/orders.parquet").collect()
    from collections import Counter

    pos = Counter()
    neg = Counter()
    for r in o:
        if r["o_orderstatus"] == "F":
            pos[r["o_orderpriority"]] += 1
        else:
            neg[r["o_orderpriority"]] += 1
    tp, tn = sum(pos.values()), sum(neg.values())
    assert set(rows) == set(pos) | set(neg)
    iv_total = 0
    for g, r in rows.items():
        assert r["pos"] == pos[g] and r["neg"] == neg[g]
        woe = round(math.log((pos[g] * tn) / (neg[g] * tp)) * 1e6)
        assert r["woe_micro"] == woe
        assert r["iv_contrib_micro"] >= -1  # (share diff)·WOE >= 0 - floor slack
        iv_total += r["iv_contrib_micro"]
    assert iv_total >= 0


# ------------------------------------------------ permutation test


def test_permutation_test_bounds(spark):
    reg = load_all()
    r = reg["stat_permutation_test"].fn(spark, SF).collect()[0]
    assert r["n_perms"] == 40
    assert 0 <= r["n_ge"] <= 40
    assert r["p_ppm"] == r["n_ge"] * 1_000_000 // 40
    # the null is TRUE by construction (user parity is arbitrary), so
    # the observed stat should not be an extreme outlier: p > 0
    # would be flaky to assert exactly; assert the statistic is finite
    assert r["obs_diff_micro"] is not None


# -------------------------------------------------------- Zipf fit


def test_zipf_slope_negative_and_replayed(spark):
    import math
    from collections import Counter

    reg = load_all()
    r = reg["text_zipf_slope"].fn(spark, SF).collect()[0]
    # pure-python replay (the synthetic vocabulary is smaller than
    # the top-k cap, so n_tokens == |vocab|)
    cnt = Counter()
    for row in spark.read.parquet(f"{SF}/documents.parquet").collect():
        cnt.update(row["text"].split())
    assert r["n_tokens"] == min(100, len(cnt))
    assert r["slope_milli"] < 0  # frequencies decay in rank
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    pts = [
        (round(math.log(i + 1) * 1000), round(math.log(n) * 1000))
        for i, (_, n) in enumerate(top)
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = k * sxx - sx * sx
    # floor division semantics match python's // for positive den
    assert r["slope_milli"] == (k * sxy - sx * sy) * 1000 // den


# ----------------------------------------------- IVF recall eval


def test_ivf_recall_eval_invariants(spark):
    reg = load_all()
    rows = reg["sim_ivf_recall_eval"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_exact"] == 5
        assert 0 <= r["n_hit"] <= r["n_exact"]
        assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // r["n_exact"]
    # the 6/16-probe IVF should find at least half the true
    # neighbors on average (the trained-variant floor tests pin more)
    assert sum(r["n_hit"] for r in rows) * 2 >= sum(
        r["n_exact"] for r in rows
    )


# --------------------------------------------------- McNemar test


def test_mcnemar_reference_replay(spark):
    reg = load_all()
    r = reg["stat_mcnemar"].fn(spark, SF).collect()[0]
    b = c = 0
    for row in spark.read.parquet(f"{SF}/orders.parquet").collect():
        truth = row["o_orderstatus"] == "F"
        a_ok = (row["o_totalprice"] > 150000) == truth
        b_ok = (row["o_orderpriority"] in ("1-URGENT", "2-HIGH")) == truth
        if a_ok and not b_ok:
            b += 1
        if b_ok and not a_ok:
            c += 1
    assert (r["b"], r["c"]) == (b, c)
    assert r["chi2_micro"] == (b - c) * (b - c) * 1_000_000 // (b + c)
    assert r["chi2_cc_micro"] <= r["chi2_micro"]


# ------------------------------------------------- audio DFT bins


def test_audio_dft8_reference_replay(spark):
    import hashlib

    from ctgov_ai_etl_spark.operators.multimodal import DFT8_COS, DFT8_SIN

    reg = load_all()
    rows = reg["mm_audio_dft8"].fn(spark, SF).collect()
    got = {
        (r["doc_id"], r["channel"], r["bin"]): r["energy"] for r in rows
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20).collect()
    for row in docs:
        dig = hashlib.md5(row["text"].encode()).digest()
        ch = 1 + dig[0] % 2
        v = dig[2]
        for c in range(ch):
            x = [
                ((v * 131 + (k * ch + c) * 7919) % 65536) - 32768
                for k in range(8)
            ]
            for m in range(5):
                re = sum(x[k] * DFT8_COS[m][k] for k in range(8))
                im = sum(x[k] * DFT8_SIN[m][k] for k in range(8))
                assert got[(row["doc_id"], c, m)] == re * re + im * im
    # DC bin: energy is exactly (1000·Σx)² — sin row is all zero
    assert all(DFT8_SIN[0][k] == 0 for k in range(8))


# ------------------------------------------------ one-way ANOVA F


def test_anova_f_reference_replay(spark):
    from collections import defaultdict

    reg = load_all()
    r = reg["stat_anova_f"].fn(spark, SF).collect()[0]
    groups = defaultdict(list)
    for row in spark.read.parquet(f"{SF}/orders.parquet").collect():
        v = round(row["o_totalprice"] * 100) // 100
        groups[row["o_orderpriority"]].append(v)
    k = len(groups)
    nt = sum(len(g) for g in groups.values())
    st = sum(sum(g) for g in groups.values())
    sum_sb = sum(round(sum(g) * sum(g) / len(g)) for g in groups.values())
    ssw = sum(
        sum(x * x for x in g) - round(sum(g) * sum(g) / len(g))
        for g in groups.values()
    )
    ssb = sum_sb - round(st * st / nt)
    assert (r["k"], r["n"]) == (k, nt)
    assert r["ssb"] == ssb
    assert r["ssw"] == ssw
    assert r["f_micro"] == round(
        (ssb / (k - 1)) / (ssw / (nt - k)) * 1_000_000
    )
    assert r["f_micro"] >= 0


# ---------------------------------------------- LSH recall audit


def test_lsh_recall_eval_bounds(spark):
    reg = load_all()
    r = reg["dedup_lsh_recall_eval"].fn(spark, SF).collect()[0]
    assert r["n_true"] > 0
    assert 0 <= r["n_hit"] <= min(r["n_true"], r["n_candidates"])
    assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // r["n_true"]
    # at the S-curve knee the 64x8 banding should catch most >=0.8
    # true pairs
    assert r["recall_ppm"] >= 600_000


# ------------------------------------------------- random walks


def test_random_walks_reference_replay(spark):
    import hashlib
    from collections import defaultdict

    reg = load_all()
    rows = reg["graph_random_walks"].fn(spark, SF).collect()
    orders = spark.read.parquet(f"{SF}/orders.parquet").collect()
    edges = sorted(
        {
            (r["o_orderkey"] % 2000, (r["o_orderkey"] // 7 + r["o_custkey"]) % 2000)
            for r in orders
            if r["o_orderkey"] < 6000
        }
    )
    adj = defaultdict(list)
    for s, t in edges:
        adj[s].append(t)
    for s in adj:
        adj[s].sort()

    def draw(walk, t, node):
        h = hashlib.md5(f"walk:{walk}:{t}:{node}".encode()).hexdigest()
        return int(h[:15], 16) % len(adj[node])

    got = {(r["start"], r["walk"]): (r["n1"], r["n2"], r["n3"]) for r in rows}
    assert len(got) == 2 * len(adj)
    for start in adj:
        for w in (1, 2):
            node, path = start, []
            for t in (1, 2, 3):
                node = (
                    adj[node][draw(w, t, node)]
                    if node is not None and node in adj
                    else None
                )
                path.append(node)
            assert got[(start, w)] == tuple(path)


# ---------------------------------------------------- grid DBSCAN


def test_dbscan_reference_replay(spark):
    """Pure-python DBSCAN with the same deterministic rules must
    match exactly (roles AND component labels)."""
    from collections import defaultdict

    from ctgov_ai_etl_spark.queries.geo import (
        _DBSCAN_CAP,
        _DBSCAN_EPS,
        _DBSCAN_MINPTS,
        _geo_points,
    )

    reg = load_all()
    rows = {r["k"]: r for r in reg["cluster_dbscan_grid"].fn(spark, SF).collect()}
    pts = {
        r["k"]: (r["lat"], r["lng"])
        for r in _geo_points(spark, SF).collect()
        if r["k"] <= _DBSCAN_CAP
    }
    nbrs = defaultdict(set)
    ks = sorted(pts)
    for i, a in enumerate(ks):
        for b in ks[i + 1 :]:
            dlat = pts[a][0] - pts[b][0]
            dlng = pts[a][1] - pts[b][1]
            if dlat * dlat + dlng * dlng <= _DBSCAN_EPS * _DBSCAN_EPS:
                nbrs[a].add(b)
                nbrs[b].add(a)
    core = {k for k in pts if len(nbrs[k]) + 1 >= _DBSCAN_MINPTS}
    # components over core subgraph (min label)
    comp = {}
    for k in sorted(core):
        if k in comp:
            continue
        stack, seen = [k], {k}
        while stack:
            u = stack.pop()
            for v in nbrs[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        for u in seen:
            comp[u] = min(seen)
    assert set(rows) == set(pts)
    for k in pts:
        r = rows[k]
        assert r["n_neighbors"] == len(nbrs[k])
        if k in core:
            assert r["role"] == "core" and r["component"] == comp[k]
        else:
            cands = [comp[v] for v in nbrs[k] if v in core]
            if cands:
                assert r["role"] == "border"
                assert r["component"] == min(cands)
            else:
                assert r["role"] == "noise" and r["component"] is None
    assert core, "fixture eps/minPts must produce cores"
    assert any(rows[k]["role"] == "noise" for k in pts)


# ------------------------------------------- Matryoshka / Arrow UDF


def test_matryoshka_recall_bounds(spark):
    reg = load_all()
    rows = reg["emb_matryoshka_recall"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_full"] == 5
        assert 0 <= r["n_hit"] <= 5
        assert r["recall_ppm"] == r["n_hit"] * 1_000_000 // 5
    # a 16/64 prefix keeps SOME signal on random-ish embeddings
    assert sum(r["n_hit"] for r in rows) > 0


def test_arrow_udf_matches_pickled_twin(spark):
    reg = load_all()
    a = {tuple(r) for r in reg["udf_arrow_scalar"].fn(spark, SF).collect()}
    b = {tuple(r) for r in reg["udf_python_scalar"].fn(spark, SF).collect()}
    assert a == b


# ----------------------------------------- drawdown / Neyman design


def test_max_drawdown_reference_replay(spark):
    from collections import defaultdict

    reg = load_all()
    rows = {r["user_id"]: r for r in reg["ts_max_drawdown"].fn(spark, SF).collect()}
    ev = defaultdict(list)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        if r["ts"] is None:
            continue
        c = round(r["value"] * 100)
        ev[r["user_id"]].append(
            (r["ts"], r["event_id"], c if r["event_type"] == "purchase" else -c)
        )
    for uid, evs in ev.items():
        evs.sort()
        bal = peak = 0
        best = (0, None)
        first = True
        for _, eid, d in evs:
            bal += d
            peak = bal if first else max(peak, bal)
            first = False
            gap = peak - bal
            if best[1] is None or gap > best[0]:
                best = (gap, eid)
        r = rows[uid]
        assert r["max_drawdown_cents"] == best[0]
        if best[0] > 0:
            assert r["trough_event_id"] == best[1]


def test_neyman_allocation_properties(spark):
    reg = load_all()
    rows = reg["sample_neyman_allocation"].fn(spark, SF).collect()
    assert len(rows) == 5
    total_target = sum(r["n_target"] for r in rows)
    assert total_target <= 500  # floors never overshoot the budget
    assert total_target >= 490
    for r in rows:
        assert r["sd_milli"] > 0
        assert 0 <= r["n_target"] <= r["nh"]
        # md5 admission realizes the rate within binomial noise
        rate = r["n_target"] / r["nh"]
        import math

        tol = 4 * math.sqrt(max(rate * (1 - rate) * r["nh"], 1.0)) + 1
        assert abs(r["n_sampled"] - r["n_target"]) <= tol


def test_skipgram_pairs_reference_replay(spark):
    from collections import Counter

    reg = load_all()
    got = {
        (r["center"], r["context"]): r["n"]
        for r in reg["graph_walk_skipgram_pairs"].fn(spark, SF).collect()
    }
    walks = reg["graph_random_walks"].fn(spark, SF).collect()
    cnt = Counter()
    for w in walks:
        seq = [w["start"], w["n1"], w["n2"], w["n3"]]
        for i in range(4):
            for j in range(4):
                if i != j and abs(i - j) <= 2:
                    if seq[i] is not None and seq[j] is not None:
                        cnt[(seq[i], seq[j])] += 1
    want = {k: v for k, v in cnt.items() if v > 1}
    assert got == want


def test_offpolicy_ips_reference_replay(spark):
    from collections import defaultdict

    reg = load_all()
    rows = {r["ctx"]: r for r in reg["ml_offpolicy_ips"].fn(spark, SF).collect()}
    policy = {0: "click", 1: "view", 2: "signup", 3: "purchase"}
    ev = []
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        if r["ts"] is None:
            continue
        day = int(r["ts"].timestamp() * 1_000_000) // 86_400_000_000
        ev.append((r["user_id"] % 4, r["event_type"], round(r["value"] * 100), day))
    day0 = min(e[3] for e in ev)
    n_ca = defaultdict(int)
    n_c = defaultdict(int)
    for c, a, _, d in ev:
        if d < day0 + 15:
            n_ca[(c, a)] += 1
            n_c[c] += 1
    for c in rows:
        sw = n2 = nm = 0
        for cc, a, r, d in ev:
            if cc != c or d < day0 + 15:
                continue
            n2 += 1
            if a == policy[c]:
                p = n_ca[(c, a)] * 1_000_000 // n_c[c]
                sw += r * 1_000_000 // p
                nm += 1
        row = rows[c]
        assert row["pi_action"] == policy[c]
        assert row["n_log"] == n2 and row["n_match"] == nm
        assert row["v_ips_cents"] == sw // n2


# --------------------------- property tests (random instances)


def test_polygon_raycast_random_convex(spark):
    """Random star-shaped polygons (angle-sorting random vertices
    around their centroid always yields a simple ring): the
    shared-dialect crossing expression must agree with the
    pure-python ray-cast reference on random integer probes."""
    import math

    from ctgov_ai_etl_spark.queries.geo import _crossings_expr

    rng = random.Random(23)
    for trial in range(6):
        n = rng.randrange(3, 8)
        pts = [
            (rng.randrange(-80, 81) * 1_000_000, rng.randrange(-80, 81) * 1_000_000)
            for _ in range(n)
        ]
        cx = sum(p[0] for p in pts) / n
        cy = sum(p[1] for p in pts) / n
        ring = tuple(
            sorted(set(pts), key=lambda p: math.atan2(p[1] - cy, p[0] - cx))
        )
        if len(ring) < 3:
            continue
        probes = [
            (rng.randrange(-90, 91) * 1_000_000, rng.randrange(-85, 86) * 1_000_000)
            for _ in range(40)
        ]
        df = spark.createDataFrame(probes, ["lng", "lat"])
        got = {
            (r["lng"], r["lat"])
            for r in df.filter(
                F.expr(_crossings_expr("lng", "lat", ring)) % 2 == 1
            ).collect()
        }
        want = {(x, y) for x, y in probes if _ray_cast(x, y, ring)}
        assert got == want


def test_dtw_symmetry_and_shift_invariance(spark):
    from ctgov_ai_etl_spark.queries.analytics import (
        _DTW_BAND,
        _DTW_N,
        _dtw_cells,
    )

    rng = random.Random(31)
    a = [rng.randrange(0, 5000) for _ in range(_DTW_N)]
    b = [rng.randrange(0, 5000) for _ in range(_DTW_N)]
    shift = 7777

    def dtw(x, y):
        row = {f"a{k+1}": x[k] for k in range(_DTW_N)}
        row.update({f"b{k+1}": y[k] for k in range(_DTW_N)})
        df = spark.createDataFrame([tuple(row.values())], list(row))
        for col, expr in _dtw_cells():
            df = df.withColumn(col, F.expr(expr))
        return df.collect()[0][f"c_{_DTW_N}_{_DTW_N}"]

    d_ab = dtw(a, b)
    assert d_ab == dtw(b, a)  # band is symmetric
    assert d_ab == dtw([v + shift for v in a], [v + shift for v in b])
    assert d_ab == _dtw_ref(a, b, _DTW_BAND)


# ----------------------- fdiv / sql_fdiv foundational differential


def test_fdiv_matches_python_floor_and_duckdb(spark):
    """The repo's entire exactness story leans on fdiv == Python
    floor division == sql_fdiv-in-DuckDB, across signs and above
    2^53 where double division breaks.  Differential-test all three
    on adversarial and random operands."""
    import duckdb

    from ctgov_ai_etl_spark.functions.exact import fdiv, sql_fdiv

    rng = random.Random(41)
    cases = [
        (7, 3), (-7, 3), (7, -3), (-7, -3), (0, 5), (6, 3), (-6, 3),
        (2**62, 997), (-(2**62), 997), (2**53 + 1, 2), (10**18, 10**9),
        # |b| > 2^62: the unconditional ((a % b) + b) % b inner add
        # overflows int64 on every one of these (ADVICE r12) — the
        # conditional-add form must stay exact
        (2**62 + 1, 2**62 + 2), (-(2**62) - 5, 2**62 + 3),
        (2**62 + 7, -(2**62) - 9), (-(2**62) - 11, -(2**62) - 13),
        (2**63 - 1, 2**63 - 1), (-(2**63), 2**63 - 1),
        (-(2**63), -(2**63)), (2**63 - 1, -(2**63)),
        (5, 2**63 - 1), (-5, 2**63 - 1), (5, -(2**63)), (-5, -(2**63)),
    ]
    cases += [
        (rng.randrange(-(2**62), 2**62), rng.choice([1, 2, 3, 97, 10**6, -5]))
        for _ in range(40)
    ]
    df = spark.createDataFrame(cases, "a long, b long")
    got = {
        (r["a"], r["b"]): r["q"]
        for r in df.select("a", "b", fdiv(F.col("a"), F.col("b")).alias("q")).collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        want = a // b
        assert got[(a, b)] == want, (a, b)
        duck = con.sql(
            f"SELECT {sql_fdiv(f'CAST({a} AS BIGINT)', f'CAST({b} AS BIGINT)')} AS q"
        ).fetchone()[0]
        assert duck == want, (a, b, duck)


def test_audio_dft8_zero_pads_short_clips(spark):
    """A WAV with fewer than 8 frames per channel must produce the
    DFT of the zero-padded window, not an executor shape-mismatch
    (ADVICE r12): pad-with-zeros equals summing only the live
    samples."""
    import struct

    from ctgov_ai_etl_spark.functions.imagecodec import encode_wav
    from ctgov_ai_etl_spark.operators.multimodal import (
        DFT8_COS,
        DFT8_SIN,
        audio_dft8_real,
    )

    vals = [100, -200, 300]  # 3 mono frames < 8
    blob = encode_wav(8000, 1, struct.pack("<3h", *vals))
    df = spark.createDataFrame([(1, bytearray(blob))], "doc_id long, blob binary")
    rows = audio_dft8_real(df, "doc_id").collect()
    got = {(r["channel"], r["bin"]): r["energy"] for r in rows}
    x = vals + [0] * 5
    for m in range(5):
        re = sum(x[k] * DFT8_COS[m][k] for k in range(8))
        im = sum(x[k] * DFT8_SIN[m][k] for k in range(8))
        assert got[(0, m)] == re * re + im * im
    assert len(rows) == 5


def test_hll_registers_reference_replay_and_estimate(spark):
    """Registers match a pure-Python HLL replay bit-for-bit; the merge
    row is the cell-wise max; and the documented client-side estimator
    over the merged registers lands within 3 standard errors
    (1.04/sqrt(64) relative) of the true distinct count."""
    import hashlib
    import math

    reg = load_all()
    rows = reg["sketch_hll_registers"].fn(spark, SF).collect()
    got = {}
    for r in rows:
        got[(r["grp"], r["bucket"])] = r["register"]
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "user_id"
    ).collect()
    want: dict = {}
    users = set()
    for r in ev:
        users.add(r["user_id"])
        hx = hashlib.md5(f"hll:{r['user_id']}".encode()).hexdigest()
        bucket = int(hx[:2], 16) % 64
        rest = int(hx[2:14], 16)
        rho = 49 if rest == 0 else 49 - rest.bit_length()
        k = (r["event_type"], bucket)
        want[k] = max(want.get(k, 0), rho)
    for (g, b), rho in want.items():
        assert got[(g, b)] == rho, (g, b)
        assert got[("__merged", b)] >= rho
    merged = {b: v for (g, b), v in got.items() if g == "__merged"}
    assert merged == {
        b: max(v for (_, b2), v in want.items() if b2 == b)
        for b in {b2 for (_, b2) in want}
    }
    # client-side estimator (the docstring's documented fold)
    m = 64
    z = sum(2.0 ** -merged.get(b, 0) for b in range(m))
    alpha = 0.709  # alpha_64 per Flajolet et al.
    est = alpha * m * m / z
    v = sum(1 for b in range(m) if merged.get(b, 0) == 0)
    if est <= 2.5 * m and v > 0:
        est = m * math.log(m / v)
    true = len(users)
    assert abs(est - true) / true < 3 * 1.04 / math.sqrt(m)


def test_hll_stream_twin_matches_batch(spark):
    reg = load_all()
    batch = {
        tuple(r) for r in reg["sketch_hll_registers"].fn(spark, SF).collect()
    }
    stream = {tuple(r) for r in reg["stream_run_hll"].fn(spark, SF).collect()}
    assert batch == stream


def test_seq_pattern_match_reference_replay(spark):
    """Symbol strings, funnel regex counts, and purchase tallies match
    a pure-Python replay over (ts, event_id)-sorted events."""
    import re

    reg = load_all()
    got = {r["user_id"]: r for r in reg["seq_pattern_match"].fn(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    seqs: dict[int, list] = {}
    for r in ev:
        if r["ts"] is None:
            continue
        seqs.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["event_type"][0])
        )
    assert set(got) == set(seqs)
    for uid, items in seqs.items():
        s = "".join(sym for _, _, sym in sorted(items))
        r = got[uid]
        assert r["n_events"] == len(s)
        assert r["n_funnels"] == len(re.findall("vc*p", s))
        assert r["has_error"] == ("e" in s)
        assert r["n_purchases"] == s.count("p")


# ------------------------- fdiv full-domain property (hypothesis)


from hypothesis import given, settings
from hypothesis import strategies as st

_I64 = st.integers(-(2**63), 2**63 - 1)


@settings(max_examples=60, deadline=None)
@given(a=_I64, b=_I64.filter(lambda v: v != 0))
def test_fdiv_sql_full_int64_domain(a, b):
    """sql_fdiv == Python floor division over the FULL int64 domain
    (the DuckDB mirror side is cheap enough to property-test; the
    Spark side is pinned by the case-table differential test).  The
    single unrepresentable combination (-2^63 // -1 = 2^63) must
    raise DuckDB's own BIGINT cast error, not return garbage."""
    import duckdb

    from ctgov_ai_etl_spark.functions.exact import sql_fdiv

    con = duckdb.connect()
    expr = sql_fdiv(f"CAST({a} AS BIGINT)", f"CAST({b} AS BIGINT)")
    if a == -(2**63) and b == -1:
        import pytest

        with pytest.raises(Exception):
            con.sql(f"SELECT {expr} AS q").fetchone()
        return
    got = con.sql(f"SELECT {expr} AS q").fetchone()[0]
    assert got == a // b, (a, b, got)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 14),
    h=st.integers(1, 14),
    ct=st.sampled_from([0, 2, 4, 6]),
    depth=st.sampled_from([8, 16]),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_fullspec_roundtrip_property(w, h, ct, depth, interlace, seed):
    """Any raster round-trips exactly through the full-spec encoder/
    decoder for every (color type, depth, interlace) combination the
    encoder writes — high-byte decimation at 16, alpha dropped."""
    import numpy as np

    from ctgov_ai_etl_spark.functions.imagecodec import (
        decode_png_pixels,
        encode_png,
    )

    ch = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    cch = {0: 1, 2: 3, 4: 1, 6: 3}[ct]
    sb = depth // 8
    rng = np.random.default_rng(seed)
    pix = bytes(rng.integers(0, 256, size=w * h * ch * sb, dtype=np.uint8))
    g = encode_png(
        w, h, pix, ct, filter_per_row=lambda y: y % 5,
        interlace=interlace, bit_depth=depth,
    )
    W, H, CH, r = decode_png_pixels(g)
    want = bytes(
        pix[(p * ch + k) * sb] for p in range(w * h) for k in range(cch)
    )
    assert (W, H, CH) == (w, h, cch) and r == want
