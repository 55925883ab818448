"""Distributed clustering & vector compression: Lloyd k-means and
product quantization (PQ) over an embedding column.

Both operators run on integer micro-unit vectors (``floor(x · 1e6)``
per dimension): every distance, sum, and centroid update is then
exact 64-bit integer arithmetic — squared distances stay below
64 · (2·10⁶)² ≈ 2.6e14 < 2⁵³, so even an engine that routes the dot
product through doubles (DuckDB's ``list_dot_product``) computes it
exactly — making the iterative pipelines bit-replayable in SQL and
independent of partitioning/summation order.

Scale shapes:

- **k-means** (`kmeans_lloyd`): per round, assignment is a broadcast
  of k centroid rows against one corpus pass (argmin via a struct-min
  groupBy), and the update is a posexplode → partial-aggregated
  shuffle keyed by (cluster, dim) — the shuffle carries at most
  k · dim rows per task regardless of corpus size.  No driver-side
  collect anywhere; centroids stay a k-row DataFrame end to end.
  This is the semantic-dedup / mixture-design workhorse (SemDeDup
  and friends cluster first, dedup within cells).

- **PQ** (`pq_encode` / `pq_topk`): the codebook (m subspaces × k
  codes, trained offline on a bounded sample) broadcasts everywhere;
  encoding is one corpus pass producing m small integer codes per
  vector (a 64-dim float vector compresses 256 B → 8 B — the reason
  a 100 TB corpus's ANN index fits in cluster memory at all); search
  is asymmetric-distance computation (ADC): the query side expands to
  an m·k distance table, corpus codes join it on (subspace, code) —
  a broadcast join against a ≤ queries·m·k-row table — and one
  partially-aggregated sum per (query, vector) ranks candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.operators.cache import track

MICRO = 1_000_000

# SQL fragment mirrored by quantize(): keep the two in one place so
# the engines cannot drift.
SQL_QUANTIZE = (
    "list_transform(CAST({col} AS DOUBLE[]), x -> CAST(floor(x * 1000000) AS BIGINT))"
)


def quantize(col: Column) -> Column:
    """array<float> → array<long> integer micro-units, exact in both
    engines (float→double widening is exact; ×1e6 and floor are the
    same IEEE ops on both sides)."""
    return F.transform(
        col.cast("array<double>"), lambda x: F.floor(x * MICRO).cast("long")
    )


def sqdist_long(a: Column, b: Column) -> Column:
    """Exact squared L2 distance between two array<long> vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _sql_sqdist(a: str, b: str) -> str:
    # Σ(a-b)² = a·a − 2a·b + b·b; all terms integer-valued < 2⁵³ so
    # DuckDB's double-typed list_dot_product is exact.
    return (
        f"CAST(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        f" + list_dot_product({b}, {b}) AS BIGINT)"
    )


# ----------------------------------------------------------- k-means


def kmeans_assign(points: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each (vec_id, v) row to its nearest (cid, cvec) centroid
    (ties → lowest cid).  Centroids broadcast (k rows); argmin is a
    struct-min groupBy, carrying ``v`` through for the next update."""
    j = points.crossJoin(F.broadcast(centroids)).withColumn(
        "dist", sqdist_long(F.col("v"), F.col("cvec"))
    )
    best = j.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cid")).alias("b"),
        F.first("v").alias("v"),  # functionally dependent on vec_id
    )
    return best.select(
        "vec_id", F.col("b.cid").alias("cid"), F.col("b.dist").alias("dist"), "v"
    )


def kmeans_update(assigned: DataFrame) -> DataFrame:
    """New centroid per cluster: element-wise floor-mean of members.
    posexplode → groupBy (cid, pos) keeps the shuffle at k·dim rows
    per upstream task (partial aggregation); the floor(double
    division) is bit-identical across engines because the integer sum
    and count are exact.  Empty clusters vanish (standard Lloyd)."""
    pe = assigned.select("cid", F.posexplode("v").alias("pos", "val"))
    agg = pe.groupBy("cid", "pos").agg(
        F.sum("val").alias("s"), F.count("*").alias("n")
    )
    cent = agg.withColumn(
        "cval", F.floor(F.col("s").cast("double") / F.col("n")).cast("long")
    )
    return (
        cent.groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("a"))
        .select("cid", F.transform("a", lambda s: s.cval).alias("cvec"))
    )


def kmeans_lloyd(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    rounds: int = 2,
    reseed: bool = False,
) -> DataFrame:
    """Distributed Lloyd iterations; returns the final assignment
    (vec_id, cid, dist_micro2).

    Seeding is the k lowest-id vectors (deterministic and replayable
    straight from the table — no RNG, no collected literals), then
    ``rounds`` full assign+update rounds and one final assignment.

    ``reseed=True`` keeps k stable on skewed data: clusters that lose
    every member mid-iteration are re-seeded from the farthest
    assigned points (:func:`reseed_empty_clusters`) instead of
    silently vanishing.  Off by default — the vanish-on-empty path is
    what the unrolled SQL oracle replays, and shrinking k is harmless
    for dedup blocking; turn it on when the cluster count itself is
    the contract (ANN partition layouts, mixture quotas).
    """
    from ctgov_ai_etl_spark.operators.limits import spread_to_parallelism

    points = spread_to_parallelism(df).select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("v")
    )
    # Each round re-reads ``points`` for assign AND update; persist
    # the narrow quantized table so the scan+quantize pass runs once.
    points = track(points.persist())
    cents = points.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cvec")
    )
    for _ in range(rounds):
        assigned = kmeans_assign(points, cents)
        new_cents = kmeans_update(assigned)
        if reseed:
            new_cents = reseed_empty_clusters(assigned, cents, new_cents)
        cents = new_cents
    final = kmeans_assign(points, cents)
    return final.select("vec_id", "cid", F.col("dist").alias("dist_micro2"))


def reseed_empty_clusters(
    assigned: DataFrame, prev_cents: DataFrame, new_cents: DataFrame
) -> DataFrame:
    """Deterministic empty-cluster repair for Lloyd iterations: any
    cid present before the update but absent after it (all members
    captured by other centroids — the standard failure on skewed or
    duplicate-seed data) is re-seeded with the globally farthest
    assigned points (dist desc, vec_id asc ties), one per missing
    cid in cid order — the classic "split the worst-fit region"
    heuristic, made deterministic so the result is partition- and
    rerun-stable.

    Driver traffic is bounded by k, never by data: the missing-cid
    set is ≤ k rows, and the farthest points come back through a
    TakeOrderedAndProject limit of that same size (per-partition
    top-|missing| heaps — no global sort, no single reducer)."""
    missing = sorted(
        r["cid"]
        for r in prev_cents.select("cid")
        .subtract(new_cents.select("cid"))
        .collect()
    )
    if not missing:
        return new_cents
    far = (
        assigned.orderBy(F.col("dist").desc(), F.col("vec_id").asc())
        .limit(len(missing))
        .select("v")
        .collect()
    )
    spark = new_cents.sparkSession
    extra = spark.createDataFrame(
        [(cid, row["v"]) for cid, row in zip(missing, far)], new_cents.schema
    )
    return new_cents.unionByName(extra)


def kmeans_oracle_sql(
    k: int = 8, rounds: int = 2, dim: int = 64, table: str = "embeddings"
) -> str:
    """Unrolled SQL replay of :func:`kmeans_lloyd` for DuckDB."""
    d = _sql_sqdist("q.v", "c.cvec")
    parts = [
        f"q AS (SELECT vec_id, {SQL_QUANTIZE.format(col='embedding')} AS v"
        f" FROM {table})",
        f"c0 AS (SELECT vec_id AS cid, v AS cvec FROM q WHERE vec_id < {k})",
    ]
    for i in range(1, rounds + 2):
        prev = f"c{i - 1}"
        parts.append(
            f"a{i} AS (SELECT vec_id, cid, dist, v FROM ("
            f" SELECT *, row_number() OVER (PARTITION BY vec_id"
            f" ORDER BY dist ASC, cid ASC) AS rn FROM ("
            f" SELECT q.vec_id, c.cid, {d} AS dist, q.v"
            f" FROM q CROSS JOIN {prev} c)) WHERE rn = 1)"
        )
        if i <= rounds:
            parts.append(
                f"m{i} AS (SELECT a.cid, p.pos,"
                f" CAST(floor(CAST(sum(a.v[p.pos]) AS DOUBLE) / count(*)) AS BIGINT)"
                f" AS cval FROM a{i} a CROSS JOIN range(1, {dim + 1}) p(pos)"
                f" GROUP BY a.cid, p.pos)"
            )
            parts.append(
                f"c{i} AS (SELECT cid, list(cval ORDER BY pos) AS cvec"
                f" FROM m{i} GROUP BY cid)"
            )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, cid, dist AS dist_micro2 FROM a{rounds + 1}"
    )


# --------------------------------------------- product quantization


def pq_train_offline(
    parquet_path: str,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    sample_cap: int = 4096,
    iters: int = 8,
) -> list[list[list[int]]]:
    """Train integer PQ codebooks (m × k × dim/m) offline with
    pyarrow+numpy on the lowest-id sample of a canonical parquet —
    the fit_centroids_offline pattern (operators/similarity.py): the
    trained constants become literals shared verbatim by the Spark
    plan and the SQL oracle, so only the *constants* matter and the
    training arithmetic needs no cross-engine story.  Seeding is the
    first k sample subvectors per subspace (deterministic)."""
    import numpy as np
    import pyarrow.parquet as pa

    t = pa.read_table(parquet_path, columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"))
    order = np.argsort(ids, kind="stable")[:sample_cap]
    vecs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)[order]
    q = np.floor(vecs * MICRO).astype(np.int64)
    sub = dim // m
    books: list[list[list[int]]] = []
    for s in range(m):
        x = q[:, s * sub : (s + 1) * sub].astype(np.float64)
        cent = x[:k].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    cent[c] = np.floor(x[mask].mean(axis=0))
        books.append([[int(v) for v in row] for row in cent.astype(np.int64)])
    return books


def _codebook_df(spark, codebooks: list[list[list[int]]]) -> DataFrame:
    rows = [
        (s, c, vec)
        for s, book in enumerate(codebooks)
        for c, vec in enumerate(book)
    ]
    return spark.createDataFrame(rows, "s INT, code INT, cvec ARRAY<BIGINT>")


def _subvectors(df: DataFrame, id_col: str, vec_col: str, m: int, sub: int) -> DataFrame:
    v = quantize(F.col(vec_col))
    return (
        df.select(F.col(id_col).alias("vec_id"), v.alias("v"))
        .select(
            "vec_id",
            F.posexplode(
                F.array(*[F.slice("v", s * sub + 1, sub) for s in range(m)])
            ).alias("s", "sv"),
        )
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as m small integer codes: per subspace,
    argmin over the broadcast codebook (ties → lowest code).  Output
    (vec_id, s, code) — the compressed index a 100 TB corpus serves
    ANN from."""
    m, k = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    spark = df.sparkSession
    cb = _codebook_df(spark, codebooks)
    sv = _subvectors(df, id_col, vec_col, m, sub)
    j = sv.join(F.broadcast(cb), "s").withColumn(
        "dist", sqdist_long(F.col("sv"), F.col("cvec"))
    )
    best = j.groupBy("vec_id", "s").agg(F.min(F.struct("dist", "code")).alias("b"))
    return best.select("vec_id", "s", F.col("b.code").alias("code"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[int]]],
    topk: int = 5,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ search with exact refinement (the IVF-PQ + refine serving
    pattern): ADC over the compressed codes shortlists ``refine``
    candidates per query — corpus touched only through its 8-byte
    codes; each query expands to a broadcast m·k integer distance
    table, codes join it on (subspace, code), one partially-
    aggregated sum ranks — then the shortlist (a constant ·|queries|
    rows) joins back to the full-precision vectors for an exact
    re-rank.  Recall@k therefore equals shortlist recall, which the
    constant ``refine`` knob buys directly, while the full-precision
    vectors are read for ~refine rows per query instead of the whole
    corpus.  Returns (query_id, neighbor_id, dist_micro2, rank) —
    exact integers end to end, deterministic (dist, id) tie-breaks."""
    from pyspark.sql import Window

    m, k = len(codebooks), len(codebooks[0])
    sub = len(codebooks[0][0])
    spark = corpus.sparkSession
    cb = _codebook_df(spark, codebooks)
    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    qsub = _subvectors(queries, id_col, vec_col, m, sub).withColumnRenamed(
        "vec_id", "query_id"
    )
    qdist = qsub.join(F.broadcast(cb), "s").select(
        "query_id", "s", "code", sqdist_long(F.col("sv"), F.col("cvec")).alias("qd")
    )
    adc = (
        codes.join(F.broadcast(qdist), ["s", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd").alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        adc.withColumn("arn", F.row_number().over(w_adc))
        .filter(F.col("arn") <= refine)
        .select("query_id", "neighbor_id")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    )
    nvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("nv")
    )
    exact = (
        shortlist.join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            sqdist_long(F.col("qv"), F.col("nv")).alias("dist_micro2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro2").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "dist_micro2", "rank")
    )


def pq_oracle_sql(
    codebooks: list[list[list[int]]],
    topk: int = 5,
    refine: int = 50,
    n_queries: int = 5,
    table: str = "embeddings",
) -> str:
    """SQL replay of encode + ADC shortlist + exact refine over the
    same codebook literals."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    rows = ",\n      ".join(
        f"({s}, {c}, [" + ",".join(str(v) for v in vec) + "])"
        for s, book in enumerate(codebooks)
        for c, vec in enumerate(book)
    )
    d_enc = _sql_sqdist("sub.sv", "cb.cvec")
    return f"""
    WITH cb AS (
      SELECT s, code, CAST(cvec AS BIGINT[]) AS cvec FROM (VALUES
      {rows}
      ) t(s, code, cvec)
    ),
    q AS (SELECT vec_id, {SQL_QUANTIZE.format(col='embedding')} AS v FROM {table}),
    sub AS (
      SELECT vec_id, CAST(p.s AS INT) AS s,
             v[p.s * {sub} + 1 : p.s * {sub} + {sub}] AS sv
      FROM q CROSS JOIN range(0, {m}) p(s)
    ),
    dists AS (
      SELECT sub.vec_id, sub.s, cb.code, {d_enc} AS dist
      FROM sub JOIN cb ON cb.s = sub.s
    ),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
                 ORDER BY dist ASC, code ASC) AS rn FROM dists
      ) WHERE rn = 1
    ),
    qdist AS (
      SELECT vec_id AS query_id, s, code, dist AS qd
      FROM dists WHERE vec_id < {n_queries}
    ),
    adc AS (
      SELECT qdist.query_id, codes.vec_id AS neighbor_id,
             CAST(sum(qdist.qd) AS BIGINT) AS adc_dist
      FROM codes JOIN qdist ON codes.s = qdist.s AND codes.code = qdist.code
      WHERE codes.vec_id <> qdist.query_id
      GROUP BY 1, 2
    ),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_dist ASC, neighbor_id ASC) AS arn
        FROM adc
      ) WHERE arn <= {refine}
    ),
    refined AS (
      SELECT s.query_id, s.neighbor_id,
             {_sql_sqdist("qv.v", "nv.v")} AS dist_micro2
      FROM shortlist s
      JOIN q qv ON qv.vec_id = s.query_id
      JOIN q nv ON nv.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, dist_micro2, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist_micro2 ASC, neighbor_id ASC) AS INT) AS rank
      FROM refined
    ) WHERE rank <= {topk}
    """


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    coarse: list[list[float]],
    codebooks: list[list[list[int]]],
    topk: int = 5,
    nprobe: int = 6,
    refine: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ with exact refinement — the COMPOSITE production ANN
    layout (Jégou et al. '11; what FAISS serves billion-vector
    corpora with): the coarse quantizer prunes the corpus to the
    queries' ``nprobe`` clusters, ADC over the 8-byte PQ codes ranks
    ONLY those candidates, and the ``refine``-deep shortlist re-ranks
    against full-precision vectors.

    Relative to the standalone tiers already in the catalog: vs
    ``pq_topk`` the ADC join now touches Σ probed-cluster codes
    instead of every corpus code (the 1/ncentroids·nprobe scan
    fraction that matters at 100 TB); vs ``ivf_topk`` the candidate
    ranking reads 8-byte codes, not full vectors.  Deterministic
    given (coarse, codebooks): cosine probe ranking rounds at
    ``round_digits`` with lowest-cid ties, ADC/refine are exact
    integers — the full composite replays in SQL."""
    from pyspark.sql import Window

    from ctgov_ai_etl_spark.operators.similarity import (
        _assign_frame,
        centroid_assign,
    )

    spark = corpus.sparkSession
    m, sub = len(codebooks), len(codebooks[0][0])
    asg = centroid_assign(corpus, coarse, id_col, vec_col, round_digits).select(
        F.col("id").alias("neighbor_id"), "cid"
    )
    af = _assign_frame(queries, coarse, id_col, vec_col, round_digits)
    probe_pairs = F.zip_with(
        F.col("__sims"),
        F.sequence(F.lit(0), F.lit(len(coarse) - 1)),
        lambda s, c: F.struct((-s).alias("negsim"), c.alias("cid")),
    )
    probes = af.select(
        F.col("id").alias("query_id"),
        F.explode(
            F.transform(
                F.slice(F.array_sort(probe_pairs), 1, nprobe),
                lambda p: p["cid"].cast("int"),
            )
        ).alias("cid"),
    )
    cand = (
        asg.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    cb = _codebook_df(spark, codebooks)
    codes = pq_encode(corpus, codebooks, id_col, vec_col).withColumnRenamed(
        "vec_id", "neighbor_id"
    )
    qsub = _subvectors(queries, id_col, vec_col, m, sub).withColumnRenamed(
        "vec_id", "query_id"
    )
    qdist = qsub.join(F.broadcast(cb), "s").select(
        "query_id", "s", "code", sqdist_long(F.col("sv"), F.col("cvec")).alias("qd")
    )
    adc = (
        cand.join(codes, "neighbor_id")
        .join(F.broadcast(qdist), ["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("qd").alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        adc.withColumn("arn", F.row_number().over(w_adc))
        .filter(F.col("arn") <= refine)
        .select("query_id", "neighbor_id")
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    )
    nvec = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("nv")
    )
    exact = (
        shortlist.join(nvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            sqdist_long(F.col("qv"), F.col("nv")).alias("dist_micro2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_micro2").asc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "dist_micro2", "rank")
    )


def ivfpq_oracle_sql(
    coarse: list[list[float]],
    codebooks: list[list[list[int]]],
    topk: int = 5,
    nprobe: int = 6,
    refine: int = 50,
    n_queries: int = 5,
    table: str = "embeddings",
) -> str:
    """SQL replay of :func:`ivfpq_topk`: the IVF probe CTEs (same
    round-before-rank cosine rule as the ivf oracle) restrict the PQ
    ADC to probed clusters; encode/ADC/refine mirror pq_oracle_sql."""
    m, sub = len(codebooks), len(codebooks[0][0])
    crows = ",\n      ".join(
        f"({cid}, [" + ",".join(repr(x) for x in c) + "])"
        for cid, c in enumerate(coarse)
    )
    brows = ",\n      ".join(
        f"({s}, {c}, [" + ",".join(str(v) for v in vec) + "])"
        for s, book in enumerate(codebooks)
        for c, vec in enumerate(book)
    )
    ccos = (
        "round(list_dot_product(e.v, c.cvec)"
        " / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 6)"
    )
    d_enc = _sql_sqdist("sub.sv", "cb.cvec")
    quant = SQL_QUANTIZE.format(col="embedding")
    return f"""
    WITH cents AS (
      SELECT cid, CAST(cvec AS DOUBLE[]) AS cvec
      FROM (VALUES
      {crows}
      ) t(cid, cvec)
    ),
    dcorpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
    cranked AS (
      SELECT e.vec_id, c.cid,
             row_number() OVER (PARTITION BY e.vec_id
                                ORDER BY {ccos} DESC, c.cid ASC) AS rn
      FROM dcorpus e CROSS JOIN cents c
    ),
    asg AS (SELECT vec_id, cid FROM cranked WHERE rn = 1),
    probes AS (SELECT vec_id AS query_id, cid FROM cranked
               WHERE rn <= {nprobe} AND vec_id < {n_queries}),
    cand AS (
      SELECT p.query_id, a.vec_id AS neighbor_id
      FROM probes p JOIN asg a USING (cid)
      WHERE a.vec_id <> p.query_id
    ),
    cb AS (
      SELECT s, code, CAST(cvec AS BIGINT[]) AS cvec FROM (VALUES
      {brows}
      ) t(s, code, cvec)
    ),
    q AS (SELECT vec_id, {quant} AS v FROM {table}),
    sub AS (
      SELECT vec_id, CAST(p.s AS INT) AS s,
             v[p.s * {sub} + 1 : p.s * {sub} + {sub}] AS sv
      FROM q CROSS JOIN range(0, {m}) p(s)
    ),
    dists AS (
      SELECT sub.vec_id, sub.s, cb.code, {d_enc} AS dist
      FROM sub JOIN cb ON cb.s = sub.s
    ),
    codes AS (
      SELECT vec_id, s, code FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, s
                 ORDER BY dist ASC, code ASC) AS rn FROM dists
      ) WHERE rn = 1
    ),
    qdist AS (
      SELECT vec_id AS query_id, s, code, dist AS qd
      FROM dists WHERE vec_id < {n_queries}
    ),
    adc AS (
      SELECT cand.query_id, cand.neighbor_id,
             CAST(sum(qdist.qd) AS BIGINT) AS adc_dist
      FROM cand
      JOIN codes ON codes.vec_id = cand.neighbor_id
      JOIN qdist ON qdist.query_id = cand.query_id
                AND qdist.s = codes.s AND qdist.code = codes.code
      GROUP BY 1, 2
    ),
    shortlist AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY adc_dist ASC, neighbor_id ASC) AS arn
        FROM adc
      ) WHERE arn <= {refine}
    ),
    refined AS (
      SELECT s.query_id, s.neighbor_id,
             {_sql_sqdist("qv.v", "nv.v")} AS dist_micro2
      FROM shortlist s
      JOIN q qv ON qv.vec_id = s.query_id
      JOIN q nv ON nv.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, dist_micro2, rank FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY dist_micro2 ASC, neighbor_id ASC) AS INT) AS rank
      FROM refined
    ) WHERE rank <= {topk}
    """
