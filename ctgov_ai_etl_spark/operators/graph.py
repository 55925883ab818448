"""Distributed graph analytics: PageRank over an edge DataFrame.

The engine already has the *undirected* graph workhorses (connected
components by label propagation and large-star/small-star,
operators/dedup.py) — this module adds the directed-graph ranking
primitive a curation pipeline uses for link-based quality signals
(rank hosts/documents by in-link mass before sampling).

Scale shape: PageRank is iterative joins, so the only thing that
matters at 100 TB is what each round shuffles.  Here a round is
  ranks ⋈ edges on src  (edges pre-joined with out-degree once,
                          outside the loop)
  → groupBy dst          (partial aggregation: the shuffle carries one
                          row per (task, dst), not one per edge)
  → nodes left-join sums (teleport term for dangling-in nodes)
Edge and rank rows are both keyed by node id throughout, so a
production run would persist ``edges`` bucketed by ``src`` and every
round's first join is shuffle-free; the groupBy on ``dst`` is the one
unavoidable exchange per round.

Determinism: ranks are kept in integer micro-units with floor
division (`r div outdeg`, `(d · m) div 100`) — every operation is
exact 64-bit integer arithmetic, so the result is bit-identical
across engines, partitionings, and summation orders, and the query
hash-checks against an unrolled SQL oracle.  (Float PageRank would
differ in the last ulp by shuffle order.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # rank micro-units: initial rank == 1.0 == 1e6


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> DataFrame:
    """Fixed-iteration integer PageRank; returns (node, rank_micro).

    ``edges`` is a directed edge list (one row per distinct edge —
    dedupe first if multiplicity must not weight the walk).  Nodes
    with no out-edges (dangling) leak their mass, and nodes with no
    in-edges settle at the teleport term — both standard for the
    fixed-iteration formulation and replicated exactly by the SQL
    oracle.

    All arithmetic is int64 with floor division: contribution of a
    node is ``rank div outdeg``, the damped update is
    ``(100-d)% · scale + (d% · Σ contrib) div 100``.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").cast("long").alias("outdeg"))
    # Join out-degree once, outside the loop: each round then touches
    # edges exactly once, keyed by src.
    ew = e.join(outdeg, "src")
    base = (100 - damping_pct) * scale // 100
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        sums = (
            ew.join(ranks, ew.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("r div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (
                F.lit(base).cast("long")
                + F.expr(f"({damping_pct} * coalesce(m, 0L)) div 100")
            ).alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank_micro"))


def pagerank_oracle_sql(
    edges_sql: str,
    iters: int = 3,
    damping_pct: int = 85,
    scale: int = SCALE,
) -> str:
    """Unrolled SQL replay of :func:`pagerank` for a DuckDB oracle.

    ``edges_sql`` is a SELECT producing (src, dst).  The CTE chain
    mirrors the Spark loop term for term; integer floor division on
    non-negative values makes the replay bit-exact.
    """
    base = (100 - damping_pct) * scale // 100
    parts = [
        f"edges AS ({edges_sql})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        "ew AS (SELECT e.src, e.dst, d.outdeg"
        " FROM edges e JOIN deg d ON d.src = e.src)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"s{i} AS (SELECT ew.dst AS node, sum(r.r // ew.outdeg) AS m"
            f" FROM ew JOIN r{i - 1} r ON r.node = ew.src GROUP BY ew.dst)"
        )
        parts.append(
            f"r{i} AS (SELECT n.node,"
            f" CAST({base} + ({damping_pct} * coalesce(s.m, 0)) // 100 AS BIGINT)"
            f" AS r FROM nodes n LEFT JOIN s{i} s ON s.node = n.node)"
        )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"\n    SELECT node, r AS rank_micro FROM r{iters}"
    )
