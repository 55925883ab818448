"""Fuzzy string matching: edit-distance-bounded self-join WITHOUT a
cartesian — the record-linkage primitive (typo'd titles, OCR'd names,
URL variants) that a naive ``levenshtein(a, b) <= 1`` predicate would
plan as an O(n²) nested loop.

Blocking is the deletion-neighborhood scheme (SymSpell / Mor-Fraenkel
'82): D(s) = {s} ∪ {s with one character deleted}.  For standard
Levenshtein distance ≤ 1 (one substitution, insertion, or deletion)
the neighborhoods of a matching pair PROVABLY intersect:

  - substitution at i: deleting position i from both sides is equal;
  - insertion into A yielding B: deleting the inserted char from B
    gives A, and A ∈ D(A);
  - deletion from A yielding B: B ∈ D(A) and B ∈ D(B).

So candidates = equi-join on a shared deletion variant (ONE shuffle on
the variant string, |s|+1 variants per row — linear blow-up, bounded
buckets w.h.p. on real name corpora), then exact verification with the
built-in ``levenshtein`` kills false candidates (e.g. two different
characters deleted from the same position-neighborhood).  The same
explode→equi-join→verify shape as every LSH operator in this engine —
no cartesian anywhere, 100 TB-safe as long as no single variant is
shared by a skew-heavy fraction of the corpus (dedupe the variants per
row; identical strings meet on the undeleted variant).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(s: Column) -> Column:
    """``{s} ∪ {s minus one char}`` as a distinct array — the
    distance-1 deletion neighborhood, built with one codegen'd
    higher-order transform (no Python)."""
    drops = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        lambda i: F.concat(
            s.substr(F.lit(1), i - 1),
            s.substr(i + 1, F.length(s)),
        ),
    )
    return F.array_distinct(F.array_union(F.array(s), drops))


def fuzzy_self_join_lev1(
    df: DataFrame, id_col: str, s_col: str
) -> DataFrame:
    """All pairs (id_a < id_b) whose ``s_col`` values are within
    Levenshtein distance 1, via deletion-neighborhood blocking +
    exact verify.  Returns (id_a, id_b, dist)."""
    # Two selects: building the variants in the same projection that
    # aliases ``s_col`` to "s" would make F.col(s_col) a lateral alias
    # reference when s_col == "s" (Spark 4 internal error).
    base = df.select(F.col(id_col).alias("id"), F.col(s_col).alias("s"))
    v = base.select(
        "id", "s", F.explode(deletion_variants(F.col("s"))).alias("var")
    )
    a, b = v.alias("a"), v.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.var") == F.col("b.var")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.s").alias("s_a"),
            F.col("b.s").alias("s_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.levenshtein("s_a", "s_b").cast("long")
    return cand.select("id_a", "id_b", dist.alias("dist")).filter(
        F.col("dist") <= 1
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.9,
    min_df: int = 2,
    max_df: int = 100,
) -> DataFrame:
    """ASYMMETRIC containment join: pairs (id_a, id_b) where at least
    ``threshold`` of A's tokens appear in B and |A| ≤ |B| — the
    near-SUBSET detector (quotes, excerpts, page-in-page duplication)
    that symmetric Jaccard misses: a paragraph fully contained in a
    book has Jaccard ≈ 0 but containment 1.0.

    Token universe: document-frequency band ``min_df ≤ df ≤ max_df``
    (identical on the oracle side) — hapax tokens cannot witness an
    intersection between two documents, and stopword-tier tokens
    would make the inverted index explode on Σ df²; the band is the
    same scale lever as the sparse-cosine query's.  Containment is
    DEFINED over the banded sets; ``n`` is the banded set size.

    Shape (ProbeCount prefix join, Xiao et al. '08's overlap
    variant): every document indexes its FULL banded token set
    (inverted index, one shuffle on the token), but only its PREFIX —
    the first |A| − ⌈t·|A|⌉ + 1 tokens in the rarest-first global
    order — probes the index.  Pigeonhole: overlap ≥ ⌈t·|A|⌉ forces
    some probe-prefix token of A to appear in B, so recall is exact;
    candidates then verify with an exact intersect.  At t=0.9 the
    probe side explodes ~10% of each document, and only on its
    rarest tokens."""
    from ctgov_ai_etl_spark.operators.dedup import token_shingles
    from ctgov_ai_etl_spark.operators.limits import spread_to_parallelism

    d = spread_to_parallelism(df)
    toks = d.select(
        F.col(id_col).alias("id"),
        token_shingles(F.col(text_col), 1).alias("toks"),
    )
    exploded = toks.select("id", F.explode("toks").alias("tok"))
    dfreq = exploded.groupBy("tok").agg(F.countDistinct("id").alias("df"))
    band = dfreq.filter(F.col("df").between(min_df, max_df))
    # The (tok, df) band broadcasts; each document sorts its own
    # surviving tokens (df asc, tok asc) map-side — the rarest-first
    # order the prefix slices from.
    vocab = F.broadcast(band.select("tok", "df"))
    enc = (
        exploded.join(vocab, "tok")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df", "tok"))
            ).alias("ordered")
        )
        .select(
            "id",
            F.transform("ordered", lambda s: s.tok).alias("stoks"),
        )
        .withColumn("n", F.size("stoks"))
        .filter(F.col("n") >= 1)
    )
    prefix_len = (
        F.col("n") - F.ceil(F.col("n") * F.lit(threshold)).cast("int") + 1
    )
    probe = enc.select(
        F.col("id").alias("id_a"),
        F.col("stoks").alias("ta"),
        F.col("n").alias("n_a"),
        F.explode(F.slice("stoks", 1, prefix_len)).alias("tok"),
    )
    index = enc.select(
        F.col("id").alias("id_b"),
        F.col("stoks").alias("tb"),
        F.col("n").alias("n_b"),
        F.explode("stoks").alias("tok"),
    )
    cand = (
        probe.join(
            index,
            ["tok"],
        )
        .filter(
            (F.col("id_a") != F.col("id_b")) & (F.col("n_a") <= F.col("n_b"))
        )
        .select("id_a", "id_b", "ta", "tb", "n_a")
        .dropDuplicates(["id_a", "id_b"])
    )
    containment = F.round(
        F.size(F.array_intersect("ta", "tb")).cast("double") / F.col("n_a"), 6
    )
    return cand.select(
        "id_a", "id_b", containment.alias("containment")
    ).filter(F.col("containment") >= threshold)
