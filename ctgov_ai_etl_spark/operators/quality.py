"""Corpus-quality curation operators: Gopher-style heuristic rules and
inter-document repeated-substring detection.

Extends the curation family (dedup / decontam / PII / repetition /
mixture) with two more standard training-data hygiene passes the
reference has no equivalent for:

- **Gopher rules** (Rae et al. 2021, "Scaling Language Models" — the
  published quality-filter heuristics): per-document word count, mean
  word length, alphabetic-word fraction, and stop-word presence, each
  with the paper's pass bounds.  Pure built-in expressions — one
  map-side pass, no shuffle, no UDF; a 100 TB corpus filters at scan
  speed.
- **Repeated spans** (the distributed approximation of suffix-array
  substring dedup, Lee et al. 2021 "Deduplicating Training Data Makes
  Language Models Better"): find every ``n``-token span occurring in
  two or more distinct documents.  Exact suffix arrays don't
  distribute; sliding shingles hashed to fixed-width keys recover the
  same "long span shared verbatim" signal with equi-join mechanics.

Scale shape of ``repeated_spans``: explode is map-side; the (doc,
span-hash) set is dropped to DISTINCT before any aggregation (intra-doc
repeats collapse early); both following aggregations key on the
16-byte md5 (narrow shuffle — never the span text); and the
span-cardinality join reuses the hash partitioning AQE already built
for the count.  md5 (not xxhash64) so a differential engine replays
candidate membership bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ctgov_ai_etl_spark.functions.exact import fdiv
from ctgov_ai_etl_spark.functions.text import tokens
from ctgov_ai_etl_spark.operators.decontam import ngram_shingles

# Gopher bounds (Rae et al. 2021, Appendix A1.1) — word-count range,
# mean-word-length range, minimum fraction of words with an alphabetic
# character, and minimum distinct stop words present.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_metrics(text: Column) -> dict[str, Column]:
    """The Gopher rule metrics as named column expressions over a text
    column.  Ratios are exact rational arithmetic over integer counts
    (cast once to double at the end), so any engine computing the same
    counts agrees bit-for-bit.

    When composing with other per-row scoring, materialize the token
    array once (``withColumn("lt", tokens(text))``) and call
    :func:`gopher_metrics_from_tokens` — Catalyst does not CSE the
    repeated splits inside filter conditions (the pipeline_curate
    pushdown-explosion lesson)."""
    return gopher_metrics_from_tokens(tokens(text))


def gopher_metrics_from_tokens(toks: Column) -> dict[str, Column]:
    """:func:`gopher_metrics` over an already-materialized token-array
    column."""
    n_words = F.size(toks)
    # mean word length over the words themselves (whitespace excluded).
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda s, v: s + v
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop_arr))
    return {
        "n_words": n_words.cast("int"),
        "mean_word_len": (total_chars.cast("double") / n_words),
        "alpha_frac": (n_alpha.cast("double") / n_words),
        "n_stop": n_stop.cast("int"),
    }


def gopher_pass(m: dict[str, Column]) -> Column:
    """The conjunctive pass flag over :func:`gopher_metrics` output."""
    return (
        m["n_words"].between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & m["mean_word_len"].between(
            GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
        )
        & (m["alpha_frac"] >= GOPHER_MIN_ALPHA_FRAC)
        & (m["n_stop"] >= GOPHER_MIN_STOP_HITS)
    )


def gopher_quality(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, metrics..., gopher_pass) for every document — one map-side
    projection; downstream `.filter("gopher_pass")` is the curation
    step.  Mean/fraction columns are rounded to 6 dp for cross-engine
    hash stability (the underlying counts are exact integers)."""
    m = gopher_metrics(F.col(text_col))
    return df.select(
        F.col(id_col),
        m["n_words"].alias("n_words"),
        F.round(m["mean_word_len"], 6).alias("mean_word_len"),
        F.round(m["alpha_frac"], 6).alias("alpha_frac"),
        m["n_stop"].alias("n_stop"),
        gopher_pass(m).alias("gopher_pass"),
    )


def repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 16,
) -> DataFrame:
    """(id, n_dup_spans) for every document owning >=1 distinct
    ``n``-token span that also appears verbatim in another document —
    the corpus-internal twin of benchmark decontamination
    (:func:`~ctgov_ai_etl_spark.operators.decontam.flag_contaminated`:
    there the reference set is external; here it is the corpus itself).

    Anti-joining ``df`` against the result drops every document that
    shares a long verbatim span; keeping the lowest id per span group
    instead (a one-line change downstream) reproduces the paper's
    keep-one policy.
    """
    from ctgov_ai_etl_spark.operators.limits import spread_to_parallelism

    spans = (
        spread_to_parallelism(df)  # shingle+md5 explosion is CPU-bound
        .select(
            F.col(id_col),
            F.explode(ngram_shingles(tokens(F.col(text_col)), n)).alias("s"),
        )
        .select(id_col, F.md5("s").alias("h"))
        .distinct()
    )
    multi = (
        spans.groupBy("h")
        .agg(F.count("*").alias("nd"))  # post-distinct: count == distinct docs
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    return (
        spans.join(multi, "h")
        .groupBy(id_col)
        .agg(F.count("*").cast("int").alias("n_dup_spans"))
    )


def bigram_lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean conditional log-prob under an add-one-smoothed
    bigram LM trained on ``df`` itself — see the ``lm_bigram_score``
    query docstring for the full scale/replayability contract.
    Returns (id, n_bigrams, avg_logprob); documents with < 2 tokens
    drop out (no bigrams to score)."""
    l = tokens(F.col(text_col))
    n = F.size(l)
    bigrams = F.zip_with(
        F.slice(l, 1, n - 1),
        F.slice(l, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = df.select(F.col(id_col).alias("id"), F.explode(bigrams).alias("bg"))
    cb = bg.groupBy("bg").agg(F.count("*").alias("c2"))
    cw = cb.groupBy(F.substring_index("bg", " ", 1).alias("w1")).agg(
        F.sum("c2").alias("c1")
    )
    vocab = (
        df.select(F.explode(l).alias("tok")).agg(F.count_distinct("tok")).collect()
    )[0][0]  # tiny driver scalar (vocabulary size for the smoothing)
    lp = cb.join(cw, F.substring_index(cb.bg, " ", 1) == cw.w1).select(
        "bg",
        F.round(
            F.log(
                (F.col("c2") + 1)
                / (F.col("c1") + F.lit(int(vocab))).cast("double")
            )
            * 1_000_000
        )
        .cast("long")
        .alias("u"),
    )
    return (
        bg.join(F.broadcast(lp), "bg")
        .groupBy("id")
        .agg(F.count("*").alias("n_bigrams"), F.sum("u").alias("su"))
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            # avg micro-logprob by exact integer FLOOR division: a
            # round(su/1e6/n, 6) can land EXACTLY on a half-micro tie
            # (su divisible to x.5 micro) where Spark's BigDecimal
            # half-up and DuckDB's float-scaled rounding disagree —
            # measured at sf0.1 (doc 361: su/n = -3388329.5).  fdiv
            # floors identically in both engines; the final /1e6 is
            # one deterministic double op on the same integer.
            (fdiv(F.col("su"), F.col("n_bigrams")).cast("double")
             / 1_000_000).alias("avg_logprob"),
        )
    )


def linear_quality_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Linear text-quality classifier inference in the fastText shape
    (Joulin et al. '16 — the model class behind CCNet/RedPajama-style
    quality filters): features are token unigrams + bigrams, each
    feature contributes a weight to the document logit, mean logit
    thresholds the keep decision.

    The weights here are md5-DERIVED stand-ins (w(f) = md5(f) mapped
    into ±1.0 in micro-units) — deterministic and engine-replayable,
    standing where a trained model's hashed weight table would sit.
    With real weights the probe becomes a broadcast join of the
    exploded feature column against the (bucket, weight) table —
    identical cost shape, the table is MB-sized for 2^20 buckets.

    100 TB shape: inference is ZERO-shuffle — tokenize, feature-fold,
    and threshold are all per-row expressions (whole-stage codegen,
    no Python), so the filter runs at scan speed and composes with
    pushdown.  Integer micro-unit logits keep the fold exact and
    order-independent."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    feats = F.concat(toks, bigrams)

    def w(f: Column) -> Column:
        # md5(feature) -> integer in [-1_000_000, 1_000_000] micro-units
        return F.pmod(
            F.conv(F.substring(F.md5(f), 1, 8), 16, 10).cast("long"),
            F.lit(2_000_001),
        ) - F.lit(1_000_000)

    logit = F.aggregate(feats, F.lit(0).cast("long"), lambda acc, f: acc + w(f))
    nf = F.size(feats)
    return df.select(
        F.col(id_col).alias(id_col),
        nf.cast("int").alias("n_features"),
        logit.alias("logit_micro"),
        F.round(logit.cast("double") / 1_000_000 / nf, 6).alias("mean_logit"),
        (logit >= 0).alias("keep"),
    )


LINEAR_QUALITY_ORACLE_SQL = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    f AS (
      SELECT doc_id,
             list_concat(
               l,
               list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i + 1])
             ) AS feats
      FROM t
    ),
    s AS (
      SELECT doc_id, CAST(len(feats) AS INT) AS n_features,
             CAST(list_sum(list_transform(feats,
               x -> CAST(('0x' || substring(md5(x), 1, 8)) AS BIGINT) % 2000001
                    - 1000000)) AS BIGINT) AS logit_micro
      FROM f
    )
    SELECT doc_id, n_features, logit_micro,
           round(CAST(logit_micro AS DOUBLE) / 1000000 / n_features, 6) AS mean_logit,
           logit_micro >= 0 AS keep
    FROM s
    """


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    max_boilerplate: int = 100_000,
) -> DataFrame:
    """Corpus-level boilerplate LINE removal (the CCNet/RefinedWeb
    stage between per-doc quality rules and doc-level dedup): a line
    occurring in ≥ ``min_docs`` distinct documents is boilerplate
    (navigation chrome, cookie banners, license footers) and is
    stripped from every document.  Returns (id, clean_text, n_lines,
    n_removed) with surviving lines in original order.

    100 TB shape: the line-frequency table aggregates per-doc DISTINCT
    lines (one shuffle whose payload is lines, not docs); the
    boilerplate subset is guarded to ≤ ``max_boilerplate`` rows and
    rides back as a ONE-ROW broadcast array, so the removal itself is
    a map-side higher-order filter — documents are never exploded,
    re-grouped, or shuffled.  Everything is exact set/count algebra —
    fully SQL-replayable."""
    lines = F.split(F.col(text_col), "\n")
    ex = df.select(F.explode(F.array_distinct(lines)).alias("line"))
    counts = ex.groupBy("line").agg(F.count("*").alias("nd"))
    bl = counts.filter(F.col("nd") >= min_docs).select("line")
    n_bl = bl.count()  # bounded driver scalar (guard)
    if n_bl > max_boilerplate:
        raise ValueError(
            f"boilerplate set has {n_bl} lines (cap {max_boilerplate}): "
            "min_docs is too low for this corpus, or raise the cap if the "
            "broadcast really fits"
        )
    bl_row = bl.agg(F.coalesce(F.collect_set("line"), F.array()).alias("__bl"))
    kept = F.filter(lines, lambda l: ~F.array_contains(F.col("__bl"), l))
    return (
        df.crossJoin(F.broadcast(bl_row))
        .select(
            F.col(id_col).alias(id_col),
            F.array_join(kept, "\n").alias("clean_text"),
            F.size(lines).cast("int").alias("n_lines"),
            (F.size(lines) - F.size(kept)).cast("int").alias("n_removed"),
        )
    )


def boilerplate_oracle_sql(min_docs: int = 3, table: str = "documents") -> str:
    """DuckDB replay of :func:`remove_boilerplate_lines`: same
    distinct-per-doc line counts, anti-join removal, order-preserving
    reassembly (docs losing every line keep an empty clean_text)."""
    return f"""
    WITH t AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM {table}),
    ex AS (SELECT doc_id, unnest(list_distinct(ls)) AS line FROM t),
    c AS (SELECT line, count(*) AS nd FROM ex GROUP BY 1),
    bl AS (SELECT line FROM c WHERE nd >= {min_docs}),
    pos AS (
      SELECT doc_id, u.s.pos AS pos, u.s.line AS line
      FROM t, unnest(list_transform(range(1, len(ls) + 1),
                                    i -> {{'pos': i, 'line': ls[i]}})) u(s)
    ),
    kept AS (
      SELECT p.doc_id, p.pos, p.line FROM pos p ANTI JOIN bl USING (line)
    ),
    res AS (
      SELECT doc_id,
             array_to_string(list(line ORDER BY pos), chr(10)) AS clean_text,
             CAST(count(*) AS INT) AS n_kept
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           CAST(len(t.ls) AS INT) AS n_lines,
           CAST(len(t.ls) - coalesce(r.n_kept, 0) AS INT) AS n_removed
    FROM t LEFT JOIN res r USING (doc_id)
    """


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    keep_cols: list[str],
    threshold: float = 3.5,
) -> DataFrame:
    """MEDIAN/MAD robust outlier flags per group — the single
    definition shared by the ``anomaly_mad`` catalog query and the
    runnable example (a second inline copy of the doubled-integer
    median convention would drift).

    Values fix to integer micro-units; medians compute over DOUBLED
    integers so the even-count midpoint (a+b)/2 is an exactly-
    representable integer double (both engines interpolate identical
    int64s); robust z = 2*(2v − 2·median) / (1.4826 · 4·MAD) — the
    exact arithmetic ORDER the DuckDB oracle replays.  Returns
    ``keep_cols`` + ``group_col`` + ``value_col`` + unrounded
    ``robust_z`` for rows with |z| ≥ ``threshold`` (zero-MAD groups
    excluded).  Two grouped exact percentiles broadcast back; swap in
    approx_percentile at 100 TB (documented in the query)."""
    vm = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = df.select(
        *keep_cols, group_col, value_col, vm.alias("__vm")
    )
    med = base.groupBy(group_col).agg(
        F.percentile(F.col("__vm") * 2, F.lit(0.5)).alias("__m2")
    )
    dev = base.join(F.broadcast(med), group_col).select(
        *keep_cols,
        group_col,
        value_col,
        ((F.col("__vm") * 2).cast("double") - F.col("__m2")).alias("__sdev2"),
    )
    mad = dev.groupBy(group_col).agg(
        F.percentile(F.abs(F.col("__sdev2")) * 2, F.lit(0.5)).alias("__mad4")
    )
    z = (F.lit(2) * F.col("__sdev2")) / (F.lit(1.4826) * F.col("__mad4"))
    return (
        dev.join(F.broadcast(mad), group_col)
        .filter((F.col("__mad4") > 0) & (F.abs(z) >= threshold))
        .select(*keep_cols, group_col, value_col, z.alias("robust_z"))
    )
