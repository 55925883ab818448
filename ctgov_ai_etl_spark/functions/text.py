"""Text-analysis column expressions: tokenization, counting, quality
scoring, language-ID heuristic, fingerprinting.

All pure built-in expressions (codegen'd, UDF-free).  Each has an
exact SQL mirror for the DuckDB oracle; ratios are rational
arithmetic over integer counts, so results are bit-identical across
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def tokens(text: Column) -> Column:
    """Whitespace tokens (the corpus is space-separated; a BPE-ish
    pre-tokenizer would swap in a regexp pattern here)."""
    return F.split(text, TOKEN_SPLIT)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def unique_token_count(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def avg_token_len(text: Column) -> Column:
    """Exact: total token chars / token count (integer counts, one
    double division)."""
    total = F.aggregate(
        tokens(text), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / token_count(text)


# Stopword markers per language. On real corpora these are the usual
# high-frequency function words; the testdata vocabulary is English
# word-soup, so the non-English lists are present for mechanism (and
# return 0 scores) — the operator is the deterministic scoring shape,
# not a trained model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "la", "de", "y"),
    "fr": ("le", "la", "les", "et"),
    "zh": ("的", "是", "了"),
}


def lang_marker_score(text: Column, lang: str) -> Column:
    """Count of marker-token occurrences for ``lang``.

    NOTE: inlines a tokenize per call — fine standalone; queries that
    score several languages should tokenize ONCE into a column and use
    :func:`lang_id_from_tokens` (Catalyst does not CSE repeated
    subexpression trees across projection items, so five inlined
    scores mean five splits of the text per row).
    """
    toks = tokens(F.lower(text))
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id_from_tokens(toks: Column, default: str = "en") -> Column:
    """Argmax over marker scores from a pre-tokenized (lower-cased)
    array column; ties/zeros → ``default``, fixed language order."""
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))
        for lang in LANG_MARKERS
    }
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in LANG_MARKERS:
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def lang_id(text: Column, default: str = "en") -> Column:
    """Argmax over marker scores; ties/zeros → ``default``.  Evaluated
    as a deterministic CASE cascade in fixed language order."""
    scores = {lang: lang_marker_score(text, lang) for lang in LANG_MARKERS}
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in LANG_MARKERS:  # fixed order → deterministic tie-break
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = ("the", "a", "of")) -> Column:
    toks = tokens(F.lower(text))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return n_stop.cast("double") / F.size(toks)


def punct_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^\w\s]", "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + stopword
    presence − punctuation excess.  Deliberately simple, exactly
    SQL-mirrorable; weights are the operator's config surface."""
    n = token_count(text)
    length_ok = F.when((n >= 20) & (n <= 1000), F.lit(0.5)).otherwise(F.lit(0.0))
    stop_part = F.least(stopword_ratio(text) * 2, F.lit(0.3))
    punct_penalty = F.least(punct_ratio(text), F.lit(0.2))
    return F.round(length_ok + stop_part + F.lit(0.2) - punct_penalty, 9)


def md5_fingerprint(text: Column) -> Column:
    """Canonical-form document fingerprint: md5 of the
    whitespace-normalized, lower-cased text (identical hex in every
    engine — exact-dup detection key)."""
    normal = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    return F.md5(normal)


def add_lang_id(df, tok_col: str, out_col: str = "lang_guess", default: str = "en"):
    """Language-ID over a pre-tokenized lower-cased array column with
    the marker SCORES materialized as real columns first: the argmax
    cascade references each score twice per level, so inline score
    trees double per level (2^n_langs filter scans by the last
    language) — attribute references don't (the no-CSE lesson).
    Returns ``df`` with ``out_col`` appended; score columns dropped."""
    from pyspark.sql import functions as F

    def _marker_pred(markers):
        # factory, not a default-arg lambda: F.filter treats a 2-param
        # lambda as (element, index) and would bind the index to it
        return lambda t: t.isin(*markers)

    for lang in LANG_MARKERS:
        df = df.withColumn(
            f"__score_{lang}",
            F.size(F.filter(F.col(tok_col), _marker_pred(LANG_MARKERS[lang]))),
        )
    best_lang, best_score = F.lit(default), F.lit(0)
    for lang in LANG_MARKERS:
        is_better = F.col(f"__score_{lang}") > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, F.col(f"__score_{lang}")).otherwise(best_score)
    return df.withColumn(out_col, best_lang).drop(
        *[f"__score_{lang}" for lang in LANG_MARKERS]
    )


def chunk_tokens(
    text, size: int, overlap: int = 0
):
    """Split ``text`` into token windows of ``size`` with ``overlap``
    (stride = size - overlap) — the context-length chunking step of a
    training pipeline, as one array expression: chunk i covers tokens
    [i·stride, i·stride + size). The tail keeps its partial window.
    Returns array<struct<chunk_id int, chunk string>>; explode it for
    one-row-per-chunk. Pure map-side — no shuffle, no Python."""
    from pyspark.sql import functions as F

    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap
    # Single-space split — the repo-wide tokenization contract shared
    # with the DuckDB string_split(text, ' ') oracles (dedup_chunks_
    # global, pipeline_curate_chunks); \s+ would diverge on tabs or
    # consecutive spaces (advisor r8).
    toks = F.split(text, " ")
    n = F.size(toks)
    n_chunks = F.ceil((n - F.lit(overlap)).cast("double") / stride).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
    return F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            F.concat_ws(" ", F.slice(toks, i * stride + 1, size)).alias("chunk"),
        ),
    )


def top_token_ratio(toks: Column) -> Column:
    """Most-frequent-token share of the document (Gopher-style
    repetition signal).  Pure HOF expression: O(distinct × n) per row
    with a small distinct set — map-side, no explode, no shuffle."""
    counts = F.transform(
        F.array_distinct(toks),
        lambda t: F.size(F.filter(toks, lambda x: x == t)),
    )
    return F.array_max(counts) / F.size(toks).cast("double")


def bigram_strings(toks: Column) -> Column:
    """Adjacent-token bigrams joined with one space; empty for docs
    shorter than 2 tokens (negative ``sequence`` spans count down)."""
    idx = F.sequence(F.lit(1), F.size(toks) - 1)
    bg = F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    return F.when(F.size(toks) >= 2, bg).otherwise(
        F.array().cast("array<string>")
    )


def dup_bigram_frac(toks: Column) -> Column:
    """Fraction of bigram occurrences that are repeats of an earlier
    bigram in the same document (1 - distinct/total); 0.0 for docs
    with <2 tokens."""
    bg = bigram_strings(toks)
    return F.when(
        F.size(bg) > 0,
        F.lit(1.0) - F.size(F.array_distinct(bg)) / F.size(bg).cast("double"),
    ).otherwise(F.lit(0.0))


def hash_embedding(text: Column, dim: int = 64) -> Column:
    """Feature-hashed bag-of-words document embedding (the hashing
    trick, Weinberger et al. '09): every token lands in bucket
    md5(token) mod ``dim`` with sign from the next md5 bit, summed
    into an exact integer vector — the cheap text→vector path that
    lets the embedding-tier operators (SemDeDup, ANN, JL) run on a
    corpus with no external embedding model.  Pure map-side fold,
    array<long> output (exact in every engine; normalize downstream
    if cosine geometry is needed)."""
    toks = tokens(text)
    return F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), dim),
        lambda acc, t: F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda a, i: a
            + F.when(
                F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
                % dim
                == i,
                F.when(
                    F.conv(F.substring(F.md5(t), 9, 1), 16, 10).cast("long")
                    % 2
                    == 0,
                    F.lit(1),
                ).otherwise(F.lit(-1)),
            ).otherwise(F.lit(0)),
        ),
    )
