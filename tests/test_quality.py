"""Unit tests for the corpus-quality operators (operators/quality.py):
Gopher rule bounds on constructed texts and repeated-span detection on
planted duplicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from ctgov_ai_etl_spark.operators.quality import (
    GOPHER_MIN_WORDS,
    gopher_quality,
    repeated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rules_pass_and_fail_bounds(spark):
    good = " ".join(
        ["the", "be", "to", "of", "and"] + ["word"] * (GOPHER_MIN_WORDS - 5)
    )
    short = "too short to pass"
    symbols = " ".join(["###", "$$$", "%%%"] * 20)  # no alphabetic words
    df = _docs(spark, [(1, good), (2, short), (3, symbols)])
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}

    assert out[1]["gopher_pass"] is True
    assert out[1]["n_words"] == GOPHER_MIN_WORDS
    assert out[1]["n_stop"] == 5
    assert out[2]["gopher_pass"] is False  # word count below minimum
    assert out[3]["gopher_pass"] is False
    assert out[3]["alpha_frac"] == 0.0


def test_gopher_mean_word_len_bounds(spark):
    # 60 1-char words: mean length 1 < 3 -> fail despite the stop words.
    thin = " ".join(["the", "of"] + ["a"] * 58)
    # 60 12-char words: mean length ~11.7 > 10 -> fail.
    fat = " ".join(["the", "of"] + ["x" * 12] * 58)
    df = _docs(spark, [(1, thin), (2, fat)])
    out = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    assert out[1]["gopher_pass"] is False
    assert out[2]["gopher_pass"] is False


def test_repeated_spans_finds_planted_duplicates(spark):
    span = " ".join(f"tok{i}" for i in range(16))
    a = "alpha " + span + " omega"
    b = "beta prelude " + span  # shares the 16-token span with a
    c = " ".join(f"uniq{i}" for i in range(40))  # long, no shared span
    df = _docs(spark, [(1, a), (2, b), (3, c)])
    out = {r["doc_id"]: r["n_dup_spans"] for r in repeated_spans(df, n=16).collect()}

    assert set(out) == {1, 2}
    # doc 1: spans starting at 'alpha' and at span start both cannot
    # match doc 2 except the exact planted one; doc 2 symmetric.
    assert out[1] >= 1 and out[2] >= 1
    # anti-join = span-deduplicated corpus: only the unique doc remains
    survivors = df.join(
        repeated_spans(df, n=16), "doc_id", "left_anti"
    ).select("doc_id")
    assert [r["doc_id"] for r in survivors.collect()] == [3]


def test_repeated_spans_ignores_intra_doc_repeats(spark):
    # The same span twice INSIDE one doc is not a cross-doc duplicate.
    span = " ".join(f"tok{i}" for i in range(16))
    df = _docs(spark, [(1, span + " bridge " + span)])
    assert repeated_spans(df, n=16).count() == 0


def test_bigram_lm_score_hand_computed(spark):
    """Exact hand replay of the add-one bigram LM on a 3-doc corpus:
    corpus = 'a b a b', 'a b', 'c' — bigram counts {'a b': 2+1? ...}
    computed below from first principles; the 1-token doc drops out."""
    import math

    from ctgov_ai_etl_spark.operators.quality import bigram_lm_score

    d = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in bigram_lm_score(d).collect()}

    # corpus bigrams: doc1 -> [a b, b a, a b], doc2 -> [a b]
    # c2: {'a b': 3, 'b a': 1}; c1 (context): {'a': 3, 'b': 1}; V=3 (a,b,c)
    def lp(c2, c1, v=3):
        return round(math.log((c2 + 1) / float(c1 + v)) * 1_000_000)

    u_ab, u_ba = lp(3, 3), lp(1, 1)
    assert 3 not in out  # single-token doc has no bigrams
    assert out[2].n_bigrams == 1
    assert out[2].avg_logprob == round(u_ab / 1_000_000 / 1, 6)
    assert out[1].n_bigrams == 3
    assert out[1].avg_logprob == round((2 * u_ab + u_ba) / 1_000_000 / 3, 6)
    # smoothing sanity: frequent bigram scores higher than rare one
    assert out[2].avg_logprob > u_ba / 1_000_000


def test_linear_quality_score_hand_computed(spark):
    """Exact replay of the md5-weight fold for one tiny doc, plus the
    zero-shuffle plan claim (no Exchange in the executed plan)."""
    import hashlib

    from ctgov_ai_etl_spark.operators.quality import linear_quality_score

    d = spark.createDataFrame([(7, "x y")], "doc_id long, text string")
    out = linear_quality_score(d)
    row = out.collect()[0]

    def w(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % 2_000_001 - 1_000_000

    expect = w("x") + w("y") + w("x y")
    assert row.n_features == 3
    assert row.logit_micro == expect
    assert row.keep == (expect >= 0)
    assert row.mean_logit == round(expect / 1_000_000 / 3, 6)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # inference is map-side, scan speed


def test_remove_boilerplate_lines_multiline(spark):
    """Multi-line behavior: the footer shared by 3 docs is stripped
    from all of them (all occurrences, order preserved); the line
    shared by only 2 docs survives; a doc that was pure boilerplate
    blanks out."""
    from ctgov_ai_etl_spark.operators.quality import remove_boilerplate_lines

    docs = [
        (1, "unique alpha\nCOMMON FOOTER\nunique beta"),
        (2, "semi common\nCOMMON FOOTER"),
        (3, "COMMON FOOTER\nsemi common\nCOMMON FOOTER"),
        (4, "COMMON FOOTER"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_boilerplate_lines(d, min_docs=3).collect()}
    assert out[1].clean_text == "unique alpha\nunique beta"
    assert out[1].n_removed == 1 and out[1].n_lines == 3
    assert out[2].clean_text == "semi common"  # 2 docs < min_docs: kept
    assert out[3].clean_text == "semi common"  # both occurrences stripped
    assert out[3].n_removed == 2
    assert out[4].clean_text == "" and out[4].n_removed == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="boilerplate set"):
        remove_boilerplate_lines(d, min_docs=1, max_boilerplate=2)


def test_boilerplate_removal_idempotent(spark):
    """Fixed point: re-running removal on the cleaned corpus changes
    nothing — every line that survived occurs in < min_docs docs, so
    the second pass's boilerplate set is empty."""
    from ctgov_ai_etl_spark.operators.quality import remove_boilerplate_lines

    docs = [
        (1, "unique alpha\nCOMMON FOOTER\nunique beta"),
        (2, "semi common\nCOMMON FOOTER"),
        (3, "COMMON FOOTER\nsemi common\nCOMMON FOOTER"),
        (4, "COMMON FOOTER"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    once = remove_boilerplate_lines(d, min_docs=3).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = remove_boilerplate_lines(once, min_docs=3)
    assert all(r.n_removed == 0 for r in twice.collect())


def test_hash_embedding_hand_computed(spark):
    """Exact replay of the hashing trick for a 2-token doc: each
    token contributes ±1 at md5-derived (bucket, sign); all other
    coordinates stay 0."""
    import hashlib

    from ctgov_ai_etl_spark.functions.text import hash_embedding

    d = spark.createDataFrame([(1, "alpha beta")], "doc_id long, text string")
    vec = d.select(hash_embedding(F.col("text"), dim=64).alias("v")).collect()[0].v

    expect = [0] * 64
    for t in ("alpha", "beta"):
        h = hashlib.md5(t.encode()).hexdigest()
        b = int(h[:8], 16) % 64
        expect[b] += 1 if int(h[8], 16) % 2 == 0 else -1
    assert vec == expect
    assert sum(abs(x) for x in vec) == 2
