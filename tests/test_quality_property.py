"""Property-based invariants for the round-3 curation operators:
hypothesis generates random corpora and checks ``repeated_spans`` and
the Gopher metrics against independent driver-side reimplementations
of the documented semantics."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ctgov_ai_etl_spark.operators.quality import gopher_quality, repeated_spans

# Small vocabulary forces span collisions; docs of 0-12 tokens around a
# span width of 3 exercise the shorter-than-n guard, exact-n docs, and
# multi-span overlaps.
_word = st.sampled_from(["a", "bb", "ccc", "the", "of", "x1", "#!"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _python_repeated_spans(texts: dict[int, str], n: int) -> dict[int, int]:
    spans = {
        i: {
            " ".join(toks[j : j + n])
            for j in range(len(toks) - n + 1)
        }
        for i, t in enumerate(texts.values())
        for toks in [t.split(" ")]
        if len(toks) >= n
    }
    ids = list(texts)
    owned = {ids[i]: s for i, s in spans.items()}
    out = {}
    for i, s in owned.items():
        shared = {sp for sp in s if any(sp in o for j, o in owned.items() if j != i)}
        if shared:
            out[i] = len(shared)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc, min_size=1, max_size=8))
def test_repeated_spans_matches_python_reference(spark, docs):
    texts = dict(enumerate(docs))
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_dup_spans"] for r in repeated_spans(df, n=3).collect()
    }
    assert got == _python_repeated_spans(texts, 3)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc.filter(lambda t: t != ""), min_size=1, max_size=6))
def test_gopher_metrics_match_python_reference(spark, docs):
    texts = dict(enumerate(docs))
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}
    for i, t in texts.items():
        toks = t.split(" ")
        assert got[i]["n_words"] == len(toks)
        assert got[i]["mean_word_len"] == round(
            sum(len(w) for w in toks) / len(toks), 6
        )
        alpha = sum(1 for w in toks if any(c.isascii() and c.isalpha() for c in w))
        assert got[i]["alpha_frac"] == round(alpha / len(toks), 6)
        stop = {"the", "be", "to", "of", "and", "that", "have", "with"}
        assert got[i]["n_stop"] == len(set(toks) & stop)


def _python_snm(texts: dict[int, str], w: int, t: float, kt: int) -> dict:
    order = sorted(texts, key=lambda i: (" ".join(texts[i].split()[:kt]), i))
    out = {}
    for x in range(len(order)):
        for y in range(x + 1, min(x + 1 + w, len(order))):
            a, b = order[x], order[y]
            sa, sb = set(texts[a].split(" ")), set(texts[b].split(" "))
            if not (sa | sb):
                continue
            jac = round(len(sa & sb) / len(sa | sb), 6)
            if jac >= t:
                out[(a, b)] = jac
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=st.lists(_doc, min_size=2, max_size=10, unique=True))
def test_sorted_neighborhood_matches_python_reference(spark, docs):
    """Differential fuzz: random small corpora, SNM pair set ==
    the direct python replay of sort-by-key → w-window → Jaccard.
    Random docs exercise empty texts, shared prefixes (rank ties fall
    to doc_id), and sub-window corpora."""
    from ctgov_ai_etl_spark.operators.dedup import sorted_neighborhood_pairs

    texts = dict(enumerate(docs))
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in sorted_neighborhood_pairs(
            df, window=2, threshold=0.4, key_tokens=2
        ).collect()
    }
    assert got == _python_snm(texts, w=2, t=0.4, kt=2)
