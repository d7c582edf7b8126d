"""TF-IDF / BM25 ranking (operators/ranking.py)."""

import pytest

from db_loganalyzer_spark.operators.ranking import (
    bm25_search,
    term_frequencies,
    tfidf_top_terms,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark spark engine"),
        (2, "duck engine engine"),
        (3, "spark duck engine"),
        (4, "zebra   zebra\nengine"),  # whitespace-normalized tokenizer
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_term_frequencies(corpus):
    tf = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_frequencies(corpus).collect()
    }
    assert tf[(1, "spark")] == 3
    assert tf[(4, "zebra")] == 2
    assert (4, "") not in tf


def test_tfidf_ranks_distinctive_terms_first(corpus):
    top = tfidf_top_terms(corpus, top_k=1)
    best = {r["doc_id"]: r["term"] for r in top.collect()}
    # 'engine' appears in all 4 docs -> idf 0; the rare term must win
    assert best[1] == "spark"
    assert best[2] == "duck"
    assert best[4] == "zebra"
    # ubiquitous term scores exactly 0
    zero = tfidf_top_terms(corpus, top_k=5).filter("term = 'engine'")
    assert all(r["score"] == 0.0 for r in zero.collect())


def test_bm25_scores_and_coverage(corpus):
    out = bm25_search(corpus, "spark duck", top_k=10).collect()
    scores = {r["doc_id"]: r["score"] for r in out}
    hits = {r["doc_id"]: r["n_terms_hit"] for r in out}
    assert 4 not in scores  # no query term -> not returned
    assert hits[3] == 2 and hits[1] == 1
    # doc 3 matches both terms; doc 1 repeats one term — BM25's tf
    # saturation must keep the two-term doc on top
    assert scores[3] > scores[1]
    assert all(s > 0 for s in scores.values())


def test_bm25_empty_query_raises(corpus):
    with pytest.raises(ValueError):
        bm25_search(corpus, "   ")


def test_bm25_topk_plan(corpus):
    # the final top-k must compile to TakeOrderedAndProject, not a
    # global sort of every scored document.
    out = bm25_search(corpus, "spark", top_k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bigram_lm_counts(spark):
    from db_loganalyzer_spark.operators.ranking import bigram_lm_counts

    df = spark.createDataFrame(
        # single token: no pairs; empty / punctuation-only texts: zero
        # tokens, which once drove F.slice's length to -1 and raised
        # INVALID_PARAMETER_VALUE.LENGTH, killing the whole job — they
        # must contribute nothing, not crash.
        [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, ""), (5, "..!!")],
        "doc_id: long, text: string",
    )
    out = {
        (r["w1"], r["w2"]): (r["n"], r["p_cond"])
        for r in bigram_lm_counts(df).collect()
    }
    # pairs never cross documents: no ("b", "a") from doc1-end -> doc2-start
    assert out[("a", "b")] == (3, 1.0)   # 'a' always followed by 'b'
    assert out[("b", "a")] == (1, 0.5)
    assert out[("b", "c")] == (1, 0.5)
    assert ("x", None) not in out and len(out) == 3


def test_doc_lm_scores_hand_computed(spark):
    import math

    from db_loganalyzer_spark.operators.ranking import doc_lm_scores

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x"), (4, "")],
        "doc_id: long, text: string",
    )
    out = {
        r["doc_id"]: (r["n_pairs"], r["cross_entropy"], r["perplexity"])
        for r in doc_lm_scores(df).collect()
    }
    # LM: p(b|a)=1, p(a|b)=p(c|b)=0.5; nll micro-units rounded per pair
    nll = {p: int(round(round(-math.log(v), 6) * 1e6)) for p, v in
           {("a", "b"): 1.0, ("b", "a"): 0.5, ("b", "c"): 0.5}.items()}
    e1 = (nll[("a", "b")] * 2 + nll[("b", "a")]) / 1e6 / 3
    e2 = (nll[("a", "b")] + nll[("b", "c")]) / 1e6 / 2
    assert out[1] == (3, e1, round(math.exp(e1), 6))
    assert out[2] == (2, e2, round(math.exp(e2), 6))
    # <2-token docs surface with zero pairs and NULL scores, not dropped
    assert out[3] == (0, None, None)
    assert out[4] == (0, None, None)
    # boilerplate (all-predictable pairs) scores lower entropy than mixed
    assert out[1][1] < out[2][1]
