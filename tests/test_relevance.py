"""Unit tests for operators/relevance.py: BM25 / TF-IDF scoring,
heavy-hitter terms, and the count-min sketch twin."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.relevance import (
    bm25_scores,
    corpus_scalars,
    term_count_sketch,
    term_stats,
    tfidf_scores,
    top_terms,
)


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark streams data"),
            (2, "data lakes and data ponds"),
            (3, "pure gibberish only"),
        ],
        "doc_id bigint, text string",
    )


def test_term_stats(corpus):
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in term_stats(corpus).collect()
    }
    assert rows[(1, "spark")] == (2, 4)
    assert rows[(2, "data")] == (2, 5)
    assert rows[(3, "gibberish")] == (1, 3)


def test_corpus_scalars(corpus):
    r = corpus_scalars(corpus).first()
    assert r["n_docs"] == 3
    assert r["avgdl"] == pytest.approx((4 + 5 + 3) / 3)


def test_bm25_hand_computed(corpus):
    # query {spark, data}: df(spark)=1, df(data)=2, N=3, avgdl=4
    got = {r["doc_id"]: r for r in bm25_scores(corpus, ["spark", "data"]).collect()}
    assert set(got) == {1, 2}
    k1, b, avgdl = 1.2, 0.75, 4.0

    def bm25(tf, dl, df, n=3):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert got[1]["n_terms_hit"] == 2
    assert got[1]["score"] == pytest.approx(
        round(bm25(2, 4, 1) + bm25(1, 4, 2), 6), abs=1e-6
    )
    assert got[2]["n_terms_hit"] == 1
    assert got[2]["score"] == pytest.approx(round(bm25(2, 5, 2), 6), abs=1e-6)


def test_tfidf_hand_computed(corpus):
    got = {r["doc_id"]: r["score"] for r in tfidf_scores(corpus, ["data"]).collect()}
    # df(data)=2, N=3 → idf=ln(1.5); doc1 tf=1, doc2 tf=2
    assert got[1] == pytest.approx(round(math.log(1.5), 6), abs=1e-6)
    assert got[2] == pytest.approx(round((1 + math.log(2)) * math.log(1.5), 6), abs=1e-6)


def test_top_terms_deterministic_ties(corpus):
    rows = [(r["term"], r["n"]) for r in top_terms(corpus, k=3).collect()]
    # data ×3, spark ×2, then ties at 1 broken alphabetically ("and")
    assert rows == [("data", 3), ("spark", 2), ("and", 1)]


def test_query_term_filter_pushed_below_postings_exchange(corpus):
    """The scale claim: with a query-term filter, the (doc, term)
    postings exchange must carry only matching terms — Catalyst pushes
    the isin below the aggregate — and the corpus is never shuffled on
    the bare term key except for the tiny broadcast df build."""
    plan = (
        bm25_scores(corpus, ["spark"])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    # the filter must sit directly above the generate (pre-aggregate),
    # not above the aggregate: in the optimized plan that shows up as a
    # Filter containing the isin over the exploded term attribute below
    # every Aggregate node that consumes it.
    agg_pos = plan.index("Aggregate")
    filt_pos = plan.rindex("Filter")
    assert filt_pos > agg_pos, plan  # deepest Filter is below (printed after) the aggs


def test_count_min_sketch_bounds(spark, corpus):
    sk_bytes = term_count_sketch(corpus, eps=0.01, confidence=0.99)
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(sk_bytes))
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    total = 12  # tokens in the corpus
    exact = {"spark": 2, "data": 3, "gibberish": 1, "ponds": 1}
    for term, n in exact.items():
        est = sk.estimateCount(term)
        assert est >= n, (term, est, n)
        assert est <= n + math.ceil(0.01 * total) + 1, (term, est, n)


def test_lm_score_hand_computed(spark):
    """Unigram LM with add-0.5 smoothing, hand-checked: common-token docs
    score higher (less negative avg log10-prob, lower perplexity) than a
    rare-token doc; token counts exact."""
    from graph_stream_zoomer_spark.operators.relevance import lm_score

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog and the bird"),
            (2, "the cat"),
            (3, "zyzzyva qoph"),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    # N=12 tokens, V=7 vocab; p(the)=(4+.5)/(12+3.5), p(zyzzyva)=(1+.5)/15.5
    n, v, k = 12, 7, 0.5
    lp = lambda c: math.log10((c + k) / (n + k * v))
    assert out[2]["n_tokens"] == 2
    assert out[2]["avg_logprob10"] == pytest.approx((lp(4) + lp(2)) / 2, abs=1e-5)
    assert out[3]["avg_logprob10"] == pytest.approx(lp(1), abs=1e-5)
    # ordering: common-token doc beats rare-token doc on both renderings
    assert out[2]["avg_logprob10"] > out[3]["avg_logprob10"]
    assert out[2]["ppl10"] < out[3]["ppl10"]
    # token-less doc survives with NULL scores
    assert out[4]["n_tokens"] == 0 and out[4]["avg_logprob10"] is None
    # broadcast-model path is value-identical and plans a broadcast join
    bc = lm_score(docs, broadcast_model=True)
    assert {tuple(r) for r in bc.collect()} == {tuple(r) for r in out.values()}
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()


def test_lm_score_pretrained_model_excludes_oov(spark):
    """Cross-corpus scoring: tokens absent from the reference model drop
    out of the mean (inner join), so a doc of pure OOV scores NULL with
    its true token count intact."""
    from graph_stream_zoomer_spark.operators.relevance import lm_score, unigram_model

    ref = spark.createDataFrame(
        [(1, "alpha beta beta gamma")], "doc_id bigint, text string"
    )
    model = unigram_model(ref)
    new = spark.createDataFrame(
        [(10, "beta beta unknownword"), (11, "neverseen tokens")],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(new, model=model).collect()}
    n, v, k = 4, 3, 0.5
    assert out[10]["n_tokens"] == 2  # only the in-vocab tokens counted
    assert out[10]["avg_logprob10"] == pytest.approx(
        math.log10((2 + k) / (n + k * v)), abs=1e-5
    )
    assert out[11]["n_tokens"] == 0 and out[11]["ppl10"] is None
