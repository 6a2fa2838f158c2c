"""BPE trainer + encoders — operators/bpe.py.

The training expectation is the classic Sennrich corpus hand-computed:
corpus = low×5, lower×2, newest×3, widest×1. Pair counts give
(l,o)=7 tie (o,w)=7 → lexicographic tie-break picks (l,o); then (lo,w)=7;
then (e,s)=4 tie (s,t)=4 → (e,s); then (es,t)=4."""

from __future__ import annotations

import pandas as pd
import pytest

from graph_stream_zoomer_spark.operators.bpe import (
    bpe_token_counts,
    encode_bpe_expr,
    merges_as_df,
    pdf_encode_bpe,
    train_bpe,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "low low low low low"),
            (2, "lower lower"),
            (3, "newest newest newest"),
            (4, "widest"),
        ],
        "doc_id long, text string",
    )


def test_train_bpe_classic_corpus(spark):
    merges = train_bpe(_corpus(spark), n_merges=4)
    assert merges == [("l", "o", 7), ("lo", "w", 7), ("e", "s", 4), ("es", "t", 4)]
    mdf = merges_as_df(spark, merges)
    assert [tuple(r) for r in mdf.collect()][0] == (1, "l", "o", "lo", 7)


def test_token_counts_under_trained_merges(spark):
    docs = _corpus(spark)
    merges = train_bpe(docs, n_merges=4)
    got = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in bpe_token_counts(docs, merges).collect()}
    # low→[low]=1 sym; lower→[low,e,r]=3; newest→[n,e,w,est]=4; widest→[w,i,d,est]=4
    assert got == {1: (5, 5), 2: (2, 6), 3: (3, 12), 4: (1, 4)}


def test_catalyst_and_arrow_encoders_agree(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = train_bpe(docs, n_merges=6)
    cat = {
        r.doc_id: r.enc
        for r in docs.select("doc_id", encode_bpe_expr("text", merges).alias("enc")).collect()
    }
    pdf = docs.select("doc_id", "text").toPandas()
    arrow = dict(zip(pdf["doc_id"], pdf_encode_bpe(pdf["text"], merges)))
    assert cat == arrow and len(cat) > 0


def test_same_pair_run_semantics_pinned(spark):
    """Grid BPE's documented deviation: runs of ≥4 identical pairs merge
    pass-bounded, identically in every engine. 'aaaaa' under merge (a,a)
    segments [aa, a, aa] (exact BPE would give [aa, aa, a]) — counts
    agree, segmentation is pinned so it can't drift."""
    merges = [("a", "a", 99)]
    docs = spark.createDataFrame([(1, "aaaaa")], "doc_id long, text string")
    enc = docs.select(encode_bpe_expr("text", merges).alias("e")).first().e
    assert enc == "aa a aa"
    assert pdf_encode_bpe(pd.Series(["aaaaa"]), merges).iloc[0] == "aa a aa"
    counts = bpe_token_counts(docs, merges).first()
    assert (counts.n_words, counts.n_bpe_tokens) == (1, 3)


def test_train_bpe_guards(spark):
    docs = _corpus(spark)
    with pytest.raises(ValueError, match="max_vocab"):
        train_bpe(docs, n_merges=2, max_vocab=2)
    with pytest.raises(ValueError, match="exhausted"):
        train_bpe(
            spark.createDataFrame([(1, "ab ab")], "doc_id long, text string"),
            n_merges=3,  # only (a,b) exists; round 2 has no pairs left
        )
