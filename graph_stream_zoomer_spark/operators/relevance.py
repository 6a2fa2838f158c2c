"""Corpus relevance statistics: TF-IDF / BM25 scoring and heavy-hitter
term counts — the ranking workhorses of a retrieval-augmented training
pipeline (score documents against a query term set; surface the terms
that dominate a corpus).

Plan shapes at 100 TB:

- ``term_stats``: doc length is computed from the token array BEFORE the
  explode (so it rides every posting for free), then one map-side-
  combined exchange on (doc, term). When callers filter to a query's
  terms, Catalyst pushes the term predicate below that exchange — the
  shuffle carries only matching postings, not the corpus vocabulary.
- ``bm25_scores``: the QUERY side is tiny (a handful of terms), so its
  document frequencies aggregate to a handful of rows and the corpus-
  wide scalars (N, avgdl) are single-row aggregates; both are broadcast.
  No corpus-sized shuffle on the term key, ever.
- ``top_terms``: global term counts (one map-side-combined shuffle on
  term) followed by ``orderBy(...).limit(k)`` which Spark executes as
  TakeOrderedAndProject — per-partition top-k heaps merged on the
  driver, NO global sort of the vocabulary.
- ``term_count_sketch``: count-min sketch aggregate (binary, mergeable)
  — the bounded-memory twin of exact counts for streaming ingest.

Tokenization matches the dedup/decontam family (``normalized_text`` →
whitespace split) so relevance scores compose with those operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, normalized_text


def _tokens(text_col: str) -> Column:
    return F.filter(
        F.split(normalized_text(text_col), " "), lambda t: F.length(t) > 0
    )


def term_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-(doc, term) frequencies plus the doc's total token count.

    Returns ``(id_col, term, tf, dl)`` — ``tf`` the term's in-doc count,
    ``dl`` the document length in tokens. ``dl`` is the token-array size
    taken BEFORE the explode and carried through the aggregate with
    ``max`` (constant per doc), so the whole thing is one exchange on
    (doc, term) and a term filter stacked on top pushes below it.
    """
    base = _spread(docs).select(
        F.col(id_col), _tokens(text_col).alias("__t")
    )
    toks = base.select(
        id_col,
        F.size("__t").alias("__dl"),
        F.explode("__t").alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("__dl").alias("dl")
    )


def corpus_scalars(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row frame ``(n_docs, avgdl)`` — document count and average
    token length. A single narrow scan + scalar aggregate (mergeable);
    broadcast by the scorers."""
    return docs.select(F.size(_tokens(text_col)).alias("__dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("__dl").alias("avgdl")
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 score of every document against ``query_terms``.

    Returns ``(id_col, n_terms_hit, score)`` for docs matching at least
    one query term, ``score`` rounded to 6 decimals (engine-portable).
    idf uses the Robertson-Spärck Jones form with the +1 floor:
    ``ln(1 + (N - df + 0.5) / (df + 0.5))`` — never negative.

    The postings exchange carries only query-term rows (pushed filter);
    df aggregates to |query| rows joined broadcast; (N, avgdl) is a
    broadcast one-row cross join.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = sorted({t.lower() for t in query_terms})
    postings = term_stats(docs, id_col, text_col).where(F.col("term").isin(qt))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = corpus_scalars(docs, id_col, text_col)
    idf = (
        df_t.crossJoin(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.ln(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .select("term", "idf", "avgdl")
    )
    hits = postings.join(F.broadcast(idf), "term").withColumn(
        "_s",
        F.col("idf")
        * (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("_s"), 6).alias("score"),
    )


def tfidf_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Classic TF-IDF (ltc-style, un-normalized): per-doc
    ``sum((1 + ln(tf)) * ln(N / df))`` over the query terms. Same plan
    shape as bm25_scores."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qt = sorted({t.lower() for t in query_terms})
    postings = term_stats(docs, id_col, text_col).where(F.col("term").isin(qt))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scalars = corpus_scalars(docs, id_col, text_col)
    idf = (
        df_t.crossJoin(F.broadcast(scalars))
        .withColumn("idf", F.ln(F.col("n_docs") / F.col("df")))
        .select("term", "idf")
    )
    hits = postings.join(F.broadcast(idf), "term").withColumn(
        "_s", (1.0 + F.ln(F.col("tf"))) * F.col("idf")
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.round(F.sum("_s"), 6).alias("score"),
    )


def top_terms(
    docs: DataFrame,
    k: int = 100,
    min_length: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ``k`` globally most frequent terms: ``(term, n)``, ties broken
    by term (deterministic). Executes as map-side-combined term counts +
    TakeOrderedAndProject — no global vocabulary sort."""
    toks = _spread(docs).select(F.explode(_tokens(text_col)).alias("term"))
    if min_length > 1:
        toks = toks.where(F.length("term") >= min_length)
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), F.asc("term")).limit(k)


def term_count_sketch(
    docs: DataFrame,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
    text_col: str = "text",
) -> bytes:
    """Count-min sketch of the corpus term stream (binary, mergeable) —
    the bounded-memory twin of exact term counts for 100 TB streaming
    ingest. Estimate(t) ≥ true(t), and ≤ true(t) + eps·total with
    probability ``confidence``; tests pin both bounds."""
    toks = _spread(docs).select(F.explode(_tokens(text_col)).alias("term"))
    row = toks.agg(
        F.count_min_sketch(
            "term", F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("sk")
    ).first()
    return bytes(row["sk"])


def unigram_model(
    docs: DataFrame,
    add_k: float = 0.5,
    text_col: str = "text",
) -> DataFrame:
    """Train an add-k-smoothed unigram language model over the corpus:
    ``(term, logprob10)`` with logprob10 = log10((c + k) / (N + k·V)).

    Fully declarative — the corpus scalars (N total tokens, V vocabulary
    size) are a single-row aggregate broadcast back onto the counts, so
    training is ONE map-side-combined exchange on the term key and no
    driver-side action. At 100 TB persist the result as a vocabulary
    table (it is the reusable artifact)."""
    toks = _spread(docs).select(F.explode(_tokens(text_col)).alias("term"))
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("_n"), F.count(F.lit(1)).alias("_v")
    )
    return counts.crossJoin(F.broadcast(totals)).select(
        "term",
        F.log10(
            (F.col("c") + F.lit(add_k))
            / (F.col("_n") + F.lit(add_k) * F.col("_v"))
        ).alias("logprob10"),
    )


def lm_score(
    docs: DataFrame,
    model: DataFrame | None = None,
    add_k: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
    decimals: int = 5,
) -> DataFrame:
    """CCNet-style language-model quality score per document: mean token
    log10-probability under a unigram LM plus the perplexity proxy
    ``ppl10 = 10^(-avg_logprob10)`` (lower = more typical of the corpus).
    Gibberish / boilerplate-free filtering signal: CCNet (arXiv:1911.00359)
    ranks CommonCrawl text by exactly this statistic (there with a KenLM
    5-gram; the unigram form is the lib-free in-engine equivalent and the
    oracle-checkable one).

    ``model=None`` self-trains on ``docs`` (every token in-vocabulary);
    pass a pre-trained :func:`unigram_model` frame to score a stream
    against a reference corpus — out-of-vocabulary tokens then score NULL
    and are excluded from the mean (pre-append an OOV row if you want
    them penalized instead).

    Plan: score pass = one term-key join of the postings against the
    model, then one doc-key aggregate. At 100 TB either
    ``broadcast_model=True`` (top-K vocabulary fits in memory; the tail's
    mass is the smoothing constant) or leave the shuffle join and bucket
    both sides by term. Token-less documents survive with n_tokens=0 and
    NULL scores (LEFT join back onto the doc ids)."""
    if model is None:
        model = unigram_model(docs, add_k, text_col)
    if broadcast_model:
        model = F.broadcast(model)
    toks = _spread(docs).select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    )
    scored = (
        toks.join(model, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logprob10"), decimals).alias("avg_logprob10"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
            "avg_logprob10",
            F.round(F.pow(F.lit(10.0), -F.col("avg_logprob10")), 3).alias("ppl10"),
        )
    )
