"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by exact word n-grams.

The standard pretraining hygiene step (popularized by GPT-3's 13-gram
dedup against eval sets): any training document sharing enough word
n-grams with a benchmark document leaks test data into training and must
be dropped. At 100 TB the asymmetry is the whole design: the corpus is
enormous, the benchmark n-gram set is tiny (eval suites are MBs), so the
probe must be a broadcast of the benchmark grams against the streamed-by
corpus grams — never a shuffle of the corpus on gram, and never a
doc×benchmark join.

Plan shape: one projection builds each doc's distinct n-gram array (and
its size), one explode + broadcast-hash left join marks hits, one
map-side-combinable groupBy(doc_id) counts them. Exactly one exchange
(on doc_id), zero corpus-sized shuffles on the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, word_shingles


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 13, text_col: str = "text"
) -> DataFrame:
    """Distinct word n-grams of the benchmark set — the broadcast side.
    One column ``gram``; callers typically persist this tiny frame."""
    return (
        _spread(benchmark)
        .select(F.explode(word_shingles(text_col, n)).alias("gram"))
        .distinct()
    )


def benchmark_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    min_hits: int = 1,
) -> DataFrame:
    """Per-document overlap with the benchmark n-gram set.

    Returns ``(id_col, n_hit, n_grams, overlap_ratio)`` for every document
    with at least ``min_hits`` overlapping n-grams (``min_hits=0`` keeps
    all docs). ``overlap_ratio`` = hits / the doc's distinct-gram count —
    the decontamination decision is typically ``n_hit >= 1`` (GPT-3 style)
    or a small ratio threshold for fuzzier suites.

    Tokenization matches the dedup family (``normalized_text`` →
    whitespace split), so a gram here equals a gram in the jaccard/minhash
    operators and the oracle SQL.
    """
    bench = benchmark_ngrams(benchmark, n, bench_text_col or text_col)
    grams = _spread(docs).select(
        F.col(id_col),
        word_shingles(text_col, n).alias("__grams"),
    ).select(
        id_col,
        F.size("__grams").alias("n_grams"),
        F.explode("__grams").alias("gram"),
    )
    hit = grams.join(
        F.broadcast(bench).withColumn("__hit", F.lit(1)), "gram", "left"
    )
    out = hit.groupBy(id_col).agg(
        F.count("__hit").alias("n_hit"),
        F.max("n_grams").alias("n_grams"),
    )
    out = out.withColumn(
        "overlap_ratio",
        F.round(F.col("n_hit") / F.col("n_grams"), 6),
    )
    return out.where(F.col("n_hit") >= min_hits)
