"""Exact-substring (span-level) deduplication — the ExactSubstr family of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
arXiv:2107.06499), re-expressed as pure Catalyst over a documents table.

Doc-level dedup (operators/dedup.py) drops whole near-identical documents;
this operator finds REPEATED SUBSTRINGS — boilerplate headers, license
blocks, quoted passages — that recur across (or within) otherwise-distinct
documents, and reports them as merged character spans per document.

Algorithm (suffix-array semantics approximated on a window grid):
  1. Each doc emits fixed-length windows of ``span_len`` chars at stride
     ``stride`` (plus the tail window ending at the last char, so doc ends
     are never blind). Pure projection: ``sequence`` + ``substring`` +
     hash — no Python, no shuffle.
  2. A window instance is *duplicated* when its content hash occurs
     ``min_count``+ times corpus-wide. Count and the global first-occurrence
     rank are both computed in ONE window exchange on the hash (no
     groupBy+join pair — the count rides the same sort as the rank).
     ``keep_first=True`` exempts the globally first occurrence
     (ordered by (doc, pos)) — the Lee et al. "keep one copy" policy.
  3. Per doc, overlapping/adjacent duplicated windows merge into maximal
     spans (gaps-and-islands: lag + running sum on the doc exchange).

Exactness: with ``stride=1`` every duplicated ``span_len``-char substring
is found (the true ExactSubstr semantic, O(len) windows/doc); larger
strides trade recall at span *boundaries* (detection is quantized to the
window grid) for an O(len/stride) emit rate — duplicated regions longer
than ``span_len + stride`` are still always hit.

Scale notes (100 TB):
  - One shuffle keyed by span hash + one keyed by doc id; the per-doc
    merge aggregate reuses the doc exchange (subset clustering).
  - The window fan-out is O(len/stride) compact (id, pos, hash) triples —
    the substring itself is dropped before the exchange.
  - Hot boilerplate hashes skew the hash exchange exactly like hot
    shingles in n-gram Jaccard; they are also precisely the spans the
    operator exists to find, so there is no df-cap analog — AQE skew-join
    handling / salting the rank by hash prefix is the mitigation lever.
  - Hash choice mirrors dedup.py: xxhash64 default, md5 ``reproducible``
    mode for the cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _spread


def duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 40,
    stride: int = 10,
    min_count: int = 2,
    keep_first: bool = False,
    reproducible: bool = False,
    already_parallel: bool | None = None,
) -> DataFrame:
    """Merged duplicated-substring spans per document.

    Returns (id_col, span_start, span_end, n_windows): [span_start,
    span_end) is a maximal 0-based char interval covered by duplicated
    windows; n_windows is how many grid windows merged into it.
    """
    if span_len < 1 or stride < 1 or min_count < 2:
        raise ValueError("span_len/stride must be >= 1 and min_count >= 2")
    L, S = span_len, stride
    last = (F.length(F.col(text_col)) - L).cast("int")
    positions = F.array_distinct(
        F.concat(F.sequence(F.lit(0), last, F.lit(S)), F.array(last))
    )
    win = F.substring(F.col(text_col), F.col("pos") + 1, L)
    h = F.md5(win) if reproducible else F.xxhash64(win)
    keyed = (
        _spread(docs.where(F.length(F.col(text_col)) >= L), already_parallel)
        .select(id_col, text_col)
        .withColumn("pos", F.explode(positions))
        .select(id_col, F.col("pos").cast("bigint").alias("pos"), h.alias("h"))
    )
    # count + first-occurrence rank share ONE exchange (and one sort) on h
    ordered = Window.partitionBy("h").orderBy(id_col, "pos")
    everything = ordered.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    dup = keyed.select(
        id_col,
        "pos",
        F.count(F.lit(1)).over(everything).alias("n"),
        F.row_number().over(ordered).alias("rk"),
    ).where(F.col("n") >= min_count)
    if keep_first:
        dup = dup.where(F.col("rk") > 1)
    # gaps-and-islands merge on the doc exchange
    by_doc = Window.partitionBy(id_col).orderBy("pos")
    prev = F.lag("pos").over(by_doc)
    isl = dup.select(
        id_col,
        "pos",
        F.sum(
            F.when(prev.isNull() | (F.col("pos") > prev + L), 1).otherwise(0)
        )
        .over(by_doc)
        .alias("island"),
    )
    return isl.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + L).alias("span_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
    ).drop("island")


def strip_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_len: int = 40,
    stride: int = 10,
    min_count: int = 2,
    reproducible: bool = False,
    already_parallel: bool | None = None,
) -> DataFrame:
    """Remove every duplicated span except its globally-first occurrence
    (Lee et al. keep-one policy), preserving all other bytes.

    The cut is a Catalyst ``aggregate`` fold over the doc's sorted span
    array — zero Python, one extra doc-keyed join against the span list
    (which arrives already partitioned by doc from duplicate_spans's merge
    aggregate). Docs with no duplicated spans pass through untouched.
    Output: input columns with ``text_col`` replaced by the stripped text.
    """
    spans = duplicate_spans(
        docs,
        id_col=id_col,
        text_col=text_col,
        span_len=span_len,
        stride=stride,
        min_count=min_count,
        keep_first=True,
        reproducible=reproducible,
        already_parallel=already_parallel,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("span_start", "span_end"))).alias(
            "_spans"
        )
    )
    t = F.col(text_col)
    init = F.struct(
        F.lit(0).cast("bigint").alias("prev"), F.lit("").alias("acc")
    )
    folded = F.aggregate(
        F.col("_spans"),
        init,
        lambda a, s: F.struct(
            s["span_end"].alias("prev"),
            F.concat(
                a["acc"],
                t.substr(
                    (a["prev"] + 1).cast("int"),
                    (s["span_start"] - a["prev"]).cast("int"),
                ),
            ).alias("acc"),
        ),
        lambda a: F.concat(
            a["acc"], t.substr((a["prev"] + 1).cast("int"), F.length(t))
        ),
    )
    out = docs.join(per_doc, id_col, "left")
    cleaned = F.when(F.col("_spans").isNull(), t).otherwise(folded)
    return out.withColumn(text_col, cleaned).drop("_spans")


def span_coverage(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc duplicated-char coverage: a quality signal joinable into
    quality_filter (docs that are mostly boilerplate score near 1.0).
    Returns every doc (zero-coverage docs included) with dup_chars and
    dup_ratio."""
    agg = spans.groupBy(id_col).agg(
        F.sum(F.col("span_end") - F.col("span_start")).alias("dup_chars")
    )
    return docs.join(agg, id_col, "left").select(
        id_col,
        F.coalesce(F.col("dup_chars"), F.lit(0)).cast("bigint").alias("dup_chars"),
        F.round(
            F.coalesce(F.col("dup_chars"), F.lit(0))
            / F.greatest(F.length(F.col(text_col)), F.lit(1)),
            5,
        ).alias("dup_ratio"),
    )
