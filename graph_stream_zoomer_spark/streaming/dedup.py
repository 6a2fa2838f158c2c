"""Streaming exact deduplication: emit the FIRST occurrence of each
distinct document fingerprint from a document stream, with state bounded
by the watermark.

The streaming twin of ``operators/dedup.exact_duplicates`` /
``fingerprint_duplicates`` for the ingest path of a training-data
pipeline: a crawler re-delivers the same page within hours, a log
replays a batch — dedup at ingest so the duplicate never lands. Built on
``dropDuplicatesWithinWatermark`` (Spark 3.5+): rows are emitted
immediately on first sight (no window-close latency — this is NOT an
aggregation), per-fingerprint state is evicted once the watermark passes
the first-seen timestamp + delay, so state is O(distinct fingerprints
per watermark horizon), not O(stream history). Duplicates farther apart
than the delay are NOT caught — that is the documented contract
(within-watermark dedup); corpus-wide exact dedup remains the batch
operator's job.

At 100 TB/day the fingerprint state shuffles once on the fingerprint key
(the same exchange any exact dedup pays) and the per-key payload is the
16-byte md5 + timestamp — millions of keys per GB of state; use the
RocksDB state backend (``run_grouping_job(state_store="rocksdb")``
pattern) past heap scale.

Batch twin (same output contract, for backfills and the parity tests):
``first_occurrence`` — min (ts, tiebreak) row per fingerprint via one
window pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import normalized_text


def _fingerprint(text_col: str, normalized: bool) -> Column:
    c = normalized_text(text_col) if normalized else F.col(text_col)
    return F.md5(c)


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark_delay: str = "10 minutes",
    normalized: bool = True,
) -> DataFrame:
    """First-occurrence dedup of a STREAMING document frame.

    Adds a ``fingerprint`` column (md5 of the — optionally normalized —
    text) and drops every later row with a fingerprint already seen
    within the watermark horizon. Emits in append mode with no window
    latency. The input must carry an event-time column ``ts_col``.
    """
    if not stream.isStreaming:
        raise ValueError("dedup_stream expects a streaming DataFrame; "
                         "use first_occurrence for batch frames")
    return (
        stream.withColumn("fingerprint", _fingerprint(text_col, normalized))
        .withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def first_occurrence(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = "ts",
    normalized: bool = True,
) -> DataFrame:
    """Batch twin of ``dedup_stream``: the earliest row per fingerprint
    (by ``ts_col`` then ``id_col``; by ``id_col`` alone when the frame
    has no timestamp). One window exchange on the fingerprint key."""
    order = [F.col(ts_col).asc()] if ts_col else []
    order.append(F.col(id_col).asc())
    w = Window.partitionBy("fingerprint").orderBy(*order)
    return (
        docs.withColumn("fingerprint", _fingerprint(text_col, normalized))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
