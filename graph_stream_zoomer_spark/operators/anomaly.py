"""Rate-anomaly detection over an event stream: per-key time-bucket counts
scored against a trailing-window baseline (z-score) — the monitoring /
data-quality spike detector (ingest surges, bot bursts, broken producers).
Beyond-reference addition (no graph-stream-zoomer counterpart): part of
the training-data pipeline family, SURVEY.md §2.10.

Plan shape (the 100 TB contract):
  ONE exchange keyed by the series key — ``repartition(key)`` up front, so
  the (key, bucket) groupBy is satisfied by subset clustering and the
  trailing window (partitionBy key, orderBy bucket) rides the same
  exchange. Counts are exact BIGINTs; the trailing mean/std come from a
  CLOSED FORM over exact integer sums (sum, sum of squares) rather than
  float accumulation, so results are bit-identical regardless of
  partitioning, engine, or window-accumulator implementation — which is
  what makes the z-score oracle-checkable.

Batch-only by design (like BM25 / LM scoring): the trailing baseline
needs ordered bucket history; the streaming form is this same function
inside ``foreachBatch`` over a bucket-complete slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rate_anomalies(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket_seconds: int = 300,
    trailing: int = 12,
    min_trailing: int = 3,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per (key, bucket) event counts with trailing z-scores.

    Returns (key_col, bucket_start, n_events, trailing_n, z_score,
    is_anomaly): z = (n − mean)/std over the previous ``trailing`` buckets
    (sample std, closed form from exact integer sums); buckets with fewer
    than ``min_trailing`` predecessors or zero variance emit a null
    z_score and are never flagged. Empty buckets do not appear as zeros —
    the baseline is over OBSERVED buckets (gap-fill upstream if a
    dense grid is needed).

    Integer envelope: the closed form squares per-bucket counts in
    BIGINT, so Σx² stays exact while every (key, bucket) count is below
    ~sqrt(2^63/trailing) ≈ 8.7e8 (and (Σx)² below 2^63 → per-bucket
    counts ≲ 2.5e8 at trailing=12) — i.e. a SINGLE key sustaining
    ~800k events/second into one 5-minute bucket. Beyond that, shrink
    ``bucket_seconds`` (the z-score over such buckets is meaningless
    anyway) — the bound is per (key, bucket), not per corpus."""
    if trailing < min_trailing or min_trailing < 2:
        raise ValueError("need trailing >= min_trailing >= 2")
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / bucket_seconds)
        * bucket_seconds
    ).cast("bigint")
    counts = (
        events.repartition(F.col(key_col))
        .groupBy(F.col(key_col), bucket.alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    frame = (
        Window.partitionBy(key_col)
        .orderBy("bucket_start")
        .rowsBetween(-trailing, -1)
    )
    n = F.count(F.lit(1)).over(frame).cast("bigint")
    s = F.sum("n_events").over(frame).cast("bigint")
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(frame).cast("bigint")
    scored = counts.select(
        key_col,
        "bucket_start",
        F.col("n_events").cast("bigint").alias("n_events"),
        n.alias("trailing_n"),
        s.alias("_s"),
        s2.alias("_s2"),
    )
    mean = F.col("_s") / F.col("trailing_n")
    # sample variance from exact sums: (Σx² − (Σx)²/n) / (n − 1)
    var = (F.col("_s2") - F.col("_s") * F.col("_s") / F.col("trailing_n")) / (
        F.col("trailing_n") - 1
    )
    z = F.round((F.col("n_events") - mean) / F.sqrt(var), 5)
    usable = (F.col("trailing_n") >= min_trailing) & (var > 0)
    return scored.select(
        key_col,
        "bucket_start",
        "n_events",
        "trailing_n",
        F.when(usable, z).alias("z_score"),
        F.when(usable, z > z_threshold).otherwise(F.lit(False)).alias("is_anomaly"),
    )
