"""Streaming twins of the mergeable sketches (operators/sketches.py).

Both sketches are ALGEBRAIC — counters add, bitmaps bit_or — so their
streaming forms are plain windowed aggregations over the built-in state
store: no custom keyed state, no Python in the hot path, and exactly the
shuffle profile of the batch twins (one partially-aggregated exchange).
Append mode emits each window's finished sketch on watermark close; the
idempotent bit_or/count merge also makes update-mode re-emission safe for
at-least-once sinks.

State size is bounded by construction, independent of stream volume:
≤ depth·width counters (CMS) or ≤ num_bits/32 words (bloom) per open
window — the property that makes these the right summaries at 10^12-turn
scale, where per-key exact state would be unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.sketches import _hash32, _word_and_bit


def windowed_cms(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    window_duration: str = "10 minutes",
    width: int = 1024,
    depth: int = 4,
    watermark_delay: str = "10 minutes",
    reproducible: bool = False,
) -> DataFrame:
    """Per-window count-min sketch of ``value_col``'s frequency: one row per
    (window, row_idx, bucket). Each window's sketch equals the batch
    ``cms_sketch`` of that window's rows (parity-pinned), and consecutive
    windows' sketches merge by counter addition for coarser rollups."""
    c = F.col(value_col)
    buckets = F.array(
        *[F.pmod(_hash32(c, r, reproducible), F.lit(width)) for r in range(depth)]
    )
    # NULL values are skipped exactly like the batch twin (cms_sketch):
    # without the filter, xxhash64 mode would count NULL as one phantom
    # heavy value and md5 mode would emit bucket=NULL rows
    pairs = (
        stream.withWatermark(ts_col, watermark_delay)
        .where(c.isNotNull())
        .select(F.col(ts_col), F.posexplode(buckets).alias("row_idx", "bucket"))
    )
    return pairs.groupBy(
        F.window(ts_col, window_duration).alias("window"), "row_idx", "bucket"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def windowed_hll(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    window_duration: str = "10 minutes",
    b: int = 8,
    watermark_delay: str = "10 minutes",
    reproducible: bool = False,
) -> DataFrame:
    """Per-window HyperLogLog registers as (window, bucket, max_rho) —
    windowed distinct-count summaries with ≤ 2^b state rows per open
    window. MAX-merge is idempotent (replays harmless); feeding the rows
    to ``operators.sketches.hll_estimate`` (grouped by window) yields the
    per-window distinct estimate; MAX-merging adjacent windows' registers
    rolls them up to coarser grains."""
    from graph_stream_zoomer_spark.operators.sketches import hll_registers

    # hll_registers is a plain projection + groupBy-max: pass the window
    # column through as the group key and it is streaming-legal as-is
    wm = stream.withWatermark(ts_col, watermark_delay).select(
        F.window(ts_col, window_duration).alias("window"), F.col(value_col)
    )
    return hll_registers(wm, value_col, b=b, group_cols=["window"],
                         reproducible=reproducible)


def windowed_bloom(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    window_duration: str = "10 minutes",
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
    watermark_delay: str = "10 minutes",
    reproducible: bool = False,
) -> DataFrame:
    """Per-window bloom bitmap of ``value_col`` as (window, word, bits) —
    the window's membership summary for downstream bloom_semi_join pruning
    of that window's keys. bit_or is idempotent, so replayed micro-batches
    cannot corrupt the bitmap. Parity with batch ``bloom_bits`` per window
    is pinned in tests."""
    c = F.col(value_col)
    positions = F.array(
        *[F.pmod(_hash32(c, r, reproducible), F.lit(num_bits)) for r in range(num_hashes)]
    )
    # NULL values skipped like the batch twin (bloom_bits): a NULL word
    # key would crash map_from_entries in downstream bitmap builds
    exploded = (
        stream.withWatermark(ts_col, watermark_delay)
        .where(c.isNotNull())
        .select(F.col(ts_col), F.explode(positions).alias("pos"))
    )
    word, bit = _word_and_bit(F.col("pos"))
    pairs = exploded.select(
        F.col(ts_col), word.alias("word"), bit.alias("bit")
    )
    return pairs.groupBy(
        F.window(ts_col, window_duration).alias("window"), "word"
    ).agg(F.expr("bit_or(bit)").alias("bits"))
