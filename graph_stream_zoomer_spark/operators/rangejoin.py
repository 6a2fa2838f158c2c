"""Bin-bucketized range (interval) join.

Problem: `probe JOIN intervals ON probe.ts BETWEEN i.start AND i.end`
has no equi-key, so Spark plans it as BroadcastNestedLoopJoin — O(n·m)
comparisons and a broadcast of one whole side. At 100 TB either side can
be billions of rows; BNLJ is a non-starter.

Spark-first fix (the classic bin-optimized range join, same idea as
Databricks' `spark.databricks.optimizer.rangeJoin.binSize` and the
as-of bucketing in operators/asof.py): quantize time into fixed-width
bins. A probe row lands in exactly ONE bin; an interval covers the
contiguous bin range [floor(start/w) .. floor(end/w)] and is exploded to
one row per covered bin. Joining on (optional equi-keys…, bin) is then a
plain shuffle hash/sort-merge join, and because each (probe, interval)
pair can only meet in the probe's single bin, the residual BETWEEN filter
yields exact results with NO duplicate elimination step.

Cost model: interval replication factor = ceil(span / bin_width) + 1, so
pick `bin_width` near the median interval span (replication ~2×). The
join itself is a key-partitioned shuffle — AQE handles skewed bins
(hot time ranges) with skew-join splitting; unbounded intervals are
rejected rather than silently exploding.

Reference parity: the reference has no range join; this is part of the
brief's beyond-reference temporal-join family (with operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MAX_BINS_PER_INTERVAL = 10_000


def interval_join(
    probe: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    on: list[str] | None = None,
    bin_width: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Exact range join via bin-bucketized equi-join.

    Returns probe rows joined to every interval row whose
    ``[start_col, end_col]`` (inclusive both ends) contains the probe's
    ``ts_col``, matching on the optional equi-keys ``on`` first.

    ``how``: "inner" or "left" (left keeps probe rows matching no
    interval, with interval columns NULL — same single equi-join: a probe
    row lands in exactly one bin, so it null-extends exactly once).

    Both timestamp columns must be non-null; intervals with
    ``end < start`` match nothing; an interval spanning more than
    ``_MAX_BINS_PER_INTERVAL`` bins raises at plan-build time via a
    runtime assertion column (guards against an unbounded interval
    silently exploding the build side).
    """
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    on = list(on or [])
    w_us = F.lit(_interval_us(bin_width))

    # NTZ-tolerant: unix_micros requires TIMESTAMP; parquet sources often
    # surface TIMESTAMP_NTZ. The cast is a no-op for TIMESTAMP and applies
    # the session zone (pinned to UTC repo-wide) for NTZ.
    def _micros(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    p_bin = F.floor(_micros(ts_col) / w_us).cast("long").alias("_bin")
    probe_b = probe.select("*", p_bin)

    start_bin = F.floor(_micros(start_col) / w_us).cast("long")
    end_bin = F.floor(_micros(end_col) / w_us).cast("long")
    n_bins = end_bin - start_bin + F.lit(1)
    guard = F.when(
        n_bins <= F.lit(_MAX_BINS_PER_INTERVAL), start_bin
    ).otherwise(
        F.raise_error(
            F.format_string(
                "interval_join: an interval spans %s bins (> %s) — raise "
                "bin_width or split the interval",
                n_bins.cast("string"),
                F.lit(str(_MAX_BINS_PER_INTERVAL)),
            )
        )
    )
    # Reversed intervals (end < start) match nothing by contract — filter
    # them out BEFORE the explode: end_bin < start_bin would make n_bins
    # <= 0 (passing the <= guard) and F.sequence(start, end) would emit a
    # DESCENDING sequence of unbounded length — the exact build-side
    # blowup the guard exists to prevent.
    iv_b = intervals.where(
        F.col(start_col).isNotNull()
        & F.col(end_col).isNotNull()
        & (F.col(end_col) >= F.col(start_col))
    ).select(
        "*",
        F.explode(F.sequence(guard, end_bin)).alias("_bin"),
    )

    cond = F.col("_bin") == F.col("_ibin")
    iv_b = iv_b.withColumnRenamed("_bin", "_ibin")
    for k in on:
        iv_b = iv_b.withColumnRenamed(k, f"_i_{k}")
        cond = cond & (F.col(k) == F.col(f"_i_{k}"))
    residual = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))

    # 'left' is the SAME single equi-join: a probe row has exactly one bin,
    # so when nothing matches (bin+keys+residual) it null-extends exactly
    # once — no anti-join/union detour needed.
    return probe_b.join(iv_b, cond & residual, how).drop(
        "_bin", "_ibin", *[f"_i_{k}" for k in on]
    )


def _interval_us(spec: str) -> int:
    """Parse '10 minutes' / '1 hour' / '90 seconds' to microseconds —
    shares the grammar subset of streaming/pipeline's interval handling
    (single unit, integral quantity) to keep bin specs portable."""
    parts = spec.strip().split()
    if len(parts) != 2:
        raise ValueError(f"bin_width must be '<n> <unit>', got {spec!r}")
    n = int(parts[0])
    unit = parts[1].rstrip("s").lower()
    mult = {
        "microsecond": 1,
        "millisecond": 1_000,
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }.get(unit)
    if mult is None or n <= 0:
        raise ValueError(f"unsupported bin_width {spec!r}")
    return n * mult
