"""Key-skew diagnostics — the planning tool behind the engine's explicit
skew handling (StreamGraphConfig.salt_buckets, the salted two-phase
aggregate in operators/grouping.py, and AQE skew-join at run time).

At 100 TB the question "is conv_id/role skewed enough to salt?" must be
answered by a cheap pre-pass, not by watching a straggler task die. The
profile is ONE map-side-combined groupBy over the keys plus a TakeOrdered
for the heavy hitters — no global sort, no driver-side data beyond top_k
rows — and every reported figure is integer arithmetic (ppm fixed-point),
so the output is hash-exact cross-engine and usable as a drift monitor
(profile today vs yesterday compares bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PPM = 1_000_000


def skew_profile(df: DataFrame, key_cols: list[str], top_k: int = 10) -> DataFrame:
    """Top-``top_k`` heaviest keys with fixed-point skew figures:

      rank          1 = heaviest (ties broken by key string, deterministic)
      key           the grouping key rendered as ':'-joined string
      cnt           rows carrying this key
      share_ppm     cnt / total_rows, parts-per-million (integer div)
      skew_ppm      cnt / mean_rows_per_key in ppm — 1_000_000 means the
                    key is exactly average; 50_000_000 means a 50× hot key
                    (the salted two-phase aggregate's trigger signal)

    Plan: groupBy keys (1 exchange, partial agg), 1-row totals broadcast,
    TakeOrderedAndProject for the top_k — no global sort."""
    if not key_cols:
        raise ValueError("skew_profile needs at least one key column")
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols]).alias("key")
    counts = df.select(key).groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.count(F.lit(1)).alias("_n_keys"), F.sum("cnt").alias("_n_rows")
    )
    joined = counts.crossJoin(F.broadcast(totals))
    ranked = joined.select(
        "key",
        "cnt",
        F.expr(f"div(cnt * {_PPM}, _n_rows)").alias("share_ppm"),
        # cnt / (rows/keys) = cnt*keys/rows, in ppm
        F.expr(f"div(cnt * _n_keys * {_PPM}, _n_rows)").alias("skew_ppm"),
    )
    # TakeOrdered first (no global sort over all keys); the rank window then
    # runs over only top_k already-collected-scale rows
    top = ranked.orderBy(F.desc("cnt"), F.asc("key")).limit(top_k)
    rank = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("key")))
    return top.select(
        rank.alias("rank"), "key", "cnt", "share_ppm", "skew_ppm"
    )


def suggest_salt_buckets(
    df: DataFrame, key_cols: list[str], target_rows_per_task: int = 5_000_000
) -> int:
    """Salt-bucket recommendation: ceil(heaviest key / target rows per
    task), 0 when no key exceeds the target (salting has a merge cost —
    don't pay it for balanced keys). Collects ONE number."""
    key = F.concat_ws(":", *[F.col(c).cast("string") for c in key_cols])
    row = (
        df.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").alias("max_cnt"))
        .first()
    )
    max_cnt = row["max_cnt"] or 0
    if max_cnt <= target_rows_per_task:
        return 0
    return -(-max_cnt // target_rows_per_task)
