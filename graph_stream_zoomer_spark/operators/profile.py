"""Single-pass table profiling: per-column null counts, cardinality and
min/max over any DataFrame — the "what did we just ingest" primitive of
a data pipeline (schema drift, null explosions, cardinality blowups are
all caught here before they poison a training run).

Plan shape at 100 TB: ONE scan, ONE aggregate. All statistics for all
columns are computed in a single Aggregate node; the default cardinality
estimator is ``approx_count_distinct`` (HyperLogLog), which keeps the
plan a plain two-level mergeable aggregate — no shuffle of data rows at
all (partial aggs reduce to one row per partition; the final exchange
moves one row per partition). ``exact_distinct=True`` switches to exact
``COUNT(DISTINCT col)`` per column — engine-portable for the SQL oracle,
but each distinct aggregate multiplies scan rows through Spark's Expand
operator (one duplicate per distinct column), so at corpus scale the
HLL default is the right form. The wide one-row result is unpivoted
driver-side-free via an array-of-structs explode.

min/max are cast to string AFTER aggregation so one schema fits every
column type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str)``, one output row per profiled column.

    ``n_distinct`` excludes NULL (both estimators agree on that).
    """
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        nd = F.count_distinct(F.col(c)) if exact_distinct else F.approx_count_distinct(c)
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_str"),
                F.col(f"__mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")
