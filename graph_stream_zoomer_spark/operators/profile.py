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


def profile_sketch(
    df: DataFrame,
    columns: list[str] | None = None,
    lgk: int = 12,
) -> DataFrame:
    """ONE wide row of MERGEABLE profile partials — the incremental /
    streaming form of ``profile`` (SURVEY §2.10 streaming stance for
    ``table_profile``, now executable instead of declared):

    - ``__n`` row count, ``__nn_<col>`` null counts: sums (algebraic).
    - ``__nd_<col>``: a Datasketches HLL sketch (``hll_sketch_agg``,
      binary) — unions losslessly across batches, unlike
      ``approx_count_distinct`` whose estimate is final. Values are cast
      to string first (injective for every profiled type), because the
      sketch aggregate accepts numeric/string/binary only.
    - ``__mn_/__mx_<col>``: NATIVE-typed min/max (casting to string
      before the merge would corrupt numeric ordering: "9" > "10").

    Per micro-batch: append this one row to a profile log (parquet);
    the running profile = ``finalize_profile(merge_profile_sketches(
    log))`` at read time — no mutable state, exactly-once by
    construction when the log append is idempotent (foreachBatch +
    batch-id keying, as in streaming/sink.py).
    """
    from pyspark.sql.functions import hll_sketch_agg

    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            hll_sketch_agg(F.col(c).cast("string"), lgk).alias(f"__nd_{c}"),
            F.min(c).alias(f"__mn_{c}"),
            F.max(c).alias(f"__mx_{c}"),
        ]
    return df.agg(*aggs)


def merge_profile_sketches(parts: DataFrame) -> DataFrame:
    """Merge a frame of ``profile_sketch`` rows (one per batch/partition/
    day — any granularity) into ONE wide row: counts sum, HLL sketches
    union (register-wise max — lossless, order-insensitive), min/max
    reduce in their native types. One tiny aggregate: the input is one
    row per merged unit, never data-sized."""
    from pyspark.sql.functions import hll_union_agg

    aggs = []
    for f in parts.schema.fields:
        n = f.name
        if n == "__n" or n.startswith("__nn_"):
            aggs.append(F.sum(n).alias(n))
        elif n.startswith("__nd_"):
            aggs.append(hll_union_agg(n).alias(n))
        elif n.startswith("__mn_"):
            aggs.append(F.min(n).alias(n))
        elif n.startswith("__mx_"):
            aggs.append(F.max(n).alias(n))
        else:
            raise ValueError(f"not a profile_sketch column: {n}")
    return parts.agg(*aggs)


def finalize_profile(wide: DataFrame) -> DataFrame:
    """Unpivot a (merged) ``profile_sketch`` row to ``profile``'s output
    schema: (col_name, n_rows, n_nulls, n_distinct, min_str, max_str).
    n_distinct = the HLL estimate (exact while the sketch is in sparse
    mode, i.e. small cardinalities — the parity test relies on that)."""
    from pyspark.sql.functions import hll_sketch_estimate

    cols = [f.name[len("__nn_"):] for f in wide.schema.fields if f.name.startswith("__nn_")]
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                hll_sketch_estimate(F.col(f"__nd_{c}")).alias("n_distinct"),
                F.col(f"__mn_{c}").cast("string").alias("min_str"),
                F.col(f"__mx_{c}").cast("string").alias("max_str"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(entries).alias("p")).select("p.*")
