"""Aggregate function descriptors (A1-A5).

Reference parity: the logical descriptor mirrors
``impl/functions/aggregation/CustomizedAggregationFunction.java:33-60``
(property key in, aggregate property key out); the physical Flink UDAFs
(TableCount/TableMinProperty/TableMaxProperty/TableSumProperty/
TableAvgProperty, each with createAccumulator/accumulate/merge/getValue)
collapse to native Spark aggregate expressions, which already execute as
partial+final hash aggregates (map-side combine before the shuffle).

Each descriptor additionally exposes a *decomposed* partial/merge form used
by the salted two-phase aggregation (skew defense — SURVEY.md §4; the
reference has none) and by the streaming final-merge stage.

Deliberate divergences from reference quirks (SURVEY.md §2.3):
  - MaxProperty: reference seeds the accumulator with Double.MIN_VALUE (the
    smallest *positive* double) and is wrong for all-negative inputs
    (``aggregation/TableMaxProperty.java:38-52``). Spark ``max`` is correct.
  - SumProperty: reference returns NULL for a legitimate zero sum
    (``aggregation/TableSumProperty.java:70-80``). We return 0.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class AggregateFunction:
    """One aggregate over a (numeric) property key.

    ``kind`` ∈ {count,min,max,sum,avg}; ``property_key`` is None for count.
    ``output_key`` is the emitted property name (reference: 'count',
    f'min_{k}', ... — aggregation/Count.java:36-66 etc.).
    """

    kind: str
    property_key: str | None = None
    _output_key: str | None = None
    param: float | None = None

    @property
    def output_key(self) -> str:
        if self._output_key:
            return self._output_key
        if self.kind == "count":
            return "count"
        if self.kind in ("percentile", "approx_percentile"):
            tag = f"p{int(round(self.param * 100))}"
            if self.kind == "approx_percentile":
                tag += "approx"
            return f"{tag}_{self.property_key}"
        if self.kind == "collect_set":
            return f"set_{self.property_key}"
        if self.kind == "count_distinct":
            return f"nd_{self.property_key}"
        return f"{self.kind}_{self.property_key}"

    @property
    def input_type(self) -> str:
        """Promotion cast for the aggregate's input column: the numeric
        family aggregates doubles; the set family keeps the raw property
        STRING (property bags are map<string,string>)."""
        return "string" if self.kind in ("collect_set", "count_distinct") else "double"

    # -- direct (single-phase) form -------------------------------------
    def agg_expr(self, input_col: str) -> Column:
        """Aggregate over the promoted property column (already double)."""
        if self.kind == "count":
            return F.count(F.lit(1)).alias(self.output_key)
        if self.kind == "stddev":
            return F.stddev_samp(F.col(input_col)).alias(self.output_key)
        if self.kind == "percentile":
            return F.percentile(F.col(input_col), F.lit(self.param)).alias(self.output_key)
        if self.kind == "approx_percentile":
            # fixed high accuracy: the mergeable-sketch (KLL-style) form for
            # 100 TB — bounded state per group vs percentile's full buffer
            return F.approx_percentile(
                F.col(input_col), F.lit(self.param), F.lit(10000)
            ).alias(self.output_key)
        if self.kind == "collect_set":
            # sorted comma-joined rendering (engine-portable; deterministic
            # regardless of accumulation order); all-null group → NULL so the
            # null-dropping property fold and SQL string_agg agree
            return F.nullif(
                F.array_join(F.array_sort(F.collect_set(F.col(input_col))), ","),
                F.lit(""),
            ).alias(self.output_key)
        if self.kind == "count_distinct":
            # size(collect_set) rather than countDistinct: same value, but
            # legal in streaming aggregations (countDistinct is not), so the
            # batch and streaming twins share one expression; state per group
            # is bounded by the value cardinality
            return (
                F.size(F.collect_set(F.col(input_col))).cast("bigint").alias(self.output_key)
            )
        fn = getattr(F, self.kind)
        return fn(F.col(input_col)).alias(self.output_key)

    # -- decomposed (partial / merge) form for salted 2-phase agg --------
    def partial_exprs(self, input_col: str) -> list[Column]:
        p = f"_p_{self.output_key}"
        if self.kind == "count":
            return [F.count(F.lit(1)).alias(p)]
        if self.kind == "avg":
            return [
                F.sum(F.col(input_col)).alias(p + "_sum"),
                F.count(F.col(input_col)).alias(p + "_cnt"),
            ]
        if self.kind == "stddev":
            # algebraic: (n, Σx, Σx²) partials merge exactly
            return [
                F.count(F.col(input_col)).alias(p + "_cnt"),
                F.sum(F.col(input_col)).alias(p + "_sum"),
                F.sum(F.col(input_col) * F.col(input_col)).alias(p + "_sq"),
            ]
        if self.kind in ("collect_set", "count_distinct"):
            # per-salt distinct sets merge exactly (set union is algebraic)
            return [F.collect_set(F.col(input_col)).alias(p)]
        if self.kind in ("percentile", "approx_percentile"):
            # not algebraic: a per-salt partial would need an exposed
            # mergeable sketch buffer, which Spark SQL does not surface.
            # Percentiles of a hot key are exactly what salting would have
            # protected — callers must run them unsalted (the windowed
            # state already bounds per-key cardinality) or pre-bucket.
            raise ValueError(
                f"{self.kind} aggregates are not salt-decomposable; "
                "use salt_buckets=0 for this grouping"
            )
        fn = getattr(F, self.kind)
        return [fn(F.col(input_col)).alias(p)]

    def merge_expr(self) -> Column:
        p = f"_p_{self.output_key}"
        if self.kind == "count":
            return F.sum(F.col(p)).alias(self.output_key)
        if self.kind == "avg":
            return (F.sum(F.col(p + "_sum")) / F.sum(F.col(p + "_cnt"))).alias(self.output_key)
        if self.kind == "stddev":
            n = F.sum(F.col(p + "_cnt"))
            s = F.sum(F.col(p + "_sum"))
            sq = F.sum(F.col(p + "_sq"))
            # sample variance from merged moments; greatest(0, ·) guards
            # float cancellation. NULL for n < 2 matches stddev_samp under
            # Spark 3.0+ defaults (SPARK-13860: singleton groups return
            # NULL; NaN only under spark.sql.legacy.statisticalAggregate=
            # true, which this engine does not support in salted mode) —
            # so the salted two-phase plan and the direct plan agree on
            # singleton groups, pinned by tests/test_dataops.py's
            # test_stddev_aggregate_direct_and_salted_merge.
            var = F.greatest(F.lit(0.0), (sq - s * s / n) / (n - 1))
            return F.when(n >= 2, F.sqrt(var)).alias(self.output_key)
        if self.kind == "sum":
            return F.sum(F.col(p)).alias(self.output_key)
        if self.kind in ("collect_set", "count_distinct"):
            union = F.array_distinct(F.flatten(F.collect_list(F.col(p))))
            if self.kind == "count_distinct":
                return F.size(union).cast("bigint").alias(self.output_key)
            return F.nullif(
                F.array_join(F.array_sort(union), ","), F.lit("")
            ).alias(self.output_key)
        fn = getattr(F, self.kind)
        return fn(F.col(p)).alias(self.output_key)

    def merge_agg_expr(self) -> Column:
        """Merge expr usable inside .agg (avg needs post-division)."""
        return self.merge_expr()


def Count() -> AggregateFunction:
    return AggregateFunction("count")


def MinProperty(key: str) -> AggregateFunction:
    return AggregateFunction("min", key)


def MaxProperty(key: str) -> AggregateFunction:
    return AggregateFunction("max", key)


def SumProperty(key: str) -> AggregateFunction:
    return AggregateFunction("sum", key)


def AvgProperty(key: str) -> AggregateFunction:
    return AggregateFunction("avg", key)


def StddevProperty(key: str) -> AggregateFunction:
    """Sample standard deviation — beyond-reference aggregate, fully
    algebraic ((n, Σx, Σx²) partials), so it participates in the salted
    two-phase aggregation unlike the percentile family."""
    return AggregateFunction("stddev", key)


def CollectSetProperty(key: str) -> AggregateFunction:
    """Distinct property values per group, rendered as the sorted
    comma-joined string (deterministic, engine-portable) — the graph-
    summarization "which values occur in this super-vertex" aggregate the
    reference family lacks. Streaming-legal (collect_set) and salt-
    decomposable (set union is algebraic); state per group is bounded by
    the property's value cardinality, so use on low-cardinality
    properties (roles, tools, languages) at 100 TB.

    Encoding caveat: the comma-join renders a set whose only member is
    the empty string identically to the empty set (→ NULL, property
    dropped); CountDistinctProperty still counts it. Pre-filter
    empty-string property values if the distinction matters."""
    return AggregateFunction("collect_set", key)


def CountDistinctProperty(key: str) -> AggregateFunction:
    """Exact distinct-value count per group via size(collect_set) — the
    streaming-legal form (countDistinct raises in streaming aggregations),
    shared verbatim by the batch and streaming twins. For unbounded-
    cardinality keys at 100 TB prefer the HLL sketch
    (approx_count_distinct, see `graph_group_window_users`)."""
    return AggregateFunction("count_distinct", key)


def PercentileProperty(key: str, p: float = 0.5) -> AggregateFunction:
    """Exact interpolated percentile (median by default) — beyond-reference
    aggregate (the reference family stops at avg); matches DuckDB's
    quantile_cont definition for oracle checks. Exact form buffers the
    group's values: fine under windowed grouping (state bounded per
    (window, key)); at 100 TB prefer ApproxPercentileProperty."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"percentile must be in [0, 1], got {p}")
    return AggregateFunction("percentile", key, param=p)


def ApproxPercentileProperty(key: str, p: float = 0.5) -> AggregateFunction:
    """approx_percentile sketch twin — bounded state per group, mergeable
    internally by Spark's partial aggregation; the 100 TB form."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"percentile must be in [0, 1], got {p}")
    return AggregateFunction("approx_percentile", key, param=p)
