"""Summary-graph structure analytics: exact triangle counting and degree
statistics over a weighted edge list — companions to
operators/pagerank.py for the grouped-graph output (beyond-reference
addition, SURVEY.md §2.10; no graph-stream-zoomer counterpart — the
summary stream exists to feed exactly this kind of downstream analytics).

Triangle counting is the canonical-ordering two-join formulation
(Suri & Vassilvitskii, WWW'11 node-iterator shape): edges normalize to
a < b simple undirected pairs, each triangle {x < y < z} is found exactly
once as (x,y)⋈(y,z) semi-joined against (x,z). All-integer — results are
exact and engine-portable by construction. Scale: two equi-joins keyed by
vertex; skewed hubs are the classic hazard and the canonical ordering
already halves hub fan-out (only higher-id neighbors join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_edges(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """Distinct undirected a < b pairs; self-loops dropped."""
    e = edges.select(
        F.least(F.col(src_col), F.col(dst_col)).alias("a"),
        F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
    )
    return e.where(F.col("a") != F.col("b")).distinct()


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-vertex triangle participation counts (vertex, n_triangles),
    exact BIGINTs; vertices in no triangle are omitted (join upstream
    degrees for a dense view)."""
    e = _canonical_edges(edges, src_col, dst_col)
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])  # one row per triangle x<y<z
    verts = (
        tri.select(F.col("x").alias("vertex"))
        .union(tri.select("y"))
        .union(tri.select("z"))
    )
    return verts.groupBy("vertex").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles")
    )


def degree_stats(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-vertex directed degree summary over the weighted edge list:
    (vertex, out_degree, in_degree, out_weight, in_weight) — exact
    BIGINTs, absent side = 0. One union + one groupBy."""
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    outs = edges.select(
        F.col(src_col).alias("vertex"),
        F.lit(1).cast("bigint").alias("od"),
        F.lit(0).cast("bigint").alias("id_"),
        w.alias("ow"),
        F.lit(0).cast("bigint").alias("iw"),
    )
    ins = edges.select(
        F.col(dst_col).alias("vertex"),
        F.lit(0).cast("bigint").alias("od"),
        F.lit(1).cast("bigint").alias("id_"),
        F.lit(0).cast("bigint").alias("ow"),
        w.alias("iw"),
    )
    return (
        outs.union(ins)
        .groupBy("vertex")
        .agg(
            F.sum("od").alias("out_degree"),
            F.sum("id_").alias("in_degree"),
            F.sum("ow").alias("out_weight"),
            F.sum("iw").alias("in_weight"),
        )
    )
