"""Integer-exact PageRank over a weighted edge list — summary-graph
analytics, the downstream consumer of this engine's grouping output (the
reference's super-vertex/super-edge stream exists precisely to feed graph
analytics like this; reference has no analytics of its own — beyond-
reference addition, SURVEY.md §2.10).

All arithmetic is FIXED-POINT INTEGER (ranks in parts-per-``scale``,
damping in ppm): each edge's contribution is truncated integer division,
so per-round sums are order-free and the result is bit-identical across
engines, partitionings, and runs — an iterative float algorithm made
oracle-checkable (the DuckDB oracle unrolls the same rounds as
MATERIALIZED CTEs; cf. the BPE/kmeans unroll precedent).

Semantics: ``dangling="drop"`` (default — oracle-compatible; vertices
without out-edges leak their rank and totals shrink, the common
simplification) or ``dangling="redistribute"`` (the standard textbook
formulation: the summed rank of dangling vertices is split uniformly
across ALL vertices each round, conserving total rank to within integer
truncation). Redistribution stays integer-exact: the dangling sum is a
single tiny driver-collected scalar per round (one extra count-style
aggregate — no extra data-sized shuffle). Out-weight splitting is
proportional to edge weight.

Scale shape: the per-round work is one ranks⋈edges join on src + one
groupBy dst — both shuffles keyed by vertex; summary graphs (grouped
labels) are small, but the plan is the generic edge-partitioned form that
holds for billion-edge graphs. Lineage is truncated per round with
``localCheckpoint`` (same caveat as operators/components.py: prefer a
reliable checkpoint dir on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_exact(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 8,
    damping_ppm: int = 850_000,
    scale: int = 1_000_000,
    dangling: str = "drop",
) -> DataFrame:
    """(vertex, rank_ppm) after ``iters`` rounds; rank_ppm is the rank in
    parts-per-``scale`` as an exact BIGINT. ``dangling``: "drop" (default)
    or "redistribute" (uniform dangling-mass redistribution, conserves
    total rank to within truncation — pinned by tests/test_pagerank.py)."""
    if iters < 1 or not (0 < damping_ppm < scale):
        raise ValueError("need iters >= 1 and 0 < damping_ppm < scale")
    if dangling not in ("drop", "redistribute"):
        raise ValueError("dangling must be 'drop' or 'redistribute'")
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    # verts is referenced every round (the left join that re-adds
    # zero-in-degree vertices) — materialize it ONCE so the union+distinct
    # over the edge list isn't re-executed per iteration; together with the
    # eager per-round ranks checkpoint below this keeps each round's jobs
    # (the redistribute d_sum collect included) O(1) in lineage depth.
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        return verts.select(F.col("v").alias("vertex"), F.lit(0).cast("bigint").alias("rank_ppm"))
    ow = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = e.join(ow, "src").localCheckpoint(eager=True)
    base = (scale - damping_ppm) // n
    ranks = verts.select("v", F.lit(scale // n).cast("bigint").alias("r"))
    # dangling = vertices with no out-edges (only relevant for redistribute)
    dangling_verts = (
        verts.join(ow, verts.v == ow.src, "left_anti").localCheckpoint(eager=True)
        if dangling == "redistribute"
        else None
    )
    if dangling_verts is not None and dangling_verts.isEmpty():
        # no dangling vertices: skip the per-round Σ-rank collect job
        # entirely (it would return NULL and extra=0 every iteration)
        dangling_verts = None
    for _ in range(iters):
        inc = (
            ew.join(ranks, ew.src == ranks.v)
            .select(
                F.col("dst").alias("v"),
                F.expr(f"({damping_ppm} * ((r * w) div outw)) div {scale}").alias(
                    "c"
                ),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("inc"))
        )
        extra = 0
        if dangling_verts is not None:
            # one tiny scalar per round: Σ rank over dangling vertices,
            # damped and split uniformly (integer division — truncation
            # loss < n ppm/round, the conservation bound the test pins)
            d_sum = (
                ranks.join(dangling_verts, "v", "left_semi")
                .agg(F.sum("r").alias("s"))
                .collect()[0]["s"]
            ) or 0
            extra = (damping_ppm * d_sum) // scale // n
        ranks = (
            verts.join(inc, "v", "left")
            .select(
                "v",
                (F.lit(base + extra) + F.coalesce(F.col("inc"), F.lit(0)))
                .cast("bigint")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("v").alias("vertex"), F.col("r").alias("rank_ppm"))
