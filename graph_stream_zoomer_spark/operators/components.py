"""Connected components over duplicate-pair edges → duplicate clusters.

The missing last step of a dedup pipeline: pair emitters (exact /
fingerprint / jaccard / minhash / simhash / embedding — operators/dedup.py)
produce edges; keeping one document per *cluster* requires the transitive
closure of those edges (a~b, b~c ⇒ {a,b,c} drop to one keeper).

Algorithm: iterative min-label propagation (the standard Spark pattern —
each node's label becomes the min of its own and its neighbors' labels).
Plain neighbor-min propagation needs O(diameter) rounds — NOT O(log n);
dup clusters are near-cliques so the diameter (and hence round count) is
tiny in practice, but chainy pair sets (a~b, b~c, ...) can exceed any
fixed ``max_iter``, so non-convergence is detected and raised rather than
silently emitting split components. Each round is one shuffle (groupBy
node); lineage is truncated per round so 20 rounds don't build a 20-deep
plan.

Checkpointing at scale: ``localCheckpoint`` stores blocks NON-replicated
on executors — on a real cluster, losing one executor mid-iteration kills
the job unrecoverably (the lineage needed to recompute the blocks has been
discarded). For cluster runs pass ``checkpoint_dir`` (or pre-set one via
``spark.sparkContext.setCheckpointDir``) to get reliable
``df.checkpoint()`` to fault-tolerant storage; ``localCheckpoint`` remains
the zero-config local-mode default.

No reference equivalent (the reference groups streams, it has no iterative
graph algorithm); this is a training-data-pipeline addition.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """min-label propagation exhausted max_iter without converging —
    returned components would be WRONG (split), so we refuse."""


def _truncate(df: DataFrame, reliable: bool, eager: bool = True) -> DataFrame:
    """Cut lineage: reliable ``checkpoint`` (HDFS/S3-backed, survives
    executor loss) when a checkpoint dir is configured, else
    ``localCheckpoint`` (fast, executor-local, local-mode only).

    ``eager=False`` defers materialization to the caller's next
    full-partition action — the loop uses this to fold the checkpoint job
    and the convergence-count job into ONE job per round (the count scans
    every partition, so the checkpoint is fully materialized by it)."""
    if reliable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    on_nonconverged: str = "raise",
    path_halving: bool = True,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id of its connected component (deterministic, SQL-checkable).

    Pure DataFrame min-label propagation: per round, every node pulls the
    min label over {itself} ∪ neighbors; with ``path_halving`` (default)
    each round then also follows its own label one hop (L(u) ← L(L(u)),
    monotone since L(v) ≤ v), so label distance roughly doubles per round —
    O(log diameter) rounds instead of the O(diameter) of plain
    propagation, at the price of one extra (labels ⋈ labels) shuffle per
    round. ``path_halving=False`` keeps the single-shuffle round for
    near-clique inputs (dup clusters) where diameter ≈ 2 anyway.
    Converged when no label changed (cheap count on the changed set —
    runs on the already-checkpointed round result, not a recomputation).

    ``checkpoint_dir``: set to a fault-tolerant path (HDFS/S3) on real
    clusters — enables reliable ``df.checkpoint()``; without it (and
    without a pre-set ``sc.setCheckpointDir``) falls back to
    ``localCheckpoint``, which does not survive executor loss.

    ``on_nonconverged``: "raise" (default — split components are wrong
    answers, not degraded ones) or "warn".
    """
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError("on_nonconverged must be 'raise' or 'warn'")
    sc = pairs.sparkSession.sparkContext
    if checkpoint_dir is not None:
        sc.setCheckpointDir(checkpoint_dir)
    reliable = sc.getCheckpointDir() is not None

    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # undirected: both directions, so one groupBy(node) sees all neighbors.
    # Pre-hash-partition on the per-round join key: localCheckpoint/
    # checkpoint preserve the child's HashPartitioning, so the static edge
    # side is exchanged ONCE here and never again inside the loop (only the
    # labels side, which changes every round, reshuffles).
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = _truncate(sym.repartition(F.col("b")), reliable)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    labels = _truncate(labels, reliable)
    converged = False
    for _ in range(max_iter):
        # one join + one groupBy per round: new(u) = min(old(u), min over
        # neighbors v of old(v)). The "keep own label" path rides the same
        # aggregation as a self-contribution row (flagged so the pre-update
        # label comes back out as _prev for convergence detection) instead
        # of a second labels-join.
        contrib_nbr = sym.join(
            labels.select(F.col("node").alias("b"), "component"), "b"
        ).select(F.col("a").alias("node"), "component", F.lit(False).alias("_self"))
        new_labels = (
            labels.select("node", "component", F.lit(True).alias("_self"))
            .unionByName(contrib_nbr)
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("_self"), F.col("component"))).alias("_prev"),
            )
        )
        if path_halving:
            # L(u) ← L(L(u)): component ids are node ids and every node is
            # in `labels`, so an inner self-join resolves one hop
            hop = new_labels.select(
                F.col("node").alias("component"), F.col("component").alias("_cc")
            )
            new_labels = new_labels.join(hop, "component", "left").select(
                "node",
                F.coalesce(F.col("_cc"), F.col("component")).alias("component"),
                "_prev",
            )
        new_labels = _truncate(
            new_labels.withColumn(
                "_changed", F.col("component") < F.col("_prev")
            ).drop("_prev"),
            reliable,
            eager=False,
        )
        # one job per round: this count scans every partition, which both
        # materializes the lazy checkpoint above and decides convergence
        # (previously: an eager-checkpoint job PLUS a limit(1) count job)
        changed = new_labels.where(F.col("_changed")).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (propagation needs O(diameter) rounds; the pair graph has "
            "a longer path) — results would contain SPLIT components. "
            "Raise max_iter."
        )
        if on_nonconverged == "raise":
            raise ConvergenceError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def duplicate_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    path_halving: bool = False,
) -> DataFrame:
    """Duplicate clusters from pair edges: one row per component with the
    canonical keeper (min id), member count, and the sorted member list
    (deterministic output — hash-comparable against a recursive-SQL
    oracle). Dup clusters are near-cliques (diameter ≈ 2), so the default
    skips path halving's extra per-round join; flip it on for chainy pair
    sets (see connected_components)."""
    cc = connected_components(
        pairs,
        src,
        dst,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        path_halving=path_halving,
    )
    return (
        cc.groupBy("component")
        .agg(
            F.min("node").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("node")).alias("members"),
        )
        .select("keeper_id", "n_members", "members")
    )


def keep_best_per_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    score,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Quality-priority dedup survivors: every doc outside any duplicate
    cluster, plus the highest-``score`` member of each cluster (tie →
    smallest id). The standard last step of a training-data dedup pipeline
    when "keep one copy" should keep the best copy, not the min-id one.

    ``score`` is a Column over ``docs`` (e.g. ``expr_quality_score("text")``
    — already rounded, so cross-engine rank ties resolve identically by the
    id tie-break).

    Plan shape: components over the pair edges (see connected_components),
    one broadcast-able join of the (tiny) member set against the scored
    docs, one rank window partitioned BY COMPONENT (never a global sort),
    and an anti-join for the untouched docs. The member set is a vanishing
    fraction of the corpus at any real dup rate, so everything after the
    pair emitter is cheap at 100 TB.
    """
    cc = connected_components(
        pairs, src, dst, max_iter=max_iter, checkpoint_dir=checkpoint_dir
    )
    # Join on the RAW id type: pairs and docs share the id domain, and
    # connected_components is id-type-agnostic (min-label works for any
    # ordered type). A forced cast("long") would NULL out non-numeric doc
    # ids, silently failing the member join and mis-emitting every doc as
    # a singleton "unique" with a NULL id.
    scored = docs.select(F.col(id_col).alias("doc"), score.alias("score"))
    members = cc.join(scored, cc["node"] == F.col("doc"), "inner")
    from pyspark.sql import Window

    w = Window.partitionBy("component").orderBy(
        F.col("score").desc(), F.col("node").asc()
    )
    sized = members.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_members", F.count(F.lit(1)).over(Window.partitionBy("component"))
    )
    keepers = sized.where(F.col("rn") == 1).select(
        F.col("node").alias(id_col), "score", "n_members"
    )
    uniques = (
        scored.join(cc, scored["doc"] == cc["node"], "left_anti")
        .select(F.col("doc").alias(id_col), "score")
        .withColumn("n_members", F.lit(1).cast("long"))
    )
    return uniques.unionByName(keepers)
