"""Connected components over duplicate-pair edges → duplicate clusters.

The missing last step of a dedup pipeline: pair emitters (exact /
fingerprint / jaccard / minhash / simhash / embedding — operators/dedup.py)
produce edges; keeping one document per *cluster* requires the transitive
closure of those edges (a~b, b~c ⇒ {a,b,c} drop to one keeper).

Algorithm: iterative min-label propagation (the standard Spark pattern —
each node's label becomes the min of its own and its neighbors' labels;
converges in O(diameter) rounds, and dup clusters are near-cliques so the
diameter is tiny). Each round is one shuffle (groupBy node); lineage is
truncated with localCheckpoint so 20 rounds don't build a 20-deep plan.
At 100 TB scale: the edge set (dup pairs) is orders of magnitude smaller
than the corpus, rounds are O(log n) worst-case, and the final membership
join is a broadcast when the dup set is small relative to the corpus.

No reference equivalent (the reference groups streams, it has no iterative
graph algorithm); this is a training-data-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    min node id of its connected component (deterministic, SQL-checkable).

    Pure DataFrame min-label propagation: per round, every node pulls the
    min label over {itself} ∪ neighbors. Converged when no label changed
    (cheap count on the changed set — runs on the already-checkpointed
    round result, not a recomputation).
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # undirected: both directions, so one groupBy(node) sees all neighbors
    sym = edges.unionByName(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels


def duplicate_clusters(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Duplicate clusters from pair edges: one row per component with the
    canonical keeper (min id), member count, and the sorted member list
    (deterministic output — hash-comparable against a recursive-SQL
    oracle)."""
    cc = connected_components(pairs, src, dst)
    return (
        cc.groupBy("component")
        .agg(
            F.min("node").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("node")).alias("members"),
        )
        .select("keeper_id", "n_members", "members")
    )
