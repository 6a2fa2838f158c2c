"""Distributed spherical k-means trainer (operators/kmeans.py).

The trainer is the coarse-quantizer companion of `ivf_topk` — no reference
counterpart (the reference has no vector indexing at all; SURVEY.md §2.10
beyond-reference family). Pinned here: determinism + totality of the
reported model, the Lloyd monotonicity property (mean assignment
similarity must not decrease across rounds), plan shape of both training
stages (assignment = join-free projection; update = ONE exchange), and the
payoff — trained centroids must beat the sampled ones as the IVF coarse
quantizer on recall@10.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.kmeans import (
    SCALE,
    assign_clusters,
    assign_expr,
    centroids_as_floats,
    kmeans_centroids,
    train_kmeans,
)

SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF001}/embeddings.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def _mean_best_sim(emb, cents) -> float:
    """Mean over the corpus of the (rounded) cosine to the nearest
    centroid — the spherical k-means objective."""
    from graph_stream_zoomer_spark.operators.kmeans import _sim_structs, _with_unit

    best = F.reverse(F.array_sort(_sim_structs(cents)))[0]["sim"]
    return float(
        _with_unit(emb, "embedding").agg(F.avg(best).alias("m")).collect()[0]["m"]
    )


def test_model_shape_total_and_deterministic(emb):
    out1 = {r["cluster_id"]: r for r in kmeans_centroids(emb, 8, 2, reproducible=True).collect()}
    out2 = {r["cluster_id"]: r for r in kmeans_centroids(emb, 8, 2, reproducible=True).collect()}
    assert len(out1) == 8
    assert sum(r["n_members"] for r in out1.values()) == emb.count()  # assignment is total
    for cid, r in out1.items():
        comps = r["centroid"].split(",")
        assert len(comps) == 64
        # quantized unit vector: |v|² ≈ SCALE² within quantization error
        sq = sum(int(c) ** 2 for c in comps)
        assert abs(sq - SCALE * SCALE) < SCALE * 10
        assert out2[cid]["centroid"] == r["centroid"]
        assert out2[cid]["n_members"] == r["n_members"]


def test_lloyd_objective_monotone(emb):
    """Each Lloyd round may only improve the mean nearest-centroid cosine
    (up to the 1e-5 quantization of centroid components)."""
    c0 = train_kmeans(emb, 8, 0, reproducible=True)
    c1 = train_kmeans(emb, 8, 1, reproducible=True)
    c2 = train_kmeans(emb, 8, 2, reproducible=True)
    s0, s1, s2 = (_mean_best_sim(emb, c) for c in (c0, c1, c2))
    assert s1 >= s0 - 1e-4
    assert s2 >= s1 - 1e-4
    assert s2 > s0 + 0.01  # and training must actually move the model


def test_fast_assignment_matches_catalyst_fold(emb):
    """The Arrow matmul path and the reproducible Catalyst fold must agree
    on the assignment for a shared model (same centroids injected into
    both) — the tie-break order is aligned by construction."""
    cents = train_kmeans(emb, 8, 1, reproducible=True)
    a_fast = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, cents, reproducible=False).collect()
    }
    a_repro = {
        r["vec_id"]: r["cluster_id"]
        for r in assign_clusters(emb, cents, reproducible=True).collect()
    }
    diff = sum(1 for k in a_repro if a_fast[k] != a_repro[k])
    # numpy's unrounded argmax may flip only genuine rounding-boundary ties
    assert diff <= len(a_repro) * 0.01, f"{diff} of {len(a_repro)} assignments diverge"


def test_plan_shapes(emb):
    cents = train_kmeans(emb, 4, 0, reproducible=True)
    # assignment: pure projection — no join, no exchange past the scan
    plan = assign_clusters(emb, cents, reproducible=True)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
    # update aggregate: ONE exchange with a map-side partial (two-level agg)
    from graph_stream_zoomer_spark.operators.kmeans import _with_unit

    upd = (
        _with_unit(emb, "embedding")
        .select(assign_expr(cents).alias("cluster_id"), "_u")
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"), *[F.avg(F.col("_u")[i]).alias(f"m{i}") for i in range(64)])
    )
    uplan = upd._jdf.queryExecution().executedPlan().toString()
    assert uplan.count("Exchange") == 1
    assert "partial_avg" in uplan or "partial_" in uplan.lower() or "HashAggregate" in uplan


def test_trained_centroids_beat_sampled_ivf(emb):
    """The point of the trainer: as IVF's coarse quantizer, the trained
    model must beat the deterministic corpus sample on recall@10 at equal
    n_probe. Measured on sf0.01 (near-random vectors, the adversarial
    case): sampled 0.700 → trained 0.850 at k=16/probe=8; floors sit
    ~0.05 under measured so regressions trip without tie-break flakes."""
    from graph_stream_zoomer_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        mean_recall_at_k,
    )

    q = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, q, k=10).cache()
    exact.count()
    cents = train_kmeans(emb, 16, 4, reproducible=False)
    r_trained = mean_recall_at_k(
        ivf_topk(emb, q, k=10, n_probe=8, centroids=centroids_as_floats(cents)), exact, 10
    )
    r_sampled = mean_recall_at_k(
        ivf_topk(emb, q, k=10, n_centroids=16, n_probe=8), exact, 10
    )
    exact.unpersist()
    assert r_trained >= 0.80, f"trained-IVF recall@10 regressed: {r_trained:.3f}"
    assert r_trained >= r_sampled, (r_trained, r_sampled)
