"""Integer-exact PageRank — operators/pagerank.py.

One round on A→B, B→A, A→C hand-computes to exact integers:
r0 = 333333 each; base = 150000//3 = 50000; outw A=2, B=1.
A's per-edge contribution: (333333·1)//2 = 166666 → damped
(850000·166666)//10^6 = 141666. B→A: 333333 → 283333.
r1: A = 50000+283333 = 333333; B = C = 50000+141666 = 191666.
C is dangling, so total mass shrinks (documented semantics)."""

from __future__ import annotations

import pytest

from graph_stream_zoomer_spark.operators.pagerank import pagerank_exact


def _edges(spark):
    return spark.createDataFrame(
        [("A", "B"), ("B", "A"), ("A", "C")], "src string, dst string"
    )


def test_one_round_hand_computed(spark):
    got = {
        r.vertex: r.rank_ppm
        for r in pagerank_exact(_edges(spark), iters=1).collect()
    }
    assert got == {"A": 333333, "B": 191666, "C": 191666}


def test_multi_round_deterministic_and_weighted(spark):
    e = _edges(spark)
    a = sorted(map(tuple, pagerank_exact(e, iters=8).collect()))
    b = sorted(map(tuple, pagerank_exact(e, iters=8).collect()))
    assert a == b  # bit-identical across runs (integer arithmetic)
    # weights steer the split: A sends 3/4 of its mass to B
    ew = spark.createDataFrame(
        [("A", "B", 3), ("A", "C", 1), ("B", "A", 1)],
        "src string, dst string, w long",
    )
    got = {
        r.vertex: r.rank_ppm
        for r in pagerank_exact(ew, weight_col="w", iters=1).collect()
    }
    # A→B: (333333*3)//4 = 249999 → damped 212499; A→C: 83333 → 70833
    assert got["B"] == 50000 + 212499 and got["C"] == 50000 + 70833
    with pytest.raises(ValueError):
        pagerank_exact(e, iters=0)


def test_dangling_redistribute_conserves_total_rank(spark):
    """dangling='redistribute': total rank stays at `scale` to within
    integer truncation (loss < 2n ppm per round from the two integer
    divisions), while the default 'drop' leaks the dangling mass; results
    remain bit-identical across runs and the existing drop semantics are
    untouched."""
    # C is dangling (no out-edges)
    e = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("A", "C")], "src string, dst string"
    )
    iters, scale, n = 6, 1_000_000, 3
    red = {
        r.vertex: r.rank_ppm
        for r in pagerank_exact(e, iters=iters, dangling="redistribute").collect()
    }
    drop = {
        r.vertex: r.rank_ppm
        for r in pagerank_exact(e, iters=iters).collect()
    }
    total_red = sum(red.values())
    total_drop = sum(drop.values())
    # conservation: lose at most ~2n ppm truncation per round
    assert scale - total_red <= 2 * n * iters, (total_red, scale)
    # the drop default really leaks (C holds ~36% of the mass here)
    assert total_drop < total_red - 100_000
    # deterministic across runs
    again = {
        r.vertex: r.rank_ppm
        for r in pagerank_exact(e, iters=iters, dangling="redistribute").collect()
    }
    assert red == again
    with pytest.raises(ValueError, match="dangling"):
        pagerank_exact(e, dangling="bogus")
