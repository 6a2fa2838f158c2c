"""Triangle counting + degree stats — operators/graphstats.py.

Hand graph: K4 on {a,b,c,d} minus edge (c,d), plus a pendant edge (d,e).
Triangles: {a,b,c} and {a,b,d} → a:2 b:2 c:1 d:1, e none."""

from __future__ import annotations

from graph_stream_zoomer_spark.operators.graphstats import (
    degree_stats,
    triangle_counts,
)


def _edges(spark):
    # direction and duplicates must not matter for triangles
    return spark.createDataFrame(
        [
            ("a", "b"), ("b", "a"),        # duplicate reversed edge
            ("a", "c"), ("b", "c"),
            ("a", "d"), ("d", "b"),
            ("d", "e"), ("a", "a"),        # self-loop dropped
        ],
        "src string, dst string",
    )


def test_triangle_counts_hand_graph(spark):
    got = {r.vertex: r.n_triangles for r in triangle_counts(_edges(spark)).collect()}
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


def test_degree_stats_exact(spark):
    e = _edges(spark).where("src != dst")  # keep the self-loop out of degrees
    got = {r.vertex: (r.out_degree, r.in_degree) for r in degree_stats(e).collect()}
    assert got["a"] == (3, 1) and got["e"] == (0, 1)
    # weighted form sums weights per direction
    ew = _edges(spark).selectExpr("src", "dst", "2 AS w").where("src != dst")
    w = {r.vertex: (r.out_weight, r.in_weight) for r in degree_stats(ew, weight_col="w").collect()}
    assert w["a"] == (6, 2)
