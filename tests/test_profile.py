"""Tests for operators/profile.py: single-pass per-column profiling."""

from __future__ import annotations

import pytest

from graph_stream_zoomer_spark.operators.profile import profile


@pytest.fixture()
def table(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", 2.5),
            (2, "beta", None),
            (3, "alpha", 0.5),
            (4, None, -1.0),
        ],
        "id bigint, name string, score double",
    )


def test_exact_profile(table):
    got = {r["col_name"]: r for r in profile(table, exact_distinct=True).collect()}
    assert set(got) == {"id", "name", "score"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["id"]["n_nulls"], got["id"]["n_distinct"]) == (0, 4)
    assert (got["name"]["n_nulls"], got["name"]["n_distinct"]) == (1, 2)
    assert (got["score"]["n_nulls"], got["score"]["n_distinct"]) == (1, 3)
    assert (got["id"]["min_str"], got["id"]["max_str"]) == ("1", "4")
    assert (got["name"]["min_str"], got["name"]["max_str"]) == ("alpha", "beta")
    assert (got["score"]["min_str"], got["score"]["max_str"]) == ("-1.0", "2.5")


def test_column_subset_and_validation(table):
    assert profile(table, columns=["id"]).count() == 1
    with pytest.raises(ValueError, match="unknown"):
        profile(table, columns=["nope"])


def test_approx_close_to_exact(table):
    exact = {r["col_name"]: r["n_distinct"] for r in profile(table, exact_distinct=True).collect()}
    approx = {r["col_name"]: r["n_distinct"] for r in profile(table).collect()}
    for c in exact:
        assert abs(approx[c] - exact[c]) <= max(1, 0.05 * exact[c])


def test_default_plan_is_expand_free_single_aggregate(table):
    """The scale contract: the HLL default profiles every column in one
    two-level aggregate with NO Expand (exact COUNT DISTINCT would
    multiply scan rows once per distinct column)."""
    plan = profile(table)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan
    exact_plan = profile(table, exact_distinct=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan  # documents why exact is the oracle-only mode
