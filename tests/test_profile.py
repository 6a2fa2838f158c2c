"""Tests for operators/profile.py: single-pass per-column profiling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


def test_profile_sketch_merge_equals_single_pass(spark, table):
    """Incremental profiling: per-chunk profile_sketch rows merged with
    merge_profile_sketches + finalize_profile must equal the single-pass
    sketch profile — counts and min/max exactly (algebraic), n_distinct
    exactly too at this cardinality (HLL sparse mode is exact until
    promotion). Also pins that min/max merge in NATIVE types: the numeric
    column's min is -1.0, which a string-ordered merge would get wrong."""
    from graph_stream_zoomer_spark.operators.profile import (
        finalize_profile,
        merge_profile_sketches,
        profile_sketch,
    )

    chunks = [
        table.where("id <= 2"),
        table.where("id = 3"),
        table.where("id >= 4"),
    ]
    parts = chunks[0].sparkSession.createDataFrame(
        [], profile_sketch(chunks[0]).schema
    )
    for ch in chunks:
        parts = parts.unionByName(profile_sketch(ch))
    merged = {
        r["col_name"]: tuple(r)
        for r in finalize_profile(merge_profile_sketches(parts)).collect()
    }
    single = {
        r["col_name"]: tuple(r)
        for r in finalize_profile(profile_sketch(table)).collect()
    }
    assert merged == single
    by = {r[0]: r for r in merged.values()}
    assert by["score"] == ("score", 4, 1, 3, "-1.0", "2.5")  # native min, not "0.5"
    assert by["name"] == ("name", 4, 1, 2, "alpha", "beta")
    assert by["id"][1:4] == (4, 0, 4)


def test_profile_sketch_streaming_log(spark, table, tmp_path):
    """The executable streaming form of table_profile (SURVEY §2.10
    stance): foreachBatch appends one profile_sketch row per micro-batch
    to a parquet log; the running profile = finalize(merge(log)) at read
    time and equals the batch profile of all input seen."""
    src, log = str(tmp_path / "src"), str(tmp_path / "log")
    table.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(table.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    from graph_stream_zoomer_spark.operators.profile import (
        finalize_profile,
        merge_profile_sketches,
        profile_sketch,
    )

    def append_sketch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        profile_sketch(batch_df).withColumn(
            "__batch_id", F.lit(batch_id)
        ).write.mode("append").parquet(log)

    q = (
        stream.writeStream.foreachBatch(append_sketch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    parts = spark.read.parquet(log).drop("__batch_id")
    assert parts.count() >= 2  # really incremental (several micro-batches)
    got = {
        r["col_name"]: tuple(r)
        for r in finalize_profile(merge_profile_sketches(parts)).collect()
    }
    want = {
        r["col_name"]: tuple(r)
        for r in finalize_profile(profile_sketch(table)).collect()
    }
    assert got == want
