"""Transcript generator + graph binding invariants (BASELINE.json
input_hint: per-turn text equality under stable turn ordering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark import Count, AvgProperty, StreamGraphConfig, WindowConfig
from graph_stream_zoomer_spark.operators.grouping import GroupingBuilder
from graph_stream_zoomer_spark.sources.transcripts import (
    generate_transcripts,
    transcript_graph,
    transcript_triples,
    transcript_vertices,
)


@pytest.fixture(scope="module")
def transcripts(spark):
    return generate_transcripts(spark, 100).cache()


def test_schema_matches_input_hint(transcripts):
    assert [(f.name, f.dataType.simpleString()) for f in transcripts.schema.fields] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]


def test_deterministic_regeneration(spark, transcripts):
    """Same (seed, n) → byte-identical data: any partition can be
    regenerated anywhere (lineage-friendly)."""
    again = generate_transcripts(spark, 100)
    assert transcripts.exceptAll(again).count() == 0
    assert again.exceptAll(transcripts).count() == 0


def test_turn_ordering_and_text_equality(transcripts):
    """Stable turn ordering: ts strictly monotone within a conversation for
    non-late rows; text embeds (conv_id, turn_idx, role) for per-turn text
    equality checks."""
    rows = transcripts.where(F.col("conv_id") == "c00000050").orderBy("turn_idx").collect()
    assert [r["turn_idx"] for r in rows] == list(range(len(rows)))
    assert rows[0]["role"] == "user"
    for r in rows:
        assert r["text"].startswith(f"{r['conv_id']}:{r['turn_idx']}:{r['role']}:")


def test_roles_and_tools(transcripts):
    roles = {r["role"] for r in transcripts.select("role").distinct().collect()}
    assert roles <= {"user", "assistant", "tool"}
    tools = {
        r["tool"]
        for r in transcripts.where("role = 'tool'").select("tool").distinct().collect()
    }
    assert tools <= {"search", "python", "browser"}
    assert (
        transcripts.where("role <> 'tool' and tool <> ''").count() == 0
    )


def test_skew_knob(transcripts):
    counts = (
        transcripts.groupBy("conv_id").count().orderBy(F.desc("count")).limit(1).collect()
    )
    # first conv is skewed: 10× base turns
    assert counts[0]["conv_id"] == "c00000000"
    assert counts[0]["count"] >= 20


def test_triples_binding(transcripts):
    triples = transcript_triples(transcripts)
    n_turns = transcripts.count()
    n_convs = transcripts.select("conv_id").distinct().count()
    assert triples.count() == n_turns - n_convs  # one edge per consecutive pair
    r = triples.where(F.col("source.vertex_id") == "c00000050:0").collect()[0]
    assert r["target"]["vertex_id"] == "c00000050:1"
    assert r["edge_label"].startswith("user->")
    assert r["edge_properties"]["text_len"] is not None
    assert r["source"]["vertex_properties"]["hour_bucket"] is not None


def test_group_by_role_count(transcripts):
    """Flagship semantics: group turns by role over 1-minute tumbling
    windows, count + avg text_len; compare against a plain SQL oracle."""
    cfg = StreamGraphConfig(window=WindowConfig.tumbling(60, "SECONDS"))
    graph = transcript_graph(transcripts, cfg)
    op = (
        GroupingBuilder()
        .add_vertex_grouping_key(":label")
        .add_vertex_aggregate_function(Count())
        .add_vertex_aggregate_function(AvgProperty("text_len"))
        .add_edge_grouping_key(":label")
        .add_edge_aggregate_function(Count())
        .set_window_config(cfg.window)
        .set_config(cfg)
        .build()
    )
    result = graph.apply(op)
    got = {
        (r["vertex_label"], r["event_time"]): int(r["vertex_properties"]["count"])
        for r in result.vertices.collect()
    }
    # oracle: dedup (vertex observed once per incident edge) then count per
    # (role, window). A turn is an endpoint of ≤2 edges; unique turns that
    # appear in any triple = all turns of convs with ≥2 turns.
    t = transcripts
    deduped = (
        transcript_vertices(t)
        .join(
            t.groupBy("conv_id").count().where("count >= 2").select("conv_id"),
            F.split(F.col("vertex_id"), ":")[0] == F.col("conv_id"),
            "inner",
        )
        .select(
            "vertex_label",
            F.window("event_time", "60 seconds").alias("w"),
            "vertex_id",
        )
        .distinct()
    )
    expected = {
        (r["vertex_label"], r["rowtime"]): r["cnt"]
        for r in deduped.groupBy("vertex_label", "w")
        .agg(F.count("*").alias("cnt"))
        .select(
            "vertex_label",
            F.expr("w.end - interval 1 millisecond").alias("rowtime"),
            "cnt",
        )
        .collect()
    }
    assert got == expected
    for r in result.vertices.collect():
        assert float(r["vertex_properties"]["avg_text_len"]) > 0
