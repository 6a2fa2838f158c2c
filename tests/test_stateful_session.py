"""Keyed-state session merge (applyInPandasWithState) vs the batch engine.

The stateful path must reproduce the batch session-window grouping exactly:
same (label, rowtime) keys, same count/avg/min aggregates — across multiple
micro-batches (maxFilesPerTrigger=1 forces cross-batch open-session state
and watermark-timeout flushes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark import (
    AvgProperty,
    Count,
    MinProperty,
    StreamGraphConfig,
    WindowConfig,
)
from graph_stream_zoomer_spark.operators.grouping import GroupingBuilder
from graph_stream_zoomer_spark.sources.transcripts import generate_transcripts, transcript_graph
from graph_stream_zoomer_spark.streaming.binding import streaming_vertex_observations
from graph_stream_zoomer_spark.streaming.job import read_transcript_stream
from graph_stream_zoomer_spark.streaming.sink import IdempotentParquetSink
from graph_stream_zoomer_spark.streaming.stateful import stateful_session_summaries

WINDOW = WindowConfig.session(60, "SECONDS")


def _op():
    cfg = StreamGraphConfig(window=WINDOW, watermark_delay="10 seconds")
    return (
        GroupingBuilder()
        .add_vertex_grouping_key(":label")
        .add_vertex_aggregate_function(Count())
        .add_vertex_aggregate_function(AvgProperty("text_len"))
        .add_vertex_aggregate_function(MinProperty("text_len"))
        .set_window_config(WINDOW)
        .set_config(cfg)
        .build()
    )


def _sentinel(spark):
    return spark.createDataFrame(
        [("zz_flush", 0, "user", "flush", "", "2030-01-01 00:00:00"),
         ("zz_flush", 1, "assistant", "flush", "", "2030-01-01 00:00:05")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_stateful_session_matches_batch(spark, tmp_path):
    turns = generate_transcripts(spark, 40, late_fraction_pct=0, skew=False)
    d = str(tmp_path / "turns")
    # time-ordered file chunks with increasing mtimes: the file source feeds
    # them oldest-first, so with maxFilesPerTrigger=1 the watermark advances
    # monotonically and no event is dropped as late (matching an in-order
    # production stream); the sentinel chunk lands last and flushes state.
    import time

    allturns = turns.unionByName(_sentinel(spark)).orderBy("ts").collect()
    chunk = (len(allturns) + 3) // 4
    for i in range(4):
        part = allturns[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, turns.schema).coalesce(1).write.mode(
                "append"
            ).parquet(d)
            time.sleep(1.1)

    stream = read_transcript_stream(spark, d, max_files_per_trigger=1)
    vertices = streaming_vertex_observations(stream, watermark="10 seconds")
    sv = stateful_session_summaries(_op(), vertices)
    sink = IdempotentParquetSink(str(tmp_path / "out"))
    q = (
        sv.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        (r["vertex_label"], r["event_time"]): (
            int(r["count"]),
            float(r["avg_text_len"]),
            float(r["min_text_len"]),
        )
        for r in sink.read(spark).where(F.col("window_start") < "2029-01-01").collect()
    }

    graph = transcript_graph(turns, StreamGraphConfig(window=WINDOW), use_arrow=False)
    batch = graph.apply(_op())
    exp = {
        (r["vertex_label"], r["event_time"]): (
            int(r["vertex_properties"]["count"]),
            float(r["vertex_properties"]["avg_text_len"]),
            float(r["vertex_properties"]["min_text_len"]),
        )
        for r in batch.vertices.collect()
    }

    assert set(got) == set(exp)
    for k, (cnt, avg, mn) in exp.items():
        g = got[k]
        assert g[0] == cnt, k
        assert g[1] == pytest.approx(avg, rel=1e-9), k
        assert g[2] == pytest.approx(mn, rel=1e-9), k
    # multiple micro-batches actually ran (cross-batch state exercised)
    assert len(sink.metrics.batches) >= 2
