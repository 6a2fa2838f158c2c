"""Streaming first-occurrence dedup (streaming/dedup.py): parity with the
batch twin on in-order chunked input, duplicate suppression across
micro-batches, and state-eviction contract."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.streaming.dedup import dedup_stream, first_occurrence

DOC_DDL = "doc_id bigint, text string, ts timestamp"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, ts) for i, t, ts in rows], "doc_id bigint, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


CHUNK1 = [
    (1, "the quick brown fox", "2024-01-01 10:00:00"),
    (2, "a different document", "2024-01-01 10:00:30"),
    (3, "The  QUICK brown fox!", "2024-01-01 10:01:00"),  # dup of 1 (normalized)
]
CHUNK2 = [
    (4, "the quick brown fox", "2024-01-01 10:02:00"),  # dup of 1, later batch
    (5, "entirely new content", "2024-01-01 10:02:30"),
]


def _run_stream(spark, tmp_path, chunks, watermark="10 minutes"):
    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")
    for i, chunk in enumerate(chunks):
        _docs(spark, chunk).coalesce(1).write.mode("append").parquet(inp)
        if i < len(chunks) - 1:
            time.sleep(1.1)  # distinct mtimes → in-order file triggers
    stream = (
        spark.readStream.schema(DOC_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(inp)
    )
    q = (
        dedup_stream(stream, watermark_delay=watermark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_streaming_matches_batch_first_occurrence(spark, tmp_path):
    got = _run_stream(spark, tmp_path, [CHUNK1, CHUNK2])
    kept = sorted(r["doc_id"] for r in got.collect())
    exp = first_occurrence(_docs(spark, CHUNK1 + CHUNK2))
    assert kept == sorted(r["doc_id"] for r in exp.collect()) == [1, 2, 5]
    # fingerprint column present and distinct
    assert got.select("fingerprint").distinct().count() == 3


def test_emits_immediately_no_window_latency(spark, tmp_path):
    """Append rows are emitted in batch 1 without waiting for watermark
    advancement (dedup is not an aggregation)."""
    got = _run_stream(spark, tmp_path, [CHUNK1])
    assert sorted(r["doc_id"] for r in got.collect()) == [1, 2]


def test_raw_mode_keeps_case_variants(spark, tmp_path):
    inp = str(tmp_path / "raw_in")
    out = str(tmp_path / "raw_out")
    ckpt = str(tmp_path / "raw_ckpt")
    _docs(spark, CHUNK1).coalesce(1).write.parquet(inp)
    stream = spark.readStream.schema(DOC_DDL).parquet(inp)
    q = (
        dedup_stream(stream, normalized=False)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # without normalization doc 3's casing differs → all three kept
    assert spark.read.parquet(out).count() == 3


def test_batch_frame_rejected(spark):
    with pytest.raises(ValueError, match="streaming"):
        dedup_stream(_docs(spark, CHUNK1))


def test_first_occurrence_single_exchange(spark):
    plan = (
        first_occurrence(_docs(spark, CHUNK1))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
