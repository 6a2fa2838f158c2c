"""Streaming as-of join (operators/asof.py streaming_asof_join): parity
with the batch operator under availableNow drain, exactly-once across
checkpointed micro-batches, and tolerance semantics."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.asof import asof_join, streaming_asof_join

TRADE_DDL = "k string, ts timestamp, qty int"
QUOTE_DDL = "k string, ts timestamp, px int"

TRADES = [
    ("a", "2024-01-01 10:03:00", 1),
    ("a", "2024-01-01 10:05:00", 2),
    ("a", "2024-01-01 10:59:00", 3),
    ("b", "2024-01-01 10:00:00", 4),
    ("c", "2024-01-01 10:00:00", 5),
]
QUOTES = [
    ("a", "2024-01-01 10:00:00", 100),
    ("a", "2024-01-01 10:05:00", 105),
    ("a", "2024-01-01 10:10:00", 110),
    ("b", "2024-01-01 10:07:00", 207),
]
# far-future rows on BOTH streams so the availableNow drain's final
# watermark passes every real left row
SENTINEL_T = [("zz", "2030-01-01 00:00:00", 999)]
SENTINEL_Q = [("zz", "2030-01-01 00:00:00", 999)]


def _frame(spark, rows, ddl):
    cols = ddl.replace(" timestamp", " string").replace(" int", " int")
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _write_chunks(spark, path, chunks, ddl, last_sleep=True):
    for i, chunk in enumerate(chunks):
        _frame(spark, chunk, ddl).coalesce(1).write.mode("append").parquet(path)
        if i < len(chunks) - 1 and last_sleep:
            time.sleep(1.1)


def _run(spark, tmp_path, trade_chunks, quote_chunks, **kw):
    tdir, qdir = str(tmp_path / "trades"), str(tmp_path / "quotes")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_chunks(spark, tdir, trade_chunks, TRADE_DDL)
    _write_chunks(spark, qdir, quote_chunks, QUOTE_DDL)
    lt = spark.readStream.schema(TRADE_DDL).parquet(tdir)
    rt = spark.readStream.schema(QUOTE_DDL).parquet(qdir)
    q = (
        streaming_asof_join(lt, rt, on="k", watermark_delay="1 minute", **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out).where(F.col("k") != "zz")


def _as_map(df):
    return {r["qty"]: (r["asof_px"], r["asof_ts"]) for r in df.collect()}


def test_streaming_matches_batch(spark, tmp_path):
    got = _run(
        spark,
        tmp_path,
        [TRADES + SENTINEL_T],
        [QUOTES + SENTINEL_Q],
    )
    batch = asof_join(
        _frame(spark, TRADES, TRADE_DDL), _frame(spark, QUOTES, QUOTE_DDL), on="k"
    )
    assert _as_map(got) == _as_map(batch)
    # every left row decided exactly once
    assert got.count() == len(TRADES)


def test_streaming_tolerance(spark, tmp_path):
    got = _as_map(
        _run(
            spark,
            tmp_path,
            [TRADES + SENTINEL_T],
            [QUOTES + SENTINEL_Q],
            tolerance="10 minutes",
        )
    )
    assert got[1][0] == 100
    assert got[3] == (None, None)  # 49 min gap nulled


def test_chunked_late_quote_still_matches(spark, tmp_path):
    """The quote arrives in a LATER micro-batch than the trade it should
    enrich; the trade must stay undecided (its ts is above the watermark
    of batch 1) and pick the quote up when it lands."""
    got = _as_map(
        _run(
            spark,
            tmp_path,
            [[("a", "2024-01-01 10:03:00", 1)], SENTINEL_T],
            [[("a", "2024-01-01 10:00:00", 100)],
             [("a", "2024-01-01 10:02:00", 102)] + SENTINEL_Q],
        )
    )
    assert got[1][0] == 102


def test_batch_inputs_rejected(spark):
    with pytest.raises(ValueError, match="streaming"):
        streaming_asof_join(
            _frame(spark, TRADES, TRADE_DDL),
            _frame(spark, QUOTES, QUOTE_DDL),
            on="k",
        )
