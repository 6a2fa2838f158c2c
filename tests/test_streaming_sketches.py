"""Streaming sketch twins (streaming/sketches.py): per-window parity with
the batch operators across micro-batch boundaries."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.sketches import (
    bloom_bits,
    cms_sketch,
    hll_registers,
    kmv_distinct,
    log_histogram,
)
from graph_stream_zoomer_spark.streaming.sketches import (
    windowed_bloom,
    windowed_cms,
    windowed_hll,
    windowed_kmv,
    windowed_log_histogram,
)

EV_DDL = "user_id bigint, ts timestamp"

# two 10-minute windows, rows split across micro-batches MID-window so the
# state store must merge partial sketches across batches. NULL values ride
# along in both chunks: the streaming twins must skip them exactly like the
# batch operators (a NULL would otherwise hash to a phantom bucket in
# xxhash64 mode or emit NULL-key rows in md5 mode).
CHUNK1 = [
    (1, "2024-01-01 10:00:00"),
    (2, "2024-01-01 10:01:00"),
    (None, "2024-01-01 10:01:30"),
    (1, "2024-01-01 10:02:00"),
    (3, "2024-01-01 10:11:00"),
]
CHUNK2 = [
    (1, "2024-01-01 10:03:00"),  # same window as chunk1's first rows
    (4, "2024-01-01 10:12:00"),
    (None, "2024-01-01 10:12:30"),
    (3, "2024-01-01 10:13:00"),
]
SENTINEL = [(99, "2030-01-01 00:00:00")]  # advances the watermark → closes windows


def _df(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def _run(spark, tmp_path, twin):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    for i, chunk in enumerate([CHUNK1, CHUNK2, SENTINEL]):
        _df(spark, chunk).coalesce(1).write.mode("append").parquet(inp)
        if i < 2:
            time.sleep(1.1)
    stream = spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(inp)
    q = (
        twin(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return (
        spark.read.parquet(out)
        .where(F.col("window.start") < "2029-01-01")
        .withColumn("window_start", F.col("window.start"))
        .drop("window")
    )


def _batch_per_window(spark, op, **kw):
    """Batch twin applied window-by-window over the union of real chunks."""
    df = _df(spark, CHUNK1 + CHUNK2).withColumn(
        "window_start", F.window("ts", "10 minutes").start
    )
    outs = []
    for (ws,) in df.select("window_start").distinct().collect():
        part = df.where(F.col("window_start") == ws)
        outs.append(op(part, "user_id", **kw).withColumn("window_start", F.lit(ws)))
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return u


def test_windowed_cms_matches_batch_per_window(spark, tmp_path):
    got = _run(
        spark,
        tmp_path,
        lambda s: windowed_cms(s, "ts", "user_id", width=64, depth=4),
    )
    exp = _batch_per_window(spark, cms_sketch, width=64, depth=4)
    key = lambda r: (str(r["window_start"]), r["row_idx"], r["bucket"], r["cnt"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))
    # cross-batch merge actually happened: user 1 appears 3x in window 1
    # (2 rows in chunk1 + 1 in chunk2) — some counter must be ≥ 3
    assert got.agg(F.max("cnt")).first()[0] >= 3


def test_windowed_hll_matches_batch_per_window(spark, tmp_path):
    got = _run(
        spark,
        tmp_path,
        lambda s: windowed_hll(s, "ts", "user_id", b=8),
    )
    exp = _batch_per_window(spark, hll_registers, b=8)
    key = lambda r: (str(r["window_start"]), r["bucket"], r["max_rho"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))


def test_windowed_log_histogram_matches_batch_per_window(spark, tmp_path):
    got = _run(
        spark, tmp_path, lambda s: windowed_log_histogram(s, "ts", "user_id", r=5)
    )
    exp = _batch_per_window(spark, log_histogram, r=5)
    key = lambda r: (str(r["window_start"]), r["bin"], r["cnt"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))


def test_window_quantiles_over_closed_histogram_stream(spark, tmp_path):
    """windowed_log_histogram sink → window_quantiles == batch
    quantile_sketch applied window-by-window (the foreachBatch /
    sink-table reading pattern the docstring prescribes)."""
    from graph_stream_zoomer_spark.operators.sketches import quantile_sketch
    from graph_stream_zoomer_spark.streaming.sketches import window_quantiles

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    for i, chunk in enumerate([CHUNK1, CHUNK2, SENTINEL]):
        _df(spark, chunk).coalesce(1).write.mode("append").parquet(inp)
        if i < 2:
            time.sleep(1.1)
    stream = spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(inp)
    q = (
        windowed_log_histogram(stream, "ts", "user_id", r=5)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    hist = spark.read.parquet(out).where(F.col("window.start") < "2029-01-01")
    got = {
        (str(r["window"]["start"]), r["q_ppm"]): r["value"]
        for r in window_quantiles(hist, [500_000, 990_000], r=5).collect()
    }
    exp = {}
    df = _df(spark, CHUNK1 + CHUNK2).withColumn(
        "window_start", F.window("ts", "10 minutes").start
    )
    for (ws,) in df.select("window_start").distinct().collect():
        part = df.where(F.col("window_start") == ws)
        for r in quantile_sketch(part, "user_id", [500_000, 990_000], r=5).collect():
            exp[(str(ws), r["q_ppm"])] = r["value"]
    assert got == exp


def test_windowed_embedding_pool_matches_batch_per_window(spark, tmp_path):
    """windowed_embedding_sums sink → pooled_from_sums == batch
    pool_embeddings window-by-window (vectors split across micro-batches
    mid-window, so the state store must merge partial sums)."""
    from graph_stream_zoomer_spark.operators.similarity import pool_embeddings
    from graph_stream_zoomer_spark.streaming.sketches import (
        pooled_from_sums,
        windowed_embedding_sums,
    )

    ddl = "vec array<double>, ts timestamp"
    c1 = [
        ([1.25, -2.5], "2024-01-01 10:00:00"),
        ([0.75, 0.5], "2024-01-01 10:01:00"),
        (None, "2024-01-01 10:01:30"),
        ([10.0, 20.0], "2024-01-01 10:11:00"),
    ]
    c2 = [
        ([2.0, 4.0], "2024-01-01 10:03:00"),  # same window as c1's head
        ([30.0, 40.0], "2024-01-01 10:12:00"),
    ]
    sent = [([0.0, 0.0], "2030-01-01 00:00:00")]

    def mk(rows):
        return spark.createDataFrame(
            rows, "vec array<double>, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))

    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    for i, chunk in enumerate([c1, c2, sent]):
        mk(chunk).coalesce(1).write.mode("append").parquet(inp)
        if i < 2:
            time.sleep(1.1)
    stream = spark.readStream.schema(ddl).option("maxFilesPerTrigger", 1).parquet(inp)
    q = (
        windowed_embedding_sums(stream, "ts", "vec")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sums = spark.read.parquet(out).where(F.col("window.start") < "2029-01-01")
    got = {
        str(r["window"]["start"]): r["vec"] for r in pooled_from_sums(sums).collect()
    }
    df = mk(c1 + c2).withColumn("window_start", F.window("ts", "10 minutes").start)
    exp = {}
    for (ws,) in df.select("window_start").distinct().collect():
        part = df.where(F.col("window_start") == ws)
        (row,) = pool_embeddings(part, vec_col="vec").collect()
        exp[str(ws)] = row["vec"]
    assert got == exp


def test_windowed_kmv_matches_batch_per_window(spark, tmp_path):
    # k=2 < per-window distinct count, so the (k-1)*2^32 div kth branch of
    # the estimator runs — parity with batch must be bit-for-bit, not just
    # "both exact"
    got = _run(spark, tmp_path, lambda s: windowed_kmv(s, "ts", "user_id", k=2))
    exp = _batch_per_window(spark, kmv_distinct, k=2)
    key = lambda r: (str(r["window_start"]), r["est_distinct"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))
    # exactly one emission per closed window (append semantics)
    assert got.count() == 2


def test_windowed_kmv_exact_below_k(spark, tmp_path):
    # k above each window's distinct count → the streaming estimate is the
    # EXACT per-window COUNT(DISTINCT): {1,2} and {3,4}
    got = _run(spark, tmp_path, lambda s: windowed_kmv(s, "ts", "user_id", k=64))
    vals = sorted(r["est_distinct"] for r in got.collect())
    assert vals == [2, 2]


def test_windowed_kmv_checkpoint_resume(spark, tmp_path):
    """State (the ≤k kept hashes) survives a stop/restart through the
    checkpoint: chunk1 runs in query #1 (no window closes — watermark too
    young), chunk2+sentinel arrive after a restart, and the final
    per-window estimates still match the batch twin."""
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    def start():
        stream = (
            spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(inp)
        )
        return (
            windowed_kmv(stream, "ts", "user_id", k=2)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    _df(spark, CHUNK1).coalesce(1).write.mode("append").parquet(inp)
    q = start()
    q.awaitTermination(120)
    _df(spark, CHUNK2).coalesce(1).write.mode("append").parquet(inp)
    time.sleep(1.1)
    _df(spark, SENTINEL).coalesce(1).write.mode("append").parquet(inp)
    q = start()
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .where(F.col("window.start") < "2029-01-01")
        .withColumn("window_start", F.col("window.start"))
        .drop("window")
    )
    exp = _batch_per_window(spark, kmv_distinct, k=2)
    key = lambda r: (str(r["window_start"]), r["est_distinct"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))


def test_windowed_kmv_drops_late_rows_for_closed_windows(spark, tmp_path):
    """Exactly-once on replay/lateness: after a window closes and emits,
    rows arriving for it are DROPPED without re-opening state — the sink
    never sees a second row for the same window."""
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    def start():
        stream = (
            spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(inp)
        )
        return (
            windowed_kmv(stream, "ts", "user_id", k=64)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    _df(spark, CHUNK1).coalesce(1).write.mode("append").parquet(inp)
    time.sleep(1.1)
    _df(spark, SENTINEL).coalesce(1).write.mode("append").parquet(inp)
    q = start()
    q.awaitTermination(120)
    first = (
        spark.read.parquet(out).where(F.col("window.start") < "2029-01-01").collect()
    )
    assert len(first) == 2  # both real windows closed and emitted

    # rows for the already-closed 10:00 window arrive after the close
    _df(spark, [(7, "2024-01-01 10:04:00"), (8, "2024-01-01 10:05:00")]).coalesce(
        1
    ).write.mode("append").parquet(inp)
    q = start()
    q.awaitTermination(120)
    again = (
        spark.read.parquet(out).where(F.col("window.start") < "2029-01-01").collect()
    )
    key = lambda r: (str(r["window"]["start"]), r["est_distinct"])
    assert sorted(map(key, again)) == sorted(map(key, first))  # no re-emission


def test_windowed_bloom_matches_batch_per_window(spark, tmp_path):
    got = _run(
        spark,
        tmp_path,
        lambda s: windowed_bloom(s, "ts", "user_id", num_bits=4096, num_hashes=5),
    )
    exp = _batch_per_window(spark, bloom_bits, num_bits=4096, num_hashes=5)
    key = lambda r: (str(r["window_start"]), r["word"], r["bits"])
    assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))
