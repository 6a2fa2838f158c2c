"""CEP sequence-pattern matching: batch lead-based form vs streaming
keyed-state form (operators/cep.py) must agree; overlapping runs and
multi-batch out-of-order arrival emit exactly once."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.cep import match_sequence, streaming_match_sequence
from graph_stream_zoomer_spark.sources.transcripts import generate_transcripts
from graph_stream_zoomer_spark.streaming.job import read_transcript_stream

PATTERN = ["user", "assistant"]


def _sentinel(spark):
    return spark.createDataFrame(
        [("zz_flush", 0, "user", "flush", "", "2030-01-01 00:00:00"),
         ("zz_flush", 1, "tool", "flush", "", "2030-01-01 00:00:05")],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _run_stream(spark, path, cp, pattern, max_files=None):
    stream = read_transcript_stream(spark, path, max_files_per_trigger=max_files)
    matched = streaming_match_sequence(
        stream.withWatermark("ts", "10 seconds"), pattern, within="1 hour"
    )
    rows = []
    q = (
        matched.writeStream.foreachBatch(lambda b, i: rows.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [r for r in rows if r["conv_id"] != "zz_flush"]


def _as_set(rows):
    return {(r["conv_id"], r["start_turn_idx"], r["start_ts"], r["end_ts"]) for r in rows}


def test_streaming_matches_batch(spark, tmp_path):
    turns = generate_transcripts(spark, 50, late_fraction_pct=0, skew=False)
    d = str(tmp_path / "turns")
    turns.unionByName(_sentinel(spark)).repartition(4).write.parquet(d)

    got = _as_set(_run_stream(spark, d, str(tmp_path / "cp"), PATTERN))
    exp_rows = match_sequence(turns, PATTERN, within="1 hour").collect()
    exp = _as_set(exp_rows)
    assert got == exp
    assert len(exp) > 0


def test_overlapping_runs_and_out_of_order_multibatch(spark, tmp_path):
    """Pattern [a, b, a]: turns a0 b1 a2 b3 a4 has overlapping matches at 0
    and 2 sharing turn a2. Deliver the middle turn in a LATER micro-batch
    than its neighbors — both matches must still emit, each exactly once."""
    pattern = ["a", "b", "a"]
    base = "2025-06-01 10:00:"
    rows1 = [("c1", 0, "a", base + "00"), ("c1", 1, "b", base + "01"),
             ("c1", 3, "b", base + "03"), ("c1", 4, "a", base + "04")]
    rows2 = [("c1", 2, "a", base + "02")]  # arrives late (within watermark)
    sent = [("zz", 0, "x", "2030-01-01 00:00:00")]

    d = str(tmp_path / "t2")

    def write_chunk(rows):
        spark.createDataFrame(
            [(c, i, r, r + str(i), "", ts) for c, i, r, ts in rows],
            "conv_id string, turn_idx int, role string, text string, tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        time.sleep(1.2)  # distinct mtimes → deterministic file order

    write_chunk(rows1)
    write_chunk(rows2)
    write_chunk(sent)

    got = _run_stream(spark, d, str(tmp_path / "cp2"), pattern, max_files=1)
    starts = sorted((r["conv_id"], r["start_turn_idx"]) for r in got)
    assert starts == [("c1", 0), ("c1", 2)]


def test_time_bound_excludes_slow_runs(spark):
    rows = [("c1", 0, "user", "2025-06-01 10:00:00"),
            ("c1", 1, "assistant", "2025-06-01 11:30:00"),  # 90 min later
            ("c2", 0, "user", "2025-06-01 10:00:00"),
            ("c2", 1, "assistant", "2025-06-01 10:20:00")]
    turns = spark.createDataFrame(
        [(c, i, r, "", "", ts) for c, i, r, ts in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = match_sequence(turns, PATTERN, within="1 hour").collect()
    assert [r["conv_id"] for r in got] == ["c2"]


def test_followed_by_gap_negation_and_window(spark):
    """Skip-till-next-match semantics: gaps allowed, NEXT occurrence only,
    negation role blocks, time bound excludes slow pairs."""
    from graph_stream_zoomer_spark.operators.cep import match_followed_by

    rows = [
        # c1: click .. view .. purchase (gap ok) then a second purchase
        # (NOT matched — only the next one counts)
        ("c1", 0, "click", "2025-01-01 00:00:00"),
        ("c1", 1, "view", "2025-01-01 00:01:00"),
        ("c1", 2, "purchase", "2025-01-01 00:02:00"),
        ("c1", 3, "purchase", "2025-01-01 00:03:00"),
        # c2: error strictly between → negation blocks
        ("c2", 0, "click", "2025-01-01 00:00:00"),
        ("c2", 1, "error", "2025-01-01 00:01:00"),
        ("c2", 2, "purchase", "2025-01-01 00:02:00"),
        # c3: purchase too late (2h > 1h bound)
        ("c3", 0, "click", "2025-01-01 00:00:00"),
        ("c3", 1, "purchase", "2025-01-01 02:00:00"),
        # c4: error AFTER the matched purchase → does not block
        ("c4", 0, "click", "2025-01-01 00:00:00"),
        ("c4", 1, "purchase", "2025-01-01 00:30:00"),
        ("c4", 2, "error", "2025-01-01 00:45:00"),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    got = {
        (r["conv_id"], r["start_turn_idx"], r["end_turn_idx"])
        for r in match_followed_by(
            t, "click", "purchase", within="1 hour", not_between="error"
        ).collect()
    }
    assert got == {("c1", 0, 2), ("c4", 0, 1)}
    # without negation, c2 matches too
    got2 = {
        (r["conv_id"], r["start_turn_idx"], r["end_turn_idx"])
        for r in match_followed_by(t, "click", "purchase", within="1 hour").collect()
    }
    assert got2 == {("c1", 0, 2), ("c2", 0, 2), ("c4", 0, 1)}


def _run_followed_stream(spark, path, cp, first, then, max_files=None, not_between=None):
    from graph_stream_zoomer_spark.operators.cep import streaming_match_followed_by

    stream = read_transcript_stream(spark, path, max_files_per_trigger=max_files)
    matched = streaming_match_followed_by(
        stream.withWatermark("ts", "10 seconds"),
        first,
        then,
        within="1 hour",
        not_between=not_between,
    )
    rows = []
    q = (
        matched.writeStream.foreachBatch(lambda b, i: rows.extend(b.collect()))
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [r for r in rows if r["conv_id"] != "zz_flush" and r["conv_id"] != "zz"]


def _fb_set(rows):
    return {
        (r["conv_id"], r["start_turn_idx"], r["end_turn_idx"], r["start_ts"], r["end_ts"])
        for r in rows
    }


def test_streaming_followed_by_matches_batch(spark, tmp_path):
    """Keyed-state skip-till-next-match agrees row-for-row with the batch
    window-frame form on generated transcripts (full watermark drain)."""
    from graph_stream_zoomer_spark.operators.cep import match_followed_by

    turns = generate_transcripts(spark, 50, late_fraction_pct=0, skew=False)
    d = str(tmp_path / "fbturns")
    turns.unionByName(_sentinel(spark)).repartition(4).write.parquet(d)

    got = _fb_set(
        _run_followed_stream(spark, d, str(tmp_path / "fbcp"), "user", "tool")
    )
    exp = _fb_set(match_followed_by(turns, "user", "tool", within="1 hour").collect())
    assert got == exp
    assert len(exp) > 0


def test_streaming_followed_by_waits_for_gap_then_decides_once(spark, tmp_path):
    """The NEXT-occurrence decision must wait for a missing in-between turn:
    c1 = click(0) .. ?(1) .. purchase(2) with turn 1 delivered in a later
    micro-batch. If turn 1 is an error (negation) the pair is blocked; the
    early batch must NOT have emitted (0,2) prematurely."""
    base = "2025-06-01 10:00:"
    rows1 = [("c1", 0, "click", base + "00"), ("c1", 2, "purchase", base + "02"),
             ("c2", 0, "click", base + "00"), ("c2", 2, "purchase", base + "02")]
    rows2 = [("c1", 1, "error", base + "01"),  # blocks c1
             ("c2", 1, "view", base + "01")]   # c2 unaffected
    sent = [("zz", 0, "x", "2030-01-01 00:00:00")]

    d = str(tmp_path / "fb2")

    def write_chunk(rows):
        spark.createDataFrame(
            [(c, i, r, r + str(i), "", ts) for c, i, r, ts in rows],
            "conv_id string, turn_idx int, role string, text string, tool string, ts string",
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(d)
        time.sleep(1.2)

    write_chunk(rows1)
    write_chunk(rows2)
    write_chunk(sent)

    got = _run_followed_stream(
        spark, d, str(tmp_path / "fbcp2"), "click", "purchase",
        max_files=1, not_between="error",
    )
    assert sorted((r["conv_id"], r["start_turn_idx"], r["end_turn_idx"]) for r in got) == [
        ("c2", 0, 2)
    ]


def test_interval_grammar_parity_fractional_multiunit(spark):
    """Every spec _interval_us blesses must also EXECUTE: '1.5 hours
    30 minutes' is valid to the shared validator but rejected by Spark's
    multi-unit INTERVAL literal grammar (fractional non-final unit) — the
    operators must therefore run on the normalized microsecond count, not
    re-parse the raw string."""
    from graph_stream_zoomer_spark.operators.cep import match_followed_by, match_sequence

    rows = [
        ("c1", 0, "user", "2025-06-01 10:00:00"),
        ("c1", 1, "assistant", "2025-06-01 11:45:00"),  # 105 min later
        ("c2", 0, "user", "2025-06-01 10:00:00"),
        ("c2", 1, "assistant", "2025-06-01 12:15:00"),  # 135 min later
    ]
    t = spark.createDataFrame(
        [(c, i, r, "", "", ts) for c, i, r, ts in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # 1.5 hours 30 minutes = 120 min: c1 (105) in, c2 (135) out
    got = match_sequence(t, ["user", "assistant"], within="1.5 hours 30 minutes").collect()
    assert [r["conv_id"] for r in got] == ["c1"]
    got_fb = match_followed_by(
        t, "user", "assistant", within="1.5 hours 30 minutes"
    ).collect()
    assert [r["conv_id"] for r in got_fb] == ["c1"]
