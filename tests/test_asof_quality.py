"""Unit tests for the round-3 operator additions: as-of join
(operators/asof.py), benchmark decontamination (operators/decontam.py) and
Gopher-style repetition quality signals (operators/quality.py).

The as-of semantics are pinned against DuckDB's native ASOF JOIN (an
independent engine) plus hand-worked edge cases for direction, exact-match
exclusion, tolerance, and unmatched-left behavior. Decontam and repetition
are pinned against hand-computed values on tiny corpora.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.asof import asof_join
from graph_stream_zoomer_spark.operators.decontam import benchmark_overlap, benchmark_ngrams
from graph_stream_zoomer_spark.operators.quality import repetition_signals


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def quotes(spark):
    # right side: per-key quote stream
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:00:00"), 100),
            ("a", _ts("2024-01-01 10:05:00"), 105),
            ("a", _ts("2024-01-01 10:10:00"), 110),
            ("b", _ts("2024-01-01 10:07:00"), 207),
        ],
        "k string, ts timestamp, px int",
    )


@pytest.fixture()
def trades(spark):
    # left side: trades to enrich
    return spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 10:03:00"), 1),  # matches 10:00 backward
            ("a", _ts("2024-01-01 10:05:00"), 2),  # exact-ts match
            ("a", _ts("2024-01-01 10:59:00"), 3),  # matches 10:10, far away
            ("b", _ts("2024-01-01 10:00:00"), 4),  # no quote yet → unmatched
            ("c", _ts("2024-01-01 10:00:00"), 5),  # key never quoted
        ],
        "k string, ts timestamp, qty int",
    )


def _rows(df):
    return {
        r["qty"]: (r["asof_px"], r["asof_ts"]) for r in df.collect()
    }


class TestAsofJoin:
    def test_backward_default(self, trades, quotes):
        out = asof_join(trades, quotes, on="k")
        assert out.columns == ["k", "ts", "qty", "asof_ts", "asof_px"]
        got = _rows(out)
        assert got[1] == (100, _ts("2024-01-01 10:00:00"))
        assert got[2] == (105, _ts("2024-01-01 10:05:00"))  # exact ts included
        assert got[3] == (110, _ts("2024-01-01 10:10:00"))
        assert got[4] == (None, None)  # left row kept, NULL payload
        assert got[5] == (None, None)

    def test_backward_no_exact_match(self, trades, quotes):
        got = _rows(asof_join(trades, quotes, on="k", allow_exact_matches=False))
        # 10:05 trade must now skip the 10:05 quote and take 10:00
        assert got[2] == (100, _ts("2024-01-01 10:00:00"))
        assert got[1] == (100, _ts("2024-01-01 10:00:00"))

    def test_forward(self, trades, quotes):
        got = _rows(asof_join(trades, quotes, on="k", direction="forward"))
        assert got[1] == (105, _ts("2024-01-01 10:05:00"))
        assert got[2] == (105, _ts("2024-01-01 10:05:00"))
        assert got[3] == (None, None)  # nothing after 10:59
        assert got[4] == (207, _ts("2024-01-01 10:07:00"))

    def test_tolerance(self, trades, quotes):
        got = _rows(asof_join(trades, quotes, on="k", tolerance="10 minutes"))
        assert got[1] == (100, _ts("2024-01-01 10:00:00"))
        # 10:59 trade is 49 min from the 10:10 quote → nulled out
        assert got[3] == (None, None)

    def test_matches_duckdb_asof(self, trades, quotes):
        duckdb = pytest.importorskip("duckdb")
        con = duckdb.connect()
        con.register("trades", trades.toPandas())
        con.register("quotes", quotes.toPandas())
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                """
                SELECT t.qty, q.px, q.ts
                FROM trades t ASOF LEFT JOIN quotes q
                  ON t.k = q.k AND q.ts <= t.ts
                """
            ).fetchall()
        }
        got = _rows(asof_join(trades, quotes, on="k"))
        assert got == want

    def test_single_exchange_plan(self, trades, quotes):
        plan = asof_join(trades, quotes, on="k")._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan


class TestDecontam:
    @pytest.fixture()
    def corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "entirely novel words without any leak at all"),
                (3, "quick brown fox is here"),
            ],
            "doc_id bigint, text string",
        )

    @pytest.fixture()
    def bench(self, spark):
        return spark.createDataFrame(
            [(100, "THE QUICK BROWN FOX!")],
            "doc_id bigint, text string",
        )

    def test_gram_build_normalizes(self, bench):
        grams = {r["gram"] for r in benchmark_ngrams(bench, n=3).collect()}
        assert grams == {"the quick brown", "quick brown fox"}

    def test_overlap(self, corpus, bench):
        out = {
            r["doc_id"]: (r["n_hit"], r["n_grams"], r["overlap_ratio"])
            for r in benchmark_overlap(corpus, bench, n=3).collect()
        }
        # doc 1: 7 distinct 3-grams, 2 hit; doc 3: 3 grams, 1 hit
        # ("quick brown fox"); doc 2: zero hits → dropped by min_hits=1
        assert set(out) == {1, 3}
        assert out[1] == (2, 7, round(2 / 7, 6))
        assert out[3] == (1, 3, round(1 / 3, 6))

    def test_min_hits_zero_keeps_clean_docs(self, corpus, bench):
        out = benchmark_overlap(corpus, bench, n=3, min_hits=0)
        assert {r["doc_id"] for r in out.collect()} == {1, 2, 3}
        clean = out.where(F.col("doc_id") == 2).first()
        assert clean["n_hit"] == 0 and clean["overlap_ratio"] == 0.0

    def test_broadcast_in_plan(self, corpus, bench):
        plan = (
            benchmark_overlap(corpus, bench, n=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        # two exchanges total: the tiny BENCH side's distinct-gram agg
        # (inside the broadcast build — benchmark sets are MBs) and the
        # corpus doc_id aggregate. The corpus gram stream itself is never
        # shuffled on the gram key.
        assert plan.count("Exchange hashpartitioning") == 2, plan


class TestRepetitionSignals:
    def test_hand_computed(self, spark):
        docs = spark.createDataFrame(
            [
                # 6 words, 4 distinct, top word "spam" ×3;
                # bigrams: [spam spam, spam spam, spam eggs, eggs and, and ham]
                # → 5 raw, 4 distinct
                (1, "spam spam spam eggs and ham"),
                (2, "all distinct words here"),
                (3, "one"),
                (4, "!!!"),  # normalizes to empty → dropped
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r.asDict() for r in repetition_signals(docs).collect()}
        assert set(out) == {1, 2, 3}
        r1 = out[1]
        assert (r1["n_words"], r1["n_distinct_words"]) == (6, 4)
        assert r1["dup_word_frac"] == round(1 - 4 / 6, 6)
        assert r1["top_word_frac"] == 0.5
        assert r1["dup_2gram_frac"] == round(1 - 4 / 5, 6)
        r2 = out[2]
        assert r2["dup_word_frac"] == 0.0
        assert r2["top_word_frac"] == 0.25
        assert r2["dup_2gram_frac"] == 0.0
        r3 = out[3]
        assert (r3["n_words"], r3["dup_2gram_frac"]) == (1, 0.0)

    def test_single_real_exchange(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b c a b")], "doc_id bigint, text string"
        )
        plan = repetition_signals(docs)._jdf.queryExecution().executedPlan().toString()
        # one exchange, and it's the pre-explode repartition on doc_id;
        # both aggregates ((doc_id, word) and (doc_id)) reuse it via the
        # subset-clustering rule — the exploded words are never shuffled
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Generate explode" in plan


class TestQualityFilter:
    GOOD = (
        "the quick brown fox jumps over the lazy dog and then it stops to "
        "think about the warm afternoon while the birds are singing in the "
        "garden and the cat is watching from a windowsill near the door"
    )

    @pytest.fixture()
    def docs(self, spark):
        rows = [
            (0, self.GOOD, "en"),                      # clean
            (1, "short", "en"),                        # too_short
            (2, self.GOOD, "de"),                      # lang
            (3, "spam " * 60, "en"),                   # top_word + dup_words
            (4, "!!! ??? *** ###" * 20, "en"),         # empty (no alnum) → empty gate
            (5, self.GOOD * 200, "en"),                # too_long at max_chars=20000
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_gates_and_reasons(self, spark, docs):
        from graph_stream_zoomer_spark.operators.quality import quality_filter

        out = {
            r["doc_id"]: r
            for r in quality_filter(
                docs,
                min_chars=50,
                max_chars=20_000,
                min_quality=0.5,
                max_dup_word_frac=0.5,
                max_top_word_frac=0.3,
                max_dup_2gram_frac=0.5,
                langs=("en",),
            ).collect()
        }
        assert out[0]["keep"] and out[0]["drop_reasons"] == []
        assert "too_short" in out[1]["drop_reasons"] and not out[1]["keep"]
        assert out[2]["drop_reasons"] == ["lang"]
        assert {"dup_words", "top_word"} <= set(out[3]["drop_reasons"])
        assert "empty" in out[4]["drop_reasons"]
        assert "too_long" in out[5]["drop_reasons"]

    def test_none_thresholds_skip_gates(self, spark, docs):
        from graph_stream_zoomer_spark.operators.quality import quality_filter

        out = {
            r["doc_id"]: r
            for r in quality_filter(
                docs,
                min_chars=1,
                max_chars=10**9,
                min_quality=None,
                max_dup_word_frac=None,
                max_top_word_frac=None,
                max_dup_2gram_frac=None,
            ).collect()
        }
        assert out[3]["keep"]  # repetition gates off
        assert not out[4]["keep"]  # empty gate always on


class TestSessionize:
    def test_gap_rule(self, spark):
        from graph_stream_zoomer_spark.operators.rollup import sessionize

        rows = [
            ("c1", 0, "2024-01-01 10:00:00"),
            ("c1", 1, "2024-01-01 10:10:00"),   # 10 min gap → same session
            ("c1", 2, "2024-01-01 11:30:00"),   # 80 min gap → new session
            ("c1", 3, "2024-01-01 11:31:00"),
            ("c2", 0, "2024-01-01 10:00:00"),
        ]
        t = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {
            (r["conv_id"], r["turn_idx"]): r["session_id"]
            for r in sessionize(t, gap_s=1800).collect()
        }
        assert out[("c1", 0)] == out[("c1", 1)] == "c1#1"
        assert out[("c1", 2)] == out[("c1", 3)] == "c1#2"
        assert out[("c2", 0)] == "c2#1"

    def test_groupby_session_matches_session_window_count(self, spark):
        """The gap rule must agree with Spark's session_window: grouping by
        sessionize's label gives the same per-session turn counts."""
        from graph_stream_zoomer_spark.operators.rollup import sessionize

        # includes an exact-boundary gap (minute 18 → 28 is exactly the
        # 10-minute gap): session_window MERGES that event (verified
        # empirically), so sessionize's strict-> rule must too
        rows = [
            ("c1", i, f"2024-01-01 10:{m:02d}:00")
            for i, m in enumerate([0, 4, 8, 18, 28, 59])
        ]
        t = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, ts string"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        via_label = sorted(
            r["n"]
            for r in sessionize(t, gap_s=600)
            .groupBy("session_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        via_window = sorted(
            r["n"]
            for r in t.groupBy(F.session_window("ts", "10 minutes"), "conv_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert via_label == via_window


def test_decontam_foreachbatch_matches_batch(spark, tmp_path):
    """Executable form of decontam_overlap's declared streaming stance
    (SURVEY §2.10): per-doc computation against the broadcast benchmark
    gram set has no cross-doc state, so applying the SAME fn per
    micro-batch in foreachBatch and unioning the appended results equals
    the batch run over all input."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "entirely novel words without any leak at all"),
            (3, "quick brown fox is here"),
            (4, "the lazy dog naps under the quick brown fox"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(100, "THE QUICK BROWN FOX!")], "doc_id bigint, text string"
    )
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    corpus.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(corpus.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    def apply_decontam(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        benchmark_overlap(batch_df, bench, n=3).write.mode("append").parquet(out)

    q = (
        stream.writeStream.foreachBatch(apply_decontam)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, benchmark_overlap(corpus, bench, n=3).collect()))
    assert got == want and got
