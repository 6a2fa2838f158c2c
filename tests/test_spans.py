"""Exact-substring (span-level) dedup semantics — operators/spans.py.

Boundary expectations are hand-computed on a constructed corpus:
BOILER is 37 chars; doc 2 embeds it at offset 6. With span_len=10 and
stride=3, duplicated grid windows in doc 1 start at 0..27 (10 windows →
span [0, 37)) and in doc 2 at 6..33 (10 windows → span [6, 43))."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.spans import (
    duplicate_spans,
    span_coverage,
    strip_duplicate_spans,
)

BOILER = "BOILERPLATE-LICENSE-HEADER-0123456789"  # 37 chars


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, BOILER + " alpha unique text one"),
            (2, "intro " + BOILER + " beta different tail"),
            (3, "totally unrelated content without repeats here"),
        ],
        "doc_id long, text string",
    )


def test_cross_doc_spans_and_keep_first(spark):
    docs = _docs(spark)
    all_spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in duplicate_spans(docs, span_len=10, stride=3).collect()
    }
    assert all_spans == {(1, 0, 37, 10), (2, 6, 43, 10)}
    # keep_first: the globally-first occurrence (min (doc, pos)) is exempt
    first_kept = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(
            docs, span_len=10, stride=3, keep_first=True
        ).collect()
    }
    assert first_kept == {(2, 6, 43)}


def test_within_doc_repetition_merges_to_one_span(spark):
    # 10-char period repeated 5×: every grid window has a partner ±10,
    # so the whole doc merges into a single maximal span
    docs = spark.createDataFrame(
        [(9, "0123456789" * 5)], "doc_id long, text string"
    )
    rows = duplicate_spans(docs, span_len=10, stride=2).collect()
    assert [(r.span_start, r.span_end, r.n_windows) for r in rows] == [(0, 50, 21)]


def test_min_count_threshold_and_short_docs(spark):
    # each BOILER window occurs exactly twice → min_count=3 finds nothing
    assert duplicate_spans(_docs(spark), span_len=10, stride=3, min_count=3).count() == 0
    # identical docs shorter than span_len emit no windows at all
    tiny = spark.createDataFrame(
        [(1, "tiny"), (2, "tiny")], "doc_id long, text string"
    )
    assert duplicate_spans(tiny, span_len=10, stride=3).count() == 0
    with pytest.raises(ValueError):
        duplicate_spans(_docs(spark), min_count=1)


def test_strip_removes_only_non_first_occurrences(spark):
    docs = _docs(spark)
    stripped = strip_duplicate_spans(docs, span_len=10, stride=3)
    assert stripped.columns == docs.columns
    got = {r.doc_id: r.text for r in stripped.collect()}
    b = "intro " + BOILER + " beta different tail"
    assert got[1] == BOILER + " alpha unique text one"  # first copy intact
    assert got[2] == b[:6] + b[43:]  # span cut, surrounding bytes intact
    assert got[3] == "totally unrelated content without repeats here"


def test_reproducible_mode_matches_fast_path_and_coverage(spark):
    docs = _docs(spark)
    fast = sorted(
        map(tuple, duplicate_spans(docs, span_len=10, stride=3).collect())
    )
    repro = sorted(
        map(
            tuple,
            duplicate_spans(
                docs, span_len=10, stride=3, reproducible=True
            ).collect(),
        )
    )
    assert fast == repro
    cov = {
        r.doc_id: (r.dup_chars, r.dup_ratio)
        for r in span_coverage(
            docs, duplicate_spans(docs, span_len=10, stride=3)
        ).collect()
    }
    assert cov[1][0] == 37 and cov[2][0] == 37 and cov[3] == (0, 0.0)
