"""The reference's golden test fixture ("zoomer-8x8") as literal rows.

Source: /root/reference/src/test/java/edu/dbsleipzig/stream/grouping/impl/
algorithm/Initializer.java:17-109 (8 vertices labeled A/B with properties
Relevance/Size/Weekday; 8 edges labeled impacts/calculates with properties
Weekday/Weight; timestamps t1 = 1619511660000 ms, t2 = t1 + 10 s).

The fixture arrives as a *triple stream*: each edge carries both endpoint
vertices inline, so a vertex incident to k edges appears k times in the raw
vertex stream and must deduplicate back within a window
(FullGroupCountAggTest.java:78-86).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from ..model import TRIPLE_SCHEMA

T1_MS = 1619511660000
T2_MS = T1_MS + 10_000


def _ts(ms: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(ms / 1000.0, tz=dt.timezone.utc).replace(tzinfo=None)


# vertex_id -> (label, properties)
_VERTICES = {
    "v1": ("A", {"Relevance": "1", "Size": "15", "Weekday": "Monday"}),
    "v2": ("B", {"Relevance": "3", "Size": "10"}),
    "v3": ("A", {"Relevance": "2", "Size": "30", "Weekday": "Monday"}),
    "v4": ("B", {"Relevance": "5", "Size": "5", "Weekday": "Thursday"}),
    "v5": ("A", {"Relevance": "2", "Weekday": "Monday"}),
    "v6": ("B", {"Relevance": "3", "Size": "10"}),
    "v7": ("A", {"Relevance": "2", "Size": "30", "Weekday": "Monday"}),
    "v8": ("B", {"Relevance": "5", "Size": "5", "Weekday": "Thursday"}),
}

_VERTEX_TIME = {  # v1-v4 at t1, v5-v8 at t2 (Initializer.java:30-81)
    "v1": T1_MS, "v2": T1_MS, "v3": T1_MS, "v4": T1_MS,
    "v5": T2_MS, "v6": T2_MS, "v7": T2_MS, "v8": T2_MS,
}

# edge_id -> (label, properties, source, target, ts_ms)
_EDGES = [
    ("e1", "impacts", {"Weekday": "Thursday"}, "v1", "v2", T1_MS),
    ("e2", "impacts", {"Weight": "6"}, "v3", "v4", T1_MS),
    ("e3", "calculates", {"Weekday": "Thursday", "Weight": "3"}, "v3", "v4", T1_MS),
    ("e4", "impacts", {"Weekday": "Thursday"}, "v1", "v2", T1_MS),
    ("e5", "impacts", {"Weight": "6"}, "v5", "v6", T2_MS),
    ("e6", "calculates", {"Weekday": "Thursday", "Weight": "3"}, "v5", "v6", T2_MS),
    ("e7", "impacts", {"Weekday": "Thursday"}, "v7", "v8", T2_MS),
    ("e8", "impacts", {"Weight": "6"}, "v7", "v8", T2_MS),
]


def _vertex_struct(vid: str):
    label, props = _VERTICES[vid]
    return (vid, label, props, _ts(_VERTEX_TIME[vid]))


def fixture_triples(spark: SparkSession) -> DataFrame:
    rows = [
        (eid, _ts(ms), label, props, _vertex_struct(src), _vertex_struct(tgt))
        for eid, label, props, src, tgt, ms in _EDGES
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)
