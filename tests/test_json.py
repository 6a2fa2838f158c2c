"""Semi-structured JSON promotion — functions/json.py."""

from __future__ import annotations

from graph_stream_zoomer_spark.functions.json import json_key_stats, promote_json


def _events(spark):
    return spark.createDataFrame(
        [
            (1, '{"k": 7, "name": "a"}'),
            (2, '{"k": 8}'),
            (3, "{not json"),
            (4, None),
        ],
        "event_id long, props string",
    )


def test_promote_json_types_missing_and_corrupt(spark):
    out = promote_json(
        _events(spark), "props", ddl="k INT, name STRING", corrupt_col="bad"
    )
    rows = {r.event_id: r for r in out.collect()}
    assert dict(out.dtypes)["k"] == "int" and dict(out.dtypes)["name"] == "string"
    assert (rows[1].k, rows[1].name) == (7, "a")
    assert (rows[2].k, rows[2].name) == (8, None)  # missing key → null
    assert rows[3].k is None and rows[3].bad == "{not json"  # quarantined
    assert rows[4].k is None and rows[4].bad is None  # null input ≠ corrupt
    # drop + prefix form
    dropped = promote_json(_events(spark), "props", ddl="k INT", prefix="p_", drop=True)
    assert "props" not in dropped.columns and "p_k" in dropped.columns


def test_json_key_stats_counts_and_presence(spark):
    got = {r.key: (r.n_rows, r.presence) for r in json_key_stats(_events(spark)).collect()}
    assert got == {"k": (2, 0.5), "name": (1, 0.25)}


def test_promotion_is_stream_transparent(spark, tmp_path):
    """Pure projection: the same promote_json call runs unchanged on a
    readStream input and emits byte-identical rows."""
    src = str(tmp_path / "ev")
    _events(spark).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = str(tmp_path / "out")
    (
        promote_json(stream, "props", ddl="k INT", corrupt_col="bad")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(tuple, promote_json(batch, "props", ddl="k INT", corrupt_col="bad").collect())
    )
    assert got == want and len(got) == 4


def test_promote_json_comma_bearing_types(spark):
    """Field names must come from a real DDL parse (StructType.fromDDL),
    not a naive split(',') — DECIMAL(10,2) and ARRAY<STRUCT<...>> embed
    commas inside a single field's type. Regression."""
    df = spark.createDataFrame(
        [(1, '{"price": 12.34, "tags": [{"a": 1, "b": 2}], "name": "x"}')],
        "event_id long, props string",
    )
    out = promote_json(
        df,
        "props",
        ddl="price DECIMAL(10,2), tags ARRAY<STRUCT<a:INT,b:INT>>, name STRING",
    )
    assert {"price", "tags", "name"} <= set(out.columns)
    # no bogus columns from splitting inside DECIMAL(10,2) / STRUCT<a,b>
    assert not any(c.endswith(")") or c.startswith("2") for c in out.columns)
    row = out.collect()[0]
    assert str(row["price"]) == "12.34"
    assert row["name"] == "x"
    assert [tuple(t) for t in row["tags"]] == [(1, 2)]
