"""Streaming transcript → triple binding.

The batch binding uses ``lead()`` over (conv_id, turn_idx) — an analytic
window, which Structured Streaming forbids. The streaming form derives the
successor edge with a watermarked stream-stream self-join:

    turn t  ⋈  turn t'  ON  t'.conv_id = t.conv_id
                        AND t'.turn_idx = t.turn_idx + 1
                        AND t'.ts BETWEEN t.ts AND t.ts + max_turn_gap

The time-range bound (``max_turn_gap``) lets Spark evict join state at the
watermark — without it the join would buffer every turn forever. Turns
farther apart than max_turn_gap produce no successor edge (a documented
sessionization bound, not present in batch).

Scale: the join shuffles both sides by conv_id; at 10^12 turns this is the
dominant shuffle, so the input table should be written bucketed/partitioned
by conv_id (Iceberg: ``bucket(N, conv_id)``) to allow storage-partitioned
joins that skip the shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.transcripts import _turn_props


def _joined_successors(turns: DataFrame, watermark: str, max_turn_gap: str) -> DataFrame:
    a = turns.withWatermark("ts", watermark).alias("a")
    b = turns.withWatermark("ts", watermark).alias("b")
    return a.join(
        b,
        (F.col("a.conv_id") == F.col("b.conv_id"))
        & (F.col("b.turn_idx") == F.col("a.turn_idx") + 1)
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr(f"INTERVAL {max_turn_gap}")),
        "inner",
    )


def streaming_transcript_triples(
    turns: DataFrame,
    watermark: str = "10 seconds",
    max_turn_gap: str = "1 hour",
    use_arrow: bool = False,
) -> DataFrame:
    joined = _joined_successors(turns, watermark, max_turn_gap)

    def props(side: str):
        text_c = F.col(f"{side}.text")
        return F.map_from_arrays(
            F.array(F.lit("tool"), F.lit("text_len"), F.lit("hour_bucket")),
            F.array(
                F.col(f"{side}.tool"),
                F.length(text_c).cast("string"),
                F.date_format(F.col(f"{side}.ts"), "yyyy-MM-dd HH"),
            ),
        )

    def vid(side: str):
        return F.concat_ws(
            ":", F.col(f"{side}.conv_id"), F.col(f"{side}.turn_idx").cast("string")
        )

    return joined.select(
        F.concat(vid("a"), F.lit("->"), F.col("b.turn_idx").cast("string")).alias("edge_id"),
        F.col("b.ts").alias("event_time"),
        F.concat_ws("->", F.col("a.role"), F.col("b.role")).alias("edge_label"),
        F.map_from_arrays(
            F.array(F.lit("tool"), F.lit("text_len"), F.lit("hour_bucket"), F.lit("transition")),
            F.array(
                F.col("b.tool"),
                F.length(F.col("b.text")).cast("string"),
                F.date_format(F.col("b.ts"), "yyyy-MM-dd HH"),
                F.concat_ws("->", F.col("a.role"), F.col("b.role")),
            ),
        ).alias("edge_properties"),
        F.struct(
            vid("a").alias("vertex_id"),
            F.col("a.role").alias("vertex_label"),
            props("a").alias("vertex_properties"),
            F.col("a.ts").alias("event_time"),
        ).alias("source"),
        F.struct(
            vid("b").alias("vertex_id"),
            F.col("b.role").alias("vertex_label"),
            props("b").alias("vertex_properties"),
            F.col("b.ts").alias("event_time"),
        ).alias("target"),
    )


def streaming_vertex_observations(
    turns: DataFrame,
    watermark: str = "10 seconds",
    max_turn_gap: str = "1 hour",
) -> DataFrame:
    """Vertex observation stream (Extractor analog): the two endpoint
    projections of the successor join, unioned.

    Built with *direct* column references (``a.ts``/``b.ts``), never routed
    through a struct: Spark tracks the event-time/watermark marker by
    attribute, and packing into a struct would strip it — downstream
    stateful operators (dedup, windowed agg) need the marker. The watermark
    is defined exactly once, on the join inputs; downstream operators must
    NOT call withWatermark again (Spark forbids redefinition once multiple
    stateful operators are allowed)."""
    joined = _joined_successors(turns, watermark, max_turn_gap)

    def vertex_side(side: str) -> DataFrame:
        text_c = F.col(f"{side}.text")
        return joined.select(
            F.concat_ws(
                ":", F.col(f"{side}.conv_id"), F.col(f"{side}.turn_idx").cast("string")
            ).alias("vertex_id"),
            F.col(f"{side}.ts").alias("event_time"),
            F.col(f"{side}.role").alias("vertex_label"),
            F.map_from_arrays(
                F.array(F.lit("tool"), F.lit("text_len"), F.lit("hour_bucket")),
                F.array(
                    F.col(f"{side}.tool"),
                    F.length(text_c).cast("string"),
                    F.date_format(F.col(f"{side}.ts"), "yyyy-MM-dd HH"),
                ),
            ).alias("vertex_properties"),
        )

    return vertex_side("a").unionByName(vertex_side("b"))
