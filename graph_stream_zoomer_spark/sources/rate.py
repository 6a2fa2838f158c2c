"""Unbounded synthetic triple generator (reference S2).

Reference parity: ``RandomStreamTripleGenerator`` — dictionaries of
``num_vertex_labels`` / ``num_edge_labels`` / ``num_vertex_ids``, a
configurable rows/sec rate, monotone event time
(``application/functions/RandomStreamTripleGenerator.java:34-100``,
``application/RandomGeneratorExample.java:61-68``).

Spark-first: ``rate-micro-batch`` source + deterministic hash-derived
column expressions — no runtime randomness, so replays from checkpoint
regenerate identical rows (the reference's java.util.Random generator is
not replay-stable; ours is, by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_triples(
    spark: SparkSession,
    rows_per_second: int = 1000,
    num_vertex_labels: int = 10,
    num_edge_labels: int = 10,
    num_vertex_ids: int = 10_000,
    micro_batch: bool = True,
) -> DataFrame:
    """Streaming DataFrame of synthetic StreamTriples at a configured rate.

    The rate source provides (timestamp, value); every triple field is a
    pure function of ``value`` via xxhash64.
    """
    fmt = "rate-micro-batch" if micro_batch else "rate"
    opt = "rowsPerBatch" if micro_batch else "rowsPerSecond"
    raw = spark.readStream.format(fmt).option(opt, rows_per_second).load()

    def h(seed: int) -> Column:
        return F.abs(F.xxhash64(F.lit(seed), F.col("value")))

    def vid(seed: int) -> Column:
        return F.concat(F.lit("v"), F.pmod(h(seed), F.lit(num_vertex_ids)).cast("string"))

    def vlabel(seed: int) -> Column:
        return F.concat(F.lit("L"), F.pmod(h(seed), F.lit(num_vertex_labels)).cast("string"))

    def vertex(seed: int) -> Column:
        return F.struct(
            vid(seed).alias("vertex_id"),
            vlabel(seed + 1).alias("vertex_label"),
            F.map_from_arrays(
                F.array(F.lit("x")),
                F.array(F.pmod(h(seed + 2), F.lit(100)).cast("string")),
            ).alias("vertex_properties"),
            F.col("timestamp").alias("event_time"),
        )

    return raw.select(
        F.concat(F.lit("e"), F.col("value").cast("string")).alias("edge_id"),
        F.col("timestamp").alias("event_time"),
        F.concat(F.lit("E"), F.pmod(h(7), F.lit(num_edge_labels)).cast("string")).alias(
            "edge_label"
        ),
        F.map_from_arrays(
            F.array(F.lit("w")), F.array(F.pmod(h(8), F.lit(50)).cast("string"))
        ).alias("edge_properties"),
        vertex(11).alias("source"),
        vertex(23).alias("target"),
    )
