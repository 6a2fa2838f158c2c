"""Bucketed storage layout for the transcript table — the 100 TB fast path.

The grouping pipeline's plan is 2 exchanges end-to-end: (1) hash-partition
by conv_id for the successor ``lead()`` window, (2) the windowed group
hash-agg. Exchange (1) is removable purely by storage layout: a table
bucketed by conv_id scans with HashPartitioning(conv_id) already satisfied,
so Catalyst elides the window exchange and the whole binding runs
shuffle-free — only the (much smaller, post-combine) aggregation exchange
remains. This is the parquet ``bucketBy`` equivalent of the Iceberg
``bucket(N, conv_id)`` partition transform named in streaming/binding.py;
``tests/test_plans.py::test_bucketed_layout_elides_binding_shuffle`` proves
the elision on a real plan.

Sorting within buckets by (conv_id, turn_idx) additionally lets the window
sort run over nearly-sorted runs; Spark still inserts a local sort node
(it only trusts bucket sort metadata for single-file buckets), so the
shuffle elision — the network cost — is the win that matters at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_transcripts(
    turns: DataFrame,
    table_name: str,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Write the transcript table bucketed by conv_id (parquet bucketBy —
    requires saveAsTable; ``path`` makes it an external table so tests can
    target a temp dir). Production Iceberg: ``bucket(N, conv_id)``."""
    w = (
        turns.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "conv_id")
        .sortBy("conv_id", "turn_idx")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed_transcripts(spark: SparkSession, table_name: str) -> DataFrame:
    """Read the bucketed table. Bucketed scans only report their
    HashPartitioning when bucketing is enabled (default) — assert rather
    than silently fall back to the shuffling plan."""
    if spark.conf.get("spark.sql.sources.bucketing.enabled") != "true":
        raise ValueError(
            "spark.sql.sources.bucketing.enabled is off — the bucketed scan "
            "would silently reintroduce the binding shuffle"
        )
    return spark.table(table_name)
