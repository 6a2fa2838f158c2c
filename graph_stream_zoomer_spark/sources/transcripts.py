"""Transcript input binding (BASELINE.json input_hint) + deterministic
synthetic transcript generator.

Input table shape: ``(conv_id:string, turn_idx:int, role:string,
text:string, tool:string, ts:timestamp)`` — an Iceberg table in production,
parquet in this sandbox (see sources/iceberg.py for the gated adapter).

Graph binding (SURVEY.md §1.4): vertex = turn, edge = successor edge between
consecutive turns of one conversation; each successor edge plus its two
endpoint turns is a StreamTriple, which feeds the joinless triple fast path
of the grouping operator.

Generator design for 100 TB scale: rows are synthesized *distributively*
from ``spark.range`` with pure column expressions — no driver-side loops, no
runtime randomness (every value derives from xxhash64 of (conv_id,
turn_idx)), so any worker can regenerate any partition independently and the
same (seed, n) always yields byte-identical data (FIXTURES.md §2 spec).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..config import StreamGraphConfig
from ..model import StreamGraph
from ..functions.text import pdf_text_len

FILLER = "the quick brown fox jumps over the lazy dog and then it stops to think "
BASE_EPOCH = 1735689600  # 2025-01-01 00:00:00 UTC


def _h(*cols: Column, seed: int = 42) -> Column:
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def generate_transcripts(
    spark: SparkSession,
    num_convs: int,
    *,
    late_fraction_pct: int = 1,
    skew: bool = True,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic synthetic transcripts, mean ≈9 turns/conversation.

    ``skew``: the first 0.1% of conv_ids get 10× turns and a hot role —
    exercises the salted aggregation path. ``late_fraction_pct``% of turns
    get ts lagged 15 s (1.5× the default watermark) to exercise late-data
    drops.
    """
    convs = spark.range(0, num_convs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    n_skewed = max(1, num_convs // 1000) if skew else 0
    convs = convs.select(
        F.col("id").alias("conv_i"),
        F.format_string("c%08d", F.col("id")).alias("conv_id"),
        (F.lit(2) + F.pmod(_h(F.col("id")), F.lit(15))).alias("_base_turns"),
        (F.col("id") < n_skewed).alias("_skewed"),
    ).withColumn(
        "n_turns",
        F.when(F.col("_skewed"), F.least(F.col("_base_turns") * 10, F.lit(160))).otherwise(
            F.col("_base_turns")
        ),
    )
    turns = convs.select(
        "conv_i",
        "conv_id",
        "_skewed",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    th = _h(F.col("conv_i"), F.col("turn_idx"))
    role = (
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .when(F.col("_skewed"), F.lit("assistant"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("assistant"))
        .when(F.pmod(th, F.lit(3)) == 0, F.lit("tool"))
        .otherwise(F.lit("user"))
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(F.lit("search"), F.lit("python"), F.lit("browser")),
            (F.pmod(th, F.lit(3)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))
    text_len = F.lit(20) + F.pmod(th, F.lit(381))
    text = F.concat(
        F.col("conv_id"),
        F.lit(":"),
        F.col("turn_idx").cast("string"),
        F.lit(":"),
        role,
        F.lit(":"),
        F.substring(F.repeat(F.lit(FILLER), 6), 1, 400).substr(F.lit(1), text_len),
    )
    # monotone within a conversation: offset ∈ [31·t, 31·t+29]; the next
    # turn starts at 31·(t+1) > 31·t+29
    offset_s = F.col("turn_idx") * 31 + F.pmod(th, F.lit(30))
    late = F.pmod(_h(F.col("conv_i"), F.col("turn_idx"), seed=777), F.lit(100)) < late_fraction_pct
    ts_s = (
        F.lit(BASE_EPOCH)
        + F.pmod(_h(F.col("conv_i")), F.lit(86_400))
        + offset_s
        - F.when(late & (F.col("turn_idx") > 0), F.lit(15)).otherwise(F.lit(0))
    )
    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts_s).alias("ts"),
    )


# ---------------------------------------------------------------------------
# transcript → property-graph binding
# ---------------------------------------------------------------------------

def _turn_props(prefix: str = "", use_arrow: bool = False) -> list[Column]:
    """Per-turn derived properties: tool, text_len (Arrow pandas UDF per the
    A+B axis), time-bucket (hour)."""
    text_c = F.col(f"{prefix}text")
    tl = pdf_text_len(text_c) if use_arrow else F.length(text_c)
    return [
        F.col(f"{prefix}tool").alias("tool"),
        tl.cast("string").alias("text_len"),
        F.date_format(F.col(f"{prefix}ts"), "yyyy-MM-dd HH").alias("hour_bucket"),
    ]


def transcript_vertices(t: DataFrame, use_arrow: bool = False) -> DataFrame:
    """vertex_id = conv_id:turn_idx, label = role (SURVEY.md §1.4)."""
    props = _turn_props(use_arrow=use_arrow)
    return t.select(
        F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string")).alias("vertex_id"),
        F.col("ts").alias("event_time"),
        F.col("role").alias("vertex_label"),
        F.map_from_arrays(
            F.array(F.lit("tool"), F.lit("text_len"), F.lit("hour_bucket")),
            F.array(*[p for p in props]),
        ).alias("vertex_properties"),
    )


def transcript_triples(t: DataFrame, use_arrow: bool = False) -> DataFrame:
    """Successor triples via a single pass: lead() over (conv_id, turn_idx).

    One analytic-window shuffle partitioned by conv_id; both endpoint turns
    ride along inline, so the grouping operator's joinless fast path applies.
    Batch form — the streaming form uses a watermarked self-join
    (streaming/binding.py).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = t.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
        F.lead("turn_idx").over(w).alias("n_turn_idx"),
        F.lead("role").over(w).alias("n_role"),
        F.lead("text").over(w).alias("n_text"),
        F.lead("tool").over(w).alias("n_tool"),
        F.lead("ts").over(w).alias("n_ts"),
    ).where(F.col("n_turn_idx").isNotNull())

    def vstruct(id_expr: Column, label: str, props: list[Column], ts_col: str) -> Column:
        return F.struct(
            id_expr.alias("vertex_id"),
            F.col(label).alias("vertex_label"),
            F.map_from_arrays(
                F.array(F.lit("tool"), F.lit("text_len"), F.lit("hour_bucket")),
                F.array(*props),
            ).alias("vertex_properties"),
            F.col(ts_col).alias("event_time"),
        )

    src_id = F.concat_ws(":", "conv_id", F.col("turn_idx").cast("string"))
    tgt_id = F.concat_ws(":", "conv_id", F.col("n_turn_idx").cast("string"))
    edge_props = F.map_from_arrays(
        F.array(F.lit("tool"), F.lit("text_len"), F.lit("hour_bucket"), F.lit("transition")),
        F.array(
            F.col("n_tool"),
            (pdf_text_len(F.col("n_text")) if use_arrow else F.length("n_text")).cast("string"),
            F.date_format(F.col("n_ts"), "yyyy-MM-dd HH"),
            F.concat_ws("->", "role", "n_role"),
        ),
    )
    return nxt.select(
        F.concat(src_id, F.lit("->"), F.col("n_turn_idx").cast("string")).alias("edge_id"),
        F.col("n_ts").alias("event_time"),
        F.concat_ws("->", "role", "n_role").alias("edge_label"),
        edge_props.alias("edge_properties"),
        vstruct(src_id, "role", _turn_props(use_arrow=use_arrow), "ts").alias("source"),
        vstruct(tgt_id, "n_role", _turn_props("n_", use_arrow=use_arrow), "n_ts").alias("target"),
    )


def transcript_graph_vertices(t: DataFrame, use_arrow: bool = False) -> DataFrame:
    """Vertex stream derived in ONE pass over the turns table: the set of
    triple endpoints = every turn of a conversation with ≥2 turns, each
    exactly once. Splitting the triple stream instead (Extractor-style,
    split_triples) would duplicate the whole upstream subplan per endpoint
    projection AND emit each interior turn twice — two full extra scans +
    a dedup shuffle at 100 TB. The count-over-conversation window rides the
    same conv_id exchange the successor lead() already needs."""
    w = Window.partitionBy("conv_id")
    return (
        t.withColumn("_conv_turns", F.count(F.lit(1)).over(w))
        .where(F.col("_conv_turns") >= 2)
        .transform(lambda d: transcript_vertices(d, use_arrow=use_arrow))
    )


def transcript_graph(
    t: DataFrame, config: StreamGraphConfig | None = None, use_arrow: bool = False
) -> StreamGraph:
    """Transcript turns → StreamGraph with the single-pass vertex stream,
    the triple stream for the joinless edge path, and the uniqueness hint
    that lets the grouping operator skip both dedup shuffles."""
    config = config or StreamGraphConfig()
    triples = transcript_triples(t, use_arrow=use_arrow)
    vertices = transcript_graph_vertices(t, use_arrow=use_arrow)
    edges = triples.select(
        "edge_id",
        "edge_label",
        "edge_properties",
        F.col("source.vertex_id").alias("source_id"),
        F.col("target.vertex_id").alias("target_id"),
        "event_time",
    )
    return StreamGraph(
        vertices=vertices, edges=edges, config=config, triples=triples, elements_unique=True
    )
