"""Int8 scalar quantization for embedding columns — the memory-reduction
step that makes billion-vector ANN fit a cluster (4× smaller than float32,
8× smaller than float64; the IVF/LSH candidate structures in
operators/similarity.py work unchanged over the quantized form).
Beyond-reference addition (no graph-stream-zoomer counterpart),
SURVEY.md §2.10.

Symmetric per-vector scalar quantization (the FAISS SQ8 shape):
  scale = max|x| / 127;   q_i = clamp(floor(x_i/scale + 0.5), -127, 127)

Engine-portable by construction: the rounding is an explicit
``floor(x + 0.5)`` (identical in Spark and DuckDB — their native round()
functions disagree on halfway cases), the max|x| reduction is exact, and
int8 dot products are EXACT integer arithmetic, so quantized similarity
scores are bit-identical across engines and partitionings (score =
int_dot · scale_a · scale_b, one float multiply chain per pair).

Everything is a pure projection (quantize) or reuses the brute-force
broadcast-join shape (int8 top-k) — zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _scale_expr(vec: Column) -> Column:
    return F.array_max(F.transform(vec, lambda x: F.abs(x))).cast("double") / 127.0


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Per-vector int8 quantization: (id_col, scale, qvec array<int>,
    rel_err). ``rel_err`` is the relative L2 reconstruction error
    √(Σ(x−q·s)² / Σx²), rounded to 5 decimals — the quality gauge that
    belongs next to any lossy compression. Zero-vectors quantize to all
    zeros with scale 0 and rel_err 0."""
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    s = _scale_expr(F.col(vec_col))
    q = F.when(
        s > 0,
        F.transform(
            vec,
            lambda x: F.greatest(
                F.lit(-127),
                F.least(F.lit(127), F.floor(x / s + F.lit(0.5)).cast("int")),
            ),
        ),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
    out = (
        emb.select(id_col, vec_col)
        .withColumn("scale", s)
        .withColumn("qvec", q)
    )
    err2 = F.aggregate(
        F.zip_with(
            vec,
            F.col("qvec"),
            lambda x, qq: (x - qq * F.col("scale")) * (x - qq * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    x2 = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x)
    out = out.withColumn(
        "rel_err",
        F.when(x2 > 0, F.round(F.sqrt(err2 / x2), 5)).otherwise(F.lit(0.0)),
    )
    return out if keep_vec else out.drop(vec_col)


def int8_topk(
    corpus_q: DataFrame,
    queries_q: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    decimals: int = 6,
) -> DataFrame:
    """Exact top-k by quantized cosine over pre-quantized frames (outputs
    of quantize_embeddings): the dot product is EXACT integer arithmetic
    (bigint), scaled by the two per-vector scales and normalized by the
    exact integer norms. Broadcast query side, per-query rank window,
    deterministic tie-break — the same plan shape as brute_force_topk."""
    c = corpus_q.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("qvec").alias("cq"),
        F.col("scale").alias("cs"),
    )
    qs = queries_q.select(
        F.col(id_col).alias("query_id"),
        F.col("qvec").alias("qq"),
        F.col("scale").alias("qscale"),
    )
    joined = c.crossJoin(F.broadcast(qs)).where(
        F.col("neighbor_id") != F.col("query_id")
    )

    def idot(a: Column, b: Column) -> Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, e: acc + e,
        )

    num = idot(F.col("cq"), F.col("qq")).cast("double")
    den = F.sqrt(idot(F.col("cq"), F.col("cq")).cast("double")) * F.sqrt(
        idot(F.col("qq"), F.col("qq")).cast("double")
    )
    cos = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    scored = joined.select(
        "query_id", "neighbor_id", F.round(cos, decimals).alias("cosine_q")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_q"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "cosine_q")
    )
