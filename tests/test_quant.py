"""Int8 scalar quantization — operators/quant.py."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.quant import int8_topk, quantize_embeddings


def test_quantize_values_and_bounds(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(emb).collect()}
    r1 = rows[1]
    # scale = 1.0/127; q = floor(x/scale + .5) → [127, -63, 32, 0]
    assert abs(r1.scale - 1.0 / 127) < 1e-12
    assert r1.qvec == [127, -63, 32, 0]
    # reconstruction error matches the closed form
    s = 1.0 / 127
    err2 = sum((x - q * s) ** 2 for x, q in zip([1.0, -0.5, 0.25, 0.0], r1.qvec))
    x2 = 1.0 + 0.25 + 0.0625
    assert r1.rel_err == round(math.sqrt(err2 / x2), 5)
    # zero vector: scale 0, all-zero codes, rel_err 0
    assert rows[2].scale == 0.0 and rows[2].qvec == [0, 0, 0, 0] and rows[2].rel_err == 0.0
    # codes always within int8 symmetric range
    corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qd = quantize_embeddings(corpus)
    mx = qd.select(
        F.max(F.array_max("qvec")).alias("hi"), F.min(F.array_min("qvec")).alias("lo")
    ).first()
    assert mx.hi <= 127 and mx.lo >= -127
    # relative reconstruction error of SQ8 on real vectors is sub-1%
    assert qd.agg(F.max("rel_err")).first()[0] < 0.01


def test_int8_topk_recall_is_near_exact(spark):
    """The point of SQ8: 4× memory for ~no recall loss. On the sf0.01
    corpus, int8 brute-force top-10 must reach recall@10 ≥ 0.95 vs the
    float exact baseline."""
    from graph_stream_zoomer_spark.operators.similarity import (
        brute_force_topk,
        mean_recall_at_k,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=10)
    qc = quantize_embeddings(emb).cache()
    approx = int8_topk(qc, qc.where(F.col("vec_id") < 10), k=10).select(
        "query_id", "neighbor_id", "rank"
    )
    rec = mean_recall_at_k(approx, exact, k=10)
    qc.unpersist()
    assert rec >= 0.95, rec
