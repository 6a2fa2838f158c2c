"""Product quantization — operators/pq.py."""

from __future__ import annotations

import pytest

from graph_stream_zoomer_spark.operators.pq import (
    mean_reconstruction_error,
    pq_encode,
    sample_pq_codebooks,
    train_pq_codebooks,
)


def test_pq_exact_on_codebook_vectors(spark):
    """Vectors assembled FROM codebook entries must encode losslessly:
    known codes, rel_err 0."""
    books = [
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],  # subspace 0 (dims 1-2)
        [(0, [2.0, 2.0]), (1, [3.0, 3.0])],  # subspace 1 (dims 3-4)
    ]
    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 3.0, 3.0]),  # codes 0,1
            (2, [1.0, 1.0, 2.0, 2.0]),  # codes 1,0
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in pq_encode(emb, books).collect()}
    assert rows[1].codes == "0,1" and rows[1].rel_err == 0.0
    assert rows[2].codes == "1,0" and rows[2].rel_err == 0.0


def test_pq_training_beats_sampling(spark):
    """The point of Lloyd's: trained codebooks must reconstruct better
    than the md5 sample on the sf0.01 corpus."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    e_sampled = mean_reconstruction_error(pq_encode(emb, sample_pq_codebooks(emb, 64)))
    e_trained = mean_reconstruction_error(
        pq_encode(emb, train_pq_codebooks(emb, 64, n_iter=2))
    )
    assert e_trained < e_sampled, (e_trained, e_sampled)


def test_pq_guards(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="not divisible"):
        sample_pq_codebooks(emb, 64, m=7)
    with pytest.raises(ValueError, match="rows"):
        sample_pq_codebooks(emb.limit(3), 64, k=16)


def test_pq_arrow_path_is_bit_identical(spark):
    """The Arrow encoder must reproduce the Catalyst literal path exactly
    (codes AND rounded rel_err): sequential dim accumulation, half-up
    rounding, first-min tie-break."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books = sample_pq_codebooks(emb, 64)
    cat = sorted(map(tuple, pq_encode(emb, books).collect()))
    arr = sorted(map(tuple, pq_encode(emb, books, use_arrow=True).collect()))
    assert cat == arr and len(cat) == 500


def test_pq_adc_on_lossless_corpus(spark):
    """When the corpus encodes losslessly, ADC distance IS the exact
    squared L2 to the reconstruction — hand-checkable."""
    from graph_stream_zoomer_spark.operators.pq import pq_adc_topk

    books = [
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
        [(0, [2.0, 2.0]), (1, [3.0, 3.0])],
    ]
    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0, 3.0, 3.0]),
            (2, [1.0, 1.0, 2.0, 2.0]),
            (3, [0.0, 0.0, 2.0, 2.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r.query_id, r.neighbor_id): (r.rank, r.adc_dist)
        for r in pq_adc_topk(
            emb, [(1, [0.0, 0.0, 3.0, 3.0])], books, k=2, use_arrow_encode=False
        ).collect()
    }
    # d(q1, v3) = |(3,3)-(2,2)|^2 = 2; d(q1, v2) = 2*1 + 2*1 = 4
    assert out[(1, 3)] == (1, 2.0) and out[(1, 2)] == (2, 4.0)


def test_pq_adc_recall_floors(spark):
    """ADC search quality vs exact L2 on the adversarial random-vector
    corpus (the worst case for PQ — no cluster structure; real embedding
    corpora do substantially better): 8-byte codes (32× compression) must
    clear a 0.1 recall@10 floor with sampled codebooks, and training must
    strictly improve recall."""
    from pyspark.sql import functions as F

    from graph_stream_zoomer_spark.operators.pq import l2_topk, pq_adc_topk
    from graph_stream_zoomer_spark.operators.similarity import mean_recall_at_k

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = l2_topk(emb, emb.where(F.col("vec_id") < 10), k=10).select(
        "query_id", "neighbor_id", "rank"
    )
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 10).collect()
    ]
    r_sampled = mean_recall_at_k(
        pq_adc_topk(emb, queries, sample_pq_codebooks(emb, 64), k=10), exact, k=10
    )
    r_trained = mean_recall_at_k(
        pq_adc_topk(emb, queries, train_pq_codebooks(emb, 64, n_iter=3), k=10),
        exact,
        k=10,
    )
    assert r_sampled >= 0.1, r_sampled
    assert r_trained > r_sampled, (r_trained, r_sampled)


def test_ivfpq_candidates_respect_probes_and_recall(spark):
    """IVF-PQ: every returned neighbor must live in one of the query's
    probed cells, and the cell restriction (probing 4 of 16 cells) must
    not collapse recall vs full-scan ADC on the same codebooks."""
    from pyspark.sql import functions as F

    from graph_stream_zoomer_spark.operators.pq import (
        _argmin_struct,
        ivfpq_topk,
        l2_topk,
        sample_coarse_centroids,
    )
    from graph_stream_zoomer_spark.operators.similarity import mean_recall_at_k

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    coarse = sample_coarse_centroids(emb)
    books = sample_pq_codebooks(emb, 64)
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 10).collect()
    ]
    out = ivfpq_topk(emb, queries, coarse, books, k=10, n_probe=4)
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cells = {
        r.vec_id: r.cell
        for r in emb.select(
            "vec_id", _argmin_struct(vec, 0, coarse, 8)["j"].alias("cell")
        ).collect()
    }
    import math

    probe_sets = {}
    for qid, qv in queries:
        cd = []
        for cid, cv in coarse:
            acc = 0.0
            for a, b in zip(qv, cv):
                t = a - b
                acc = acc + t * t
            cd.append((math.floor(acc * 1e8 + 0.5) / 1e8, cid))
        probe_sets[qid] = {cid for _, cid in sorted(cd)[:4]}
    rows = out.collect()
    assert len(rows) > 0
    assert all(cells[r.neighbor_id] in probe_sets[r.query_id] for r in rows)
    exact = l2_topk(emb, emb.where(F.col("vec_id") < 10), k=10).select(
        "query_id", "neighbor_id", "rank"
    )
    assert mean_recall_at_k(out, exact, k=10) >= 0.1


def test_ivfpq_residual_trained_wins_on_clusters(spark):
    """Residual mode (FAISS by_residual) with TRAINED quantizers: on a
    clustered corpus, Lloyd-trained coarse + residual codebooks must
    recall well (≥ 0.35) while SAMPLED residual codebooks collapse
    (near-zero — a centroid-miss makes residual space noisier than raw;
    the same inversion shows on the structure-less random corpus, see
    BENCH.md). Pins the trade-off so it can't silently drift."""
    import numpy as np
    from pyspark.sql import functions as F

    from graph_stream_zoomer_spark.operators.pq import (
        ivfpq_topk,
        l2_topk,
        residual_frame,
        sample_coarse_centroids,
        train_pq_codebooks,
    )
    from graph_stream_zoomer_spark.operators.similarity import mean_recall_at_k

    rng = np.random.RandomState(42)
    centers = rng.randn(16, 64)
    pts = np.concatenate([c + 0.05 * rng.randn(20, 64) for c in centers]).astype(
        np.float32
    )
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id long, embedding array<float>",
    ).cache()
    emb.count()
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 10).collect()
    ]
    exact = l2_topk(emb, emb.where(F.col("vec_id") < 10), k=10).select(
        "query_id", "neighbor_id", "rank"
    )
    coarse_t = train_pq_codebooks(emb, 64, m=1, k=16, n_iter=3)[0]
    rf = residual_frame(emb, coarse_t)
    books_r = train_pq_codebooks(rf, 64, m=8, k=16, n_iter=2, vec_col="_resid")
    trained = mean_recall_at_k(
        ivfpq_topk(emb, queries, coarse_t, books_r, k=10, n_probe=4, by_residual=True),
        exact,
        k=10,
    )
    sampled = mean_recall_at_k(
        ivfpq_topk(
            emb,
            queries,
            sample_coarse_centroids(emb),
            k=10,
            n_probe=4,
            by_residual=True,
        ),
        exact,
        k=10,
    )
    emb.unpersist()
    assert trained >= 0.35, trained
    assert trained >= sampled + 0.2, (trained, sampled)


def test_ivfpq_arrow_assign_matches_literal(spark):
    """The Arrow cell-assignment twin (deployment default above
    _LITERAL_CELL_BUDGET model floats) must reproduce the Catalyst-literal
    fold's cells and therefore the identical IVF-PQ top-k on the same
    model — both non-residual and residual modes."""
    from pyspark.sql import functions as F

    from graph_stream_zoomer_spark.operators.pq import (
        ivfpq_topk,
        residual_frame,
        sample_coarse_centroids,
        sample_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    emb.count()
    coarse = sample_coarse_centroids(emb)
    books = sample_pq_codebooks(emb, 64)
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 5).collect()
    ]

    def rows(df):
        return [tuple(r) for r in df.orderBy("query_id", "rank").collect()]

    for by_res in (False, True):
        kw = dict(k=5, n_probe=4, by_residual=by_res)
        if not by_res:
            kw["codebooks"] = books
        lit = rows(ivfpq_topk(emb, queries, coarse, use_arrow_assign=False, **kw))
        arw = rows(ivfpq_topk(emb, queries, coarse, use_arrow_assign=True, **kw))
        assert lit == arw and lit, f"by_residual={by_res}"

    # residual_frame twin: identical (cell, resid) under both paths
    lit_rf = residual_frame(emb, coarse, use_arrow_assign=False)
    arw_rf = residual_frame(emb, coarse, use_arrow_assign=True)
    a = {r["vec_id"]: (r["_cell"], tuple(round(x, 9) for x in r["_resid"])) for r in lit_rf.collect()}
    b = {r["vec_id"]: (r["_cell"], tuple(round(x, 9) for x in r["_resid"])) for r in arw_rf.collect()}
    assert a == b
    emb.unpersist()


def test_residual_frame_arrow_tolerates_degraded_rows(spark):
    """The Arrow cell-assign twins must not crash on NULL / wrong-dimension
    embedding rows (np.stack over ragged input raised before this pin) —
    degraded rows come back with NULL cell/resid, matching the literal
    fold's NULL propagation."""
    from graph_stream_zoomer_spark.operators.pq import residual_frame

    rows = [(i, [float((i * 5 + j) % 7) + 1.0 for j in range(4)]) for i in range(12)]
    rows += [(100, None), (101, [1.0, 2.0])]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    coarse = [(i, c) for i, c in rows[:3]]

    out = {r["vec_id"]: r["_cell"] for r in residual_frame(emb, coarse, use_arrow_assign=True).collect()}
    assert out[100] is None and out[101] is None
    assert all(out[i] is not None for i in range(12))


def test_ivfpq_residual_single_assignment_pass(spark):
    """by_residual mode must reuse the residual frame's cell column instead
    of a second full coarse-assignment pass over the corpus: exactly one
    Arrow cell-assign evaluation in the plan (plus the encode UDF)."""
    from pyspark.sql import functions as F

    from graph_stream_zoomer_spark.operators.pq import ivfpq_topk, sample_coarse_centroids

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    coarse = sample_coarse_centroids(emb)
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in emb.where(F.col("vec_id") < 2).collect()
    ]
    df = ivfpq_topk(emb, queries, coarse, k=5, by_residual=True, use_arrow_assign=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_arrow = plan.count("ArrowEvalPython")
    assert n_arrow <= 2, f"expected cell-assign + encode only, got {n_arrow} ArrowEvalPython nodes"
    assert df.count() > 0


def test_ivfpq_dataframe_queries_match_list_path(spark):
    """Batch query side: passing queries as a DataFrame (LUTs built in an
    Arrow mapInPandas pass) must produce BIT-IDENTICAL top-k to the
    driver-list path — the probe UDF replays the driver loop's sequential
    accumulation order exactly. Both non-residual and residual modes."""
    from pyspark.sql import functions as F

    from graph_stream_zoomer_spark.operators.pq import (
        ivfpq_topk,
        sample_coarse_centroids,
        sample_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    emb.count()
    coarse = sample_coarse_centroids(emb)
    books = sample_pq_codebooks(emb, 64)
    qdf = emb.where(F.col("vec_id") < 8)
    qlist = [
        (r["vec_id"], [float(x) for x in r["embedding"]]) for r in qdf.collect()
    ]

    def rows(df):
        return [tuple(r) for r in df.orderBy("query_id", "rank").collect()]

    for by_res in (False, True):
        kw = dict(k=5, n_probe=4, by_residual=by_res)
        if not by_res:
            kw["codebooks"] = books
        lst = rows(ivfpq_topk(emb, qlist, coarse, **kw))
        bat = rows(ivfpq_topk(emb, qdf, coarse, **kw))
        assert lst == bat and lst, f"by_residual={by_res}"
    emb.unpersist()


def test_ivfpq_empty_coarse_raises(spark):
    from graph_stream_zoomer_spark.operators.pq import ivfpq_topk, residual_frame

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    with pytest.raises(ValueError, match="coarse must be non-empty"):
        ivfpq_topk(emb, [], [], k=3)
    with pytest.raises(ValueError, match="coarse must be non-empty"):
        residual_frame(emb, [])
