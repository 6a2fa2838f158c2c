"""Product quantization (PQ) — the last piece of the FAISS-style ANN
compression stack (SQ8 in operators/quant.py, IVF + hyperplane LSH in
operators/similarity.py, the coarse trainer in operators/kmeans.py).
Beyond-reference addition (no graph-stream-zoomer counterpart),
SURVEY.md §2.10; algorithm: Jégou et al., "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011).

A dim-D vector splits into ``m`` contiguous subvectors of D/m dims; each
subspace gets its own k-entry codebook, and a vector encodes as m small
integers — e.g. 64 float32 dims (256 B) → 8 codes (8 B) at m=8, k=16.

Codebooks come from either:
  - ``sample_pq_codebooks``: k corpus rows picked by smallest md5(id)
    (the IVF `reproducible` sampling precedent — a distributed
    TakeOrderedAndProject, no training), sliced per subspace. Fully
    SQL-reconstructible, so ``pq_encode`` over sampled codebooks is
    oracle-checkable end-to-end.
  - ``train_pq_codebooks``: per-subspace Lloyd's via the existing
    distributed k-means trainer (operators/kmeans.py) — m tiny training
    loops over sliced views of ONE corpus scan each round. The quality
    path; its reconstruction-error win over sampling is floor-pinned in
    tests/test_pq.py.

Encoding is a pure zero-shuffle projection: the m×k codebook rides the
plan as literals (tiny-model broadcast), each subspace distance is a
chain of squared terms in FIXED dim order, and the argmin ranks on the
(round(dist, 8), code) pair — float determinism discipline throughout,
so codes AND the relative reconstruction error hash-match a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Codebooks = list[list[tuple[int, list[float]]]]  # [subspace][(code_id, centroid)]


def _split_dims(dim: int, m: int) -> list[tuple[int, int]]:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d = dim // m
    return [(s * d, d) for s in range(m)]


def sample_pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Codebook j (per subspace) = subvector of the corpus row with the
    j-th smallest md5(id) — deterministic, engine-portable, collect ≤ k
    rows (TakeOrderedAndProject)."""
    rows = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"corpus has only {len(rows)} rows < k={k}")
    return [
        [(j, list(r["v"][lo : lo + d])) for j, r in enumerate(rows)]
        for lo, d in _split_dims(dim, m)
    ]


def _argmin_struct(vec: Column, lo: int, book: list[tuple[int, list[float]]], decimals: int) -> Column:
    """(round(dist), code, raw dist) for the nearest codebook entry —
    distances chained in fixed dim order; struct ordering never reaches
    the raw field because the code is unique."""
    cands = []
    for j, comps in book:
        dist: Column = F.lit(0.0)
        for i, c in enumerate(comps):
            term = F.element_at(vec, lo + i + 1) - F.lit(float(c))
            dist = dist + term * term
        cands.append(
            F.struct(
                F.round(dist, decimals).alias("d"),
                F.lit(j).alias("j"),
                dist.alias("raw"),
            )
        )
    return F.array_min(F.array(*cands))


def train_pq_codebooks(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Per-subspace EUCLIDEAN Lloyd's (PQ minimizes L2 reconstruction —
    the spherical trainer in operators/kmeans.py optimizes cosine and its
    unit-normalized centroids would be wrong here). Init = the md5 sample;
    each round per subspace is ONE scan + ONE map-side-combinable groupBy
    of d avg-aggregates, collect ≤ k rows (tiny-model broadcast loop).
    Empty clusters keep their previous centroid."""
    books = sample_pq_codebooks(emb, dim, m=m, k=k, id_col=id_col, vec_col=vec_col)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    for s, (lo, d) in enumerate(_split_dims(dim, m)):
        book = books[s]
        for _ in range(n_iter):
            code = _argmin_struct(vec, lo, book, 8)["j"]
            upd = (
                emb.select(
                    code.alias("_code"),
                    *[
                        F.element_at(vec, lo + i + 1).alias(f"_x{i}")
                        for i in range(d)
                    ],
                )
                .groupBy("_code")
                .agg(*[F.avg(f"_x{i}").alias(f"_m{i}") for i in range(d)])
                .collect()
            )
            new = {r["_code"]: [float(r[f"_m{i}"]) for i in range(d)] for r in upd}
            book = [(j, new.get(j, comps)) for j, comps in book]
        books[s] = book
    return books


def pq_encode(
    emb: DataFrame,
    codebooks: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 8,
    use_arrow: bool = False,
) -> DataFrame:
    """Encode each vector as m codebook indices + the relative L2
    reconstruction error √(Σ_s dist_s / Σx²) (round 5). Zero shuffle;
    argmin per subspace ranks on (round(dist, decimals), code) so ties
    break identically in any engine.

    ``use_arrow=True`` is the deployment path: the Catalyst literal form
    builds an m·k·d-term expression whose analysis/codegen cost is ~20 s
    flat regardless of data size; the Arrow twin does the same math in
    numpy — BIT-IDENTICAL, because distances accumulate sequentially
    over dims (not np.sum's pairwise order), rounding is explicit
    floor(x·10^p + 0.5) (numpy's round is half-even, Spark's is
    half-up), and argmin tie-breaks on the smaller code like the struct
    ordering. Parity is pinned by tests/test_pq.py."""
    if use_arrow:
        return _pq_encode_arrow(emb, codebooks, id_col, vec_col, decimals)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    m = len(codebooks)
    dim = sum(1 for _ in codebooks[0][0][1]) * m
    per_sub = [
        _argmin_struct(vec, lo, codebooks[s], decimals).alias(f"_c{s}")
        for s, (lo, _d) in enumerate(_split_dims(dim, m))
    ]
    out = emb.select(id_col, vec.alias("_v"), *per_sub)
    err2: Column = F.lit(0.0)
    for s in range(m):
        err2 = err2 + F.col(f"_c{s}")["raw"]
    x2 = F.aggregate(F.col("_v"), F.lit(0.0), lambda acc, x: acc + x * x)
    return out.select(
        id_col,
        F.concat_ws(
            ",", *[F.col(f"_c{s}")["j"].cast("string") for s in range(m)]
        ).alias("codes"),
        F.when(x2 > 0, F.round(F.sqrt(err2 / x2), 5))
        .otherwise(F.lit(0.0))
        .alias("rel_err"),
    )


def _pq_encode_arrow(
    emb: DataFrame,
    codebooks: Codebooks,
    id_col: str,
    vec_col: str,
    decimals: int,
) -> DataFrame:
    import numpy as np

    m = len(codebooks)
    d = len(codebooks[0][0][1])
    dim = m * d
    # [m][k][d] float64 — broadcast with the plan (tiny model)
    books = [
        np.array([comps for _, comps in book], dtype=np.float64)
        for book in codebooks
    ]
    id_field = emb.schema[id_col]
    scale_d = 10.0**decimals

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = x.shape[0]
            codes = np.empty((n, m), dtype=np.int64)
            err2 = np.zeros(n, dtype=np.float64)
            for s in range(m):
                xs = x[:, s * d : (s + 1) * d]
                cb = books[s]
                dist = np.zeros((n, cb.shape[0]), dtype=np.float64)
                for i in range(d):  # sequential over dims ≡ the chained adds
                    t = xs[:, i, None] - cb[None, :, i]
                    dist += t * t
                rounded = np.floor(dist * scale_d + 0.5) / scale_d  # half-up
                c = np.argmin(rounded, axis=1)  # first min ≡ smaller-code tie-break
                codes[:, s] = c
                err2 += dist[np.arange(n), c]
            x2 = np.zeros(n, dtype=np.float64)
            for i in range(dim):  # sequential ≡ F.aggregate fold order
                x2 += x[:, i] * x[:, i]
            rel = np.where(
                x2 > 0, np.floor(np.sqrt(err2 / np.where(x2 > 0, x2, 1.0)) * 1e5 + 0.5) / 1e5, 0.0
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": [",".join(map(str, row)) for row in codes],
                    "rel_err": rel,
                }
            )

    schema = f"{id_col} {id_field.dataType.simpleString()}, codes string, rel_err double"
    return emb.select(id_col, vec_col).mapInPandas(run, schema)


def pq_adc_topk(
    corpus: DataFrame,
    queries: list[tuple[int, list[float]]],
    codebooks: Codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    use_arrow_encode: bool = True,
) -> DataFrame:
    """Asymmetric distance computation (ADC) top-k — the search side of
    PQ: the corpus is its 8-byte codes, each query stays float and turns
    into an m×k lookup table of exact subspace distances (built
    driver-side — m·k·d flops per query — and shipped as a literal array
    per query row). Per corpus row, distance = Σ_s LUT[s][code_s]: one
    broadcast cross join + a fold over m lookups, zero Python on the
    corpus side after encoding, rank on (round(dist), neighbor id).

    ``queries``: (query_id, full-dim vector) pairs — a handful of rows;
    broadcast by construction."""
    m = len(codebooks)
    kk = len(codebooks[0])
    spark = corpus.sparkSession
    q_rows = []
    for qid, qv in queries:
        lut: list[float] = []
        for s, (lo, d) in enumerate(_split_dims(len(qv), m)):
            for _, comps in codebooks[s]:
                acc = 0.0
                for i in range(d):
                    t = float(qv[lo + i]) - float(comps[i])
                    acc = acc + t * t
                lut.append(acc)
        q_rows.append((qid, lut))
    qdf = spark.createDataFrame(q_rows, f"query_id bigint, lut array<double>")
    enc = pq_encode(
        corpus, codebooks, id_col=id_col, vec_col=vec_col, use_arrow=use_arrow_encode
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.split("codes", ","), lambda c: c.cast("int")).alias("carr"),
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.col("lut"), s * kk + F.element_at(F.col("carr"), s + 1) + 1
        ),
    )
    scored = enc.crossJoin(F.broadcast(qdf)).where(
        F.col("neighbor_id") != F.col("query_id")
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.select(
            "query_id", "neighbor_id", F.round(dist, decimals).alias("adc_dist")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "adc_dist",
        )
    )


def l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Exact squared-L2 top-k (broadcast query side, round-then-rank with
    id tie-break) — the ground truth ADC recall is measured against
    (brute_force_topk in operators/similarity.py ranks by cosine, a
    different metric)."""
    from pyspark.sql.window import Window

    vec = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
    c = corpus.select(F.col(id_col).alias("neighbor_id"), vec(vec_col).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"), vec(vec_col).alias("qv"))
    d2 = F.aggregate(
        F.zip_with(F.col("cv"), F.col("qv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(d2, decimals).alias("l2sq"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("l2sq"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "l2sq")
    )


def sample_coarse_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
) -> list[tuple[int, list[float]]]:
    """Coarse quantizer = the n_centroids corpus rows with smallest
    md5(id), full-dim (the IVF `reproducible` sampling precedent);
    centroid ids are the md5 rank."""
    rows = (
        emb.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_centroids)
        .collect()
    )
    return [(j, list(r["v"])) for j, r in enumerate(rows)]


def _half_up8(x: float) -> float:
    import math

    return math.floor(x * 1e8 + 0.5) / 1e8


def _nearest_cell_py(qv: list[float], coarse: list[tuple[int, list[float]]]) -> list[tuple[float, int]]:
    """(round-8 L2², cid) pairs sorted like the corpus-side argmin —
    explicit half-up (Python round is banker's; Spark/DuckDB round are
    half-up for positive values)."""
    cd = []
    for cid, cv in coarse:
        acc = 0.0
        for a, b in zip(qv, cv):
            t = float(a) - float(b)
            acc = acc + t * t
        cd.append((_half_up8(acc), cid))
    return sorted(cd)


def _fast_cell_resid_udf(coarse: list[tuple[int, list[float]]]):
    """Arrow twin of residual_frame's literal path: one batch matmul-free
    termwise L2 assignment (same round-8 + asc-id tie as _argmin_struct)
    plus the residual subtraction, returning (cell, resid) in one pass —
    the coarse model (potentially 4k×768 floats) rides the closure, never
    the plan."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    order = sorted(coarse, key=lambda c: c[0])
    C = np.array([comps for _, comps in order], dtype=np.float64)
    ids = np.array([cid for cid, _ in order], dtype=np.int64)
    by_id = {cid: np.asarray(comps, dtype=np.float64) for cid, comps in coarse}

    schema = StructType(
        [
            StructField("cell", IntegerType()),
            StructField("resid", ArrayType(DoubleType())),
        ]
    )

    def fn(vs):  # pd.Series -> pd.DataFrame (no hints: pandas not module-global)
        import numpy as np
        import pandas as pd

        arrs = vs.to_numpy()
        valid = np.fromiter(
            (a is not None and len(a) == C.shape[1] for a in arrs),
            dtype=bool,
            count=len(arrs),
        )
        cell_out: list = [None] * len(arrs)
        resid_out: list = [None] * len(arrs)
        vi = np.flatnonzero(valid)
        if len(vi):
            V = np.stack([np.asarray(arrs[i], dtype=np.float64) for i in vi])
            # half-up round-8 like _argmin_struct / _half_up8 (np.round is
            # banker's and would tie-break differently at a .5 boundary);
            # squared distances are non-negative so floor(x*1e8+0.5) is safe
            D = np.floor(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) * 1e8 + 0.5) / 1e8
            cell_ids = ids[np.argmin(D, axis=1)]
            resid = V - np.stack([by_id[int(c)] for c in cell_ids])
            for j, i in enumerate(vi):
                cell_out[i] = int(cell_ids[j])
                resid_out[i] = list(resid[j])
        return pd.DataFrame(
            {"cell": pd.array(cell_out, dtype="Int32"), "resid": resid_out}
        )

    return F.pandas_udf(schema)(fn)


def residual_frame(
    corpus: DataFrame,
    coarse: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_arrow_assign: bool | None = None,
) -> DataFrame:
    """(id, vec, _cell, _resid): each row's coarse cell and residual
    (x − centroid[cell]) — the training/encoding input for residual PQ
    (train residual codebooks with ``train_pq_codebooks(residual_frame(
    ...), dim, vec_col="_resid")``).

    ``use_arrow_assign=None`` auto-selects: the Catalyst-literal fold under
    _LITERAL_CELL_BUDGET total floats (oracle-exact), the Arrow closure
    twin above it (flat driver compile at production quantizer sizes)."""
    if not coarse:
        raise ValueError("coarse must be non-empty")
    if use_arrow_assign is None:
        use_arrow_assign = len(coarse) * len(coarse[0][1]) > _LITERAL_CELL_BUDGET
    if use_arrow_assign:
        st = _fast_cell_resid_udf(coarse)(F.col(vec_col))
        return (
            corpus.select(F.col(id_col), F.col(vec_col), st.alias("_st"))
            .withColumn("_cell", F.col("_st")["cell"])
            .withColumn("_resid", F.col("_st")["resid"])
            .drop("_st")
        )
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cell = _argmin_struct(vec, 0, coarse, 8)["j"]
    cent_arr = F.array(
        *[F.array(*[F.lit(float(c)) for c in comps]) for _, comps in coarse]
    )
    resid = F.zip_with(
        F.transform(F.col(vec_col), lambda x: x.cast("double")),
        F.element_at(cent_arr, F.col("_cell") + 1),
        lambda a, b: a - b,
    )
    # materialization boundary: without it Catalyst collapses the
    # projection and inlines the 1024-term cell-argmin into every one of
    # the 64 zip_with lanes of the residual (≈65k-term codegen → driver
    # OOM). localCheckpoint truncates the plan at _cell.
    return (
        corpus.select(F.col(id_col), F.col(vec_col), cell.alias("_cell"))
        .localCheckpoint(eager=False)
        .withColumn("_resid", resid)
    )


def _fast_cell_udf(coarse: list[tuple[int, list[float]]]):
    """Arrow-batched L2 cell assignment — the scale twin of
    ``_argmin_struct(vec, 0, coarse, 8)["j"]``: termwise (x−c)² sums,
    rounded to 8 decimals, argmin with ties to the smallest centroid id
    (centroids pre-sorted ASC by id + numpy first-min argmin). The coarse
    model rides the UDF closure, not the plan — driver compile stays flat
    as n_centroids grows. Not bit-identical to the Catalyst fold on the
    last ulp (numpy pairwise summation), which the round-8 absorbs except
    exactly at a rounding boundary — the oracle row therefore pins the
    literal path via use_arrow_assign=False."""
    import numpy as np
    from pyspark.sql.types import IntegerType

    order = sorted(coarse, key=lambda c: c[0])
    C = np.array([comps for _, comps in order], dtype=np.float64)
    ids = np.array([cid for cid, _ in order], dtype=np.int64)

    def fn(vs):  # pd.Series -> pd.Series (no hints: pandas not module-global)
        import numpy as np
        import pandas as pd

        arrs = vs.to_numpy()
        valid = np.fromiter(
            (a is not None and len(a) == C.shape[1] for a in arrs),
            dtype=bool,
            count=len(arrs),
        )
        out: list = [None] * len(arrs)
        vi = np.flatnonzero(valid)
        if len(vi):
            V = np.stack([np.asarray(arrs[i], dtype=np.float64) for i in vi])
            # termwise like the literal fold: dist[n, c] = Σ_i (V[n,i]-C[c,i])²
            # half-up round-8 like _argmin_struct / _half_up8 (np.round is
            # banker's and would tie-break differently at a .5 boundary)
            D = np.floor(((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2) * 1e8 + 0.5) / 1e8
            picks = ids[np.argmin(D, axis=1)]
            for j, i in enumerate(vi):
                out[i] = int(picks[j])
        return pd.Series(pd.array(out, dtype="Int32"))

    return F.pandas_udf(IntegerType())(fn)


# Same budget rationale as similarity._LITERAL_PROBE_BUDGET: above this
# many total floats the coarse model stops being a Catalyst literal.
_LITERAL_CELL_BUDGET = 2048


def _batch_probe_frame(
    queries: DataFrame,
    coarse: list[tuple[int, list[float]]],
    codebooks: Codebooks,
    n_probe: int,
    by_residual: bool,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(query_id, cell, lut) probe frame built INSIDE an Arrow mapInPandas
    pass over a queries DataFrame — the batch-scale twin of ivfpq_topk's
    driver loop (which is O(n_queries × n_probe × m × k) Python on the
    driver plus a createDataFrame of literal LUT rows: right for ≤10³
    interactive queries, wrong for a 10⁶-query re-ranking job). The
    coarse/codebook model rides the UDF closure; driver work and plan size
    stay flat in n_queries.

    BIT-IDENTICAL to the driver loop: every accumulation runs sequentially
    over the dim/subspace terms (vectorized across rows only), matching
    ``acc = acc + t*t`` order, and cell ranking applies the same half-up
    round-8 + ascending-cid tie (_nearest_cell_py). So list-path and
    DataFrame-path results hash-match exactly (pinned in tests/test_pq.py).
    """
    import numpy as np

    dim = len(coarse[0][1])
    cids = np.array([cid for cid, _ in coarse], dtype=np.int64)
    C = np.array([cv for _, cv in coarse], dtype=np.float64)  # [n_cent, dim]
    subs = _split_dims(dim, len(codebooks))
    books = [
        np.array([comps for _, comps in cb], dtype=np.float64) for cb in codebooks
    ]  # per subspace: [k, d]

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            out_q, out_c, out_l = [], [], []
            for qid, qv in zip(pdf[id_col], pdf[vec_col]):
                v = np.asarray(list(qv), dtype=np.float64)
                # sequential-over-dim L2² to each centroid (driver order)
                acc = np.zeros(len(C), dtype=np.float64)
                for i in range(dim):
                    t = v[i] - C[:, i]
                    acc = acc + t * t
                cd = np.floor(acc * 1e8 + 0.5) / 1e8  # _half_up8
                order = np.lexsort((cids, cd))[:n_probe]
                for ci in order:
                    base = v - C[ci] if by_residual else v
                    lut = np.empty(0, dtype=np.float64)
                    for s, (lo, d) in enumerate(subs):
                        B = books[s]  # [k, d]
                        a = np.zeros(len(B), dtype=np.float64)
                        for i in range(d):
                            t = base[lo + i] - B[:, i]
                            a = a + t * t
                        lut = np.concatenate([lut, a])
                    out_q.append(int(qid))
                    out_c.append(int(cids[ci]))
                    out_l.append(list(lut))
            yield pd.DataFrame(
                {"query_id": out_q, "cell": out_c, "lut": out_l}
            )

    return queries.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        gen, "query_id bigint, cell int, lut array<double>"
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame | list[tuple[int, list[float]]],
    coarse: list[tuple[int, list[float]]],
    codebooks: Codebooks | None = None,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
    use_arrow_encode: bool = True,
    by_residual: bool = False,
    pq_k: int = 16,
    pq_m: int = 8,
    use_arrow_assign: bool | None = None,
) -> DataFrame:
    """IVF-PQ composed index (FAISS IndexIVFPQ shape): corpus rows land in
    their L2-nearest coarse cell ((round-8 dist, cell) argmin — zero
    shuffle, centroid literals), each query probes its ``n_probe``
    nearest cells (driver-side exact arithmetic over the tiny coarse
    model), and only candidates in probed cells get the ADC distance.
    ``queries`` is either a small driver list (interactive path: LUTs
    built in a driver loop, probe frame broadcast) or a DataFrame with
    (id_col, vec_col) columns (batch path: LUTs built inside an Arrow
    mapInPandas pass, bit-identical to the driver loop, flat driver time
    at 10⁶ queries — the probe/cell join is left to AQE). At 100 TB the
    corpus side can additionally be PARTITIONED/bucketed by cell so a
    probe touches n_probe/n_centroids of the data.

    ``by_residual=False``: codes are global-codebook PQ of the raw
    vectors (``codebooks`` required) — one LUT per query, fully
    SQL-oracle-checked (__spark_entry__.q_ann_ivfpq_topk).
    ``by_residual=True`` (the FAISS default): vectors encode as PQ of
    (x − centroid[cell]); codebooks are md5-sampled from RESIDUAL space
    and each query builds one LUT per probed cell — n_probe× the LUT
    work for finer distances (recall win pinned in tests/test_pq.py)."""
    if not coarse:
        raise ValueError("coarse must be non-empty")
    dim = len(coarse[0][1])
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if use_arrow_assign is None:
        use_arrow_assign = len(coarse) * dim > _LITERAL_CELL_BUDGET
    spark = corpus.sparkSession

    if by_residual:
        rframe = residual_frame(
            corpus,
            coarse,
            id_col=id_col,
            vec_col=vec_col,
            use_arrow_assign=use_arrow_assign,
        )
        # the residual frame already carries each row's coarse cell —
        # reuse it instead of a second full O(N × n_centroids × dim)
        # assignment pass over the corpus (the dominant stage at a
        # production-size quantizer). The lazy checkpoint makes the reuse
        # PHYSICAL: cells and enc below sit on the two sides of a
        # self-join, and without the boundary Catalyst duplicates the
        # assignment subtree into both branches (no cross-branch CSE).
        rframe = rframe.localCheckpoint(eager=False)
        cells = rframe.select(
            F.col(id_col).alias("neighbor_id"), F.col("_cell").cast("int").alias("cell")
        )
        if codebooks is None:
            # sampled residual codebooks: md5-sampled rows' residuals
            # (driver-exact). Skip the first n_centroids rows of the md5
            # order — those ARE the coarse centroids (when coarse came
            # from sample_coarse_centroids), and a centroid's own residual
            # is the zero vector, which would collapse every codebook
            # entry to ~0. NOTE: sampling in residual space is weak when
            # the coarse quantizer misses the data's structure — prefer
            # train_pq_codebooks over the residual frame (see
            # tests/test_pq.py::test_ivfpq_residual_trained_wins_on_clusters).
            n_skip = len(coarse)
            samp = (
                corpus.select(
                    F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
                )
                .orderBy(F.md5(F.col(id_col).cast("string")))
                .limit(n_skip + pq_k)
                .collect()
            )[n_skip:]
            if len(samp) < pq_k:
                raise ValueError(
                    f"corpus has only {len(samp)} rows < pq_k={pq_k} after skip"
                )
            sub = _split_dims(dim, pq_m)
            res_samp = []
            for r in samp:
                v = list(r["v"])
                cid = _nearest_cell_py(v, coarse)[0][1]
                cv = dict(coarse)[cid]
                res_samp.append([a - b for a, b in zip(v, cv)])
            codebooks = [
                [(j, rv[lo : lo + d]) for j, rv in enumerate(res_samp)]
                for lo, d in sub
            ]
        # else: caller supplied RESIDUAL-space codebooks (e.g. trained via
        # train_pq_codebooks over residual_frame(...))
        enc = pq_encode(
            rframe, codebooks, id_col=id_col, vec_col="_resid", use_arrow=use_arrow_encode
        ).select(
            F.col(id_col).alias("neighbor_id"),
            F.transform(F.split("codes", ","), lambda c: c.cast("int")).alias("carr"),
        )
    else:
        if codebooks is None:
            raise ValueError("codebooks required when by_residual=False")
        if use_arrow_assign:
            cell = _fast_cell_udf(coarse)(F.col(vec_col))
        else:
            cell = _argmin_struct(vec, 0, coarse, 8)["j"]
        cells = corpus.select(F.col(id_col).alias("neighbor_id"), cell.alias("cell"))
        enc = pq_encode(
            corpus, codebooks, id_col=id_col, vec_col=vec_col, use_arrow=use_arrow_encode
        ).select(
            F.col(id_col).alias("neighbor_id"),
            F.transform(F.split("codes", ","), lambda c: c.cast("int")).alias("carr"),
        )

    m, kk = len(codebooks), len(codebooks[0])
    if isinstance(queries, DataFrame):
        # batch query side: LUTs built in an Arrow pass over the queries
        # frame (bit-identical to the driver loop below — see
        # _batch_probe_frame); no broadcast hint — the probe side is
        # n_queries×n_probe LUT rows, potentially huge, so the cell join is
        # left to AQE (broadcast when small, shuffle otherwise; at
        # production scale bucket/partition the corpus by cell so a probe
        # touches n_probe/n_centroids of the data)
        probes = _batch_probe_frame(
            queries, coarse, codebooks, n_probe, by_residual, id_col, vec_col
        )
        probed = cells.join(probes, "cell")
    else:
        cent_by_id = dict(coarse)
        probe_rows = []
        for qid, qv in queries:
            for _, cid in _nearest_cell_py(qv, coarse)[:n_probe]:
                base = (
                    [a - b for a, b in zip(qv, cent_by_id[cid])] if by_residual else qv
                )
                lut: list[float] = []
                for s, (lo, d) in enumerate(_split_dims(dim, m)):
                    for _, comps in codebooks[s]:
                        acc = 0.0
                        for i in range(d):
                            t = float(base[lo + i]) - float(comps[i])
                            acc = acc + t * t
                        lut.append(acc)
                probe_rows.append((qid, cid, lut))
        probes = spark.createDataFrame(
            probe_rows, "query_id bigint, cell int, lut array<double>"
        )
        probed = cells.join(F.broadcast(probes), "cell")
    cand = probed.join(enc, "neighbor_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(F.col("lut"), s * kk + F.element_at(F.col("carr"), s + 1) + 1),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    return (
        cand.select("query_id", "neighbor_id", F.round(dist, decimals).alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("bigint").alias("rank"),
            "adc_dist",
        )
    )


def mean_reconstruction_error(encoded: DataFrame) -> float:
    """Corpus-mean relative reconstruction error of a pq_encode output —
    the codebook-quality gauge (lower is better)."""
    return float(encoded.agg(F.round(F.avg("rel_err"), 6)).first()[0])
