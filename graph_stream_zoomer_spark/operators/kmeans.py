"""Distributed spherical k-means trainer (Lloyd's algorithm) for the IVF
ANN index.

The reference has no vector-index trainer (its ANN role is filled by this
repo's beyond-reference similarity family, SURVEY.md §2.10); `ivf_topk`
until now used a deterministic corpus *sample* as its coarse centroids.
This module trains those centroids properly: k-means over the
unit-normalized embedding corpus, assignment by cosine (spherical
k-means — the standard IVF coarse quantizer, cf. FAISS IVF / Spark MLlib
KMeans).

100 TB design — the tiny-model broadcast loop:
  * the MODEL (k × dim doubles, e.g. 16×64) lives on the driver and is
    re-embedded each round as literal arrays, exactly like `ivf_topk`'s
    centroid literals and Spark MLlib's broadcast centroid matrix;
  * the DATA-side work per round is ONE corpus scan + ONE
    map-side-combined groupBy emitting k×(dim+1) partial cells
    (`dim` codegen'd `avg` aggregates + a count — the simhash
    many-small-aggregates shape). No joins, no windows, no per-row
    Python on the oracle path;
  * rounds therefore cost O(scan + k·dim shuffle bytes) each, and the
    collect per round is ≤ k rows.

Oracle portability (see `_KMEANS_SQL` in ``__spark_entry__.py``):
centroid components are quantized to scaled integers
(round-half-away-from-zero of ``unit_component * 100000``) after init and
after every update, so both engines iterate on bit-identical double
literals (``ci / 100000.0``) and the final comma-joined integer rendering
is engine-portable (float→string rendering is not). Assignment similarity
is rounded to 5 decimals with a desc-cluster-id tie-break before the
argmax — the same round-before-rank rule the LSH/IVF oracles use.

The deployment-default assignment path (``reproducible=False``) is an
Arrow-batched numpy matmul (`_fast_assign_udf`) computing all k cosine
scores per batch — the `_fast_bucket_udf` lesson from the LSH family:
k×dim interpreted zip_with/aggregate HOFs per row lose to one BLAS call
by ~an order of magnitude. ``reproducible=True`` keeps the exact
Catalyst fold the SQL oracle replicates.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from graph_stream_zoomer_spark.operators.similarity import norm_expr

SCALE = 100_000


def _round_half_away(y: float) -> int:
    """Round half away from zero — matches DuckDB/C ``round`` and Spark
    ``F.round`` (HALF_UP), unlike Python's banker's ``round``."""
    return int(math.floor(abs(y) + 0.5)) * (1 if y >= 0 else -1)


def _quantize(xs: list[float]) -> list[int] | None:
    """Unit-normalize then scale to integers; None for a zero vector
    (caller keeps the previous centroid — mirrors the oracle's
    ``CASE WHEN nrm > 0`` + ``COALESCE`` fallback)."""
    nrm = math.sqrt(sum(x * x for x in xs))
    if nrm <= 0:
        return None
    return [_round_half_away(x / nrm * SCALE) for x in xs]


def _unit_col(vec_col: str) -> Column:
    v = F.col(vec_col).cast("array<double>")
    return F.transform(v, lambda x: x / F.col("_nrm"))


def _sim_structs(cents: list[tuple[int, list[int]]]) -> Column:
    """Array of (rounded cosine sim, cluster_id) structs against each
    centroid literal — termwise (x/nrm)*(ci/SCALE), the exact arithmetic
    the SQL oracle runs."""
    entries = []
    for cid, comps in cents:
        lit = F.array(*[F.lit(ci / SCALE) for ci in comps])
        dot = F.aggregate(
            F.zip_with(F.col("_u"), lit, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        entries.append(F.struct(F.round(dot, 5).alias("sim"), F.lit(cid).alias("cluster_id")))
    return F.array(*entries)


def assign_expr(cents: list[tuple[int, list[int]]]) -> Column:
    """Argmax cluster id over ``_u`` (the unit vector column): desc by
    rounded sim, ties broken by desc cluster_id (reverse of the ascending
    struct sort — the `ivf_topk` nearest-cells idiom)."""
    return F.reverse(F.array_sort(_sim_structs(cents)))[0]["cluster_id"]


def _fast_assign_udf(cents: list[tuple[int, list[int]]]):
    """Arrow-batched assignment: one numpy matmul per batch computes all k
    cosine scores. Centroids are ordered desc by id so numpy's
    first-max argmax reproduces the desc-cluster-id tie-break."""
    import numpy as np

    order = sorted(cents, key=lambda c: -c[0])
    C = np.array([[ci / SCALE for ci in comps] for _, comps in order], dtype=np.float64)
    ids = np.array([cid for cid, _ in order], dtype=np.int64)

    def fn(vs: pd.Series) -> pd.Series:
        V = np.stack(vs.to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        np.divide(V, nrm, out=V, where=nrm > 0)
        return pd.Series(ids[np.argmax(V @ C.T, axis=1)])

    return F.pandas_udf(LongType())(fn)


def _with_unit(corpus: DataFrame, vec_col: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return corpus.withColumn("_nrm", norm_expr(v)).withColumn("_u", _unit_col(vec_col))


def assign_clusters(
    corpus: DataFrame,
    cents: list[tuple[int, list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reproducible: bool = False,
) -> DataFrame:
    """(id, cluster_id) for every corpus row under a trained model — a
    pure projection (zero shuffle, zero joins)."""
    if reproducible:
        cl = assign_expr(cents)
        return _with_unit(corpus, vec_col).select(
            F.col(id_col), cl.alias("cluster_id")
        )
    udf = _fast_assign_udf(cents)
    return corpus.select(F.col(id_col), udf(F.col(vec_col)).alias("cluster_id"))


def train_kmeans(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reproducible: bool = False,
) -> list[tuple[int, list[int]]]:
    """Lloyd's loop: deterministic init (the `ivf_topk` smallest-hash
    sample — a distributed TakeOrderedAndProject), then ``n_iter`` rounds
    of assign (projection) + update (one map-side-combined groupBy with
    ``dim`` avg aggregates, collected as ≤ k rows). Returns the model as
    (cluster_id, scaled-int unit components); divide by ``SCALE`` for
    floats. Empty or zero-mean clusters keep their previous centroid."""
    order_key = (
        F.md5(F.col(id_col).cast("string")) if reproducible else F.xxhash64(F.col(id_col))
    )
    init_rows = (
        corpus.select(F.col(id_col).alias("cluster_id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(order_key)
        .limit(n_centroids)
        .collect()
    )
    cents: list[tuple[int, list[int]]] = []
    for r in init_rows:
        q = _quantize(list(r["v"]))
        if q is not None:  # a zero init vector cannot seed a direction
            cents.append((r["cluster_id"], q))
    if not cents:
        raise ValueError("k-means init found no non-zero vectors")
    dim = len(cents[0][1])

    base = _with_unit(corpus, vec_col)
    for _ in range(n_iter):
        if reproducible:
            assigned = base.select(assign_expr(cents).alias("cluster_id"), "_u")
        else:
            udf = _fast_assign_udf(cents)
            assigned = base.select(
                udf(F.col(vec_col)).alias("cluster_id"),
                "_u",
            )
        rows = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.avg(F.col("_u")[i]).alias(f"m{i}") for i in range(dim)],
            )
            .collect()
        )
        means = {r["cluster_id"]: [r[f"m{i}"] for i in range(dim)] for r in rows}
        cents = [
            (cid, (_quantize(means[cid]) if cid in means else None) or comps)
            for cid, comps in cents
        ]
    return cents


def kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reproducible: bool = False,
) -> DataFrame:
    """Train, then report the model with its final cluster occupancy:
    (cluster_id, n_members, centroid) where ``centroid`` is the
    comma-joined scaled-int unit components (engine-portable rendering)
    and ``n_members`` counts the final distributed assignment (an extra
    corpus pass — n_iter updates + 1 sizing pass total)."""
    cents = train_kmeans(
        corpus, n_centroids, n_iter, id_col, vec_col, reproducible=reproducible
    )
    counts = (
        assign_clusters(corpus, cents, id_col, vec_col, reproducible=reproducible)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    spark = corpus.sparkSession
    model = spark.createDataFrame(
        [(int(cid), ",".join(str(c) for c in comps)) for cid, comps in cents],
        "cluster_id bigint, centroid string",
    )
    return model.join(F.broadcast(counts), "cluster_id", "left").select(
        "cluster_id",
        F.coalesce(F.col("n_members"), F.lit(0)).cast("long").alias("n_members"),
        "centroid",
    )


def centroids_as_floats(cents: list[tuple[int, list[int]]]) -> list[tuple[int, list[float]]]:
    """Model in the (id, float components) form `ivf_topk(centroids=...)`
    accepts."""
    return [(cid, [c / SCALE for c in comps]) for cid, comps in cents]
