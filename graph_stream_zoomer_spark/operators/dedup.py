"""Deduplication operators over a documents table — the training-data
pipeline additions (no reference equivalent; designed for 100 TB corpora).

Scale notes (what survives a 1000-executor run):
  - Exact/fingerprint dedup: one hash-groupBy; partial aggregation combines
    map-side, so hot duplicate clusters don't skew the shuffle.
  - MinHash+LSH: per-doc signatures are computed in one projection (no
    shuffle), the only shuffle is the band-bucket groupBy; candidate
    verification joins only within buckets, never all-pairs.
  - n-gram Jaccard: inverted-index join (explode shingles → join on
    shingle) — O(total postings), not O(n²); common-shingle counting is an
    aggregate, and hot shingles can be dropped by document frequency like a
    stopword list (``max_shingle_df``).
  - Hash choice: the cross-engine-reproducible variants use md5 (available
    in DuckDB for the oracle harness); the fast path uses xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread(df: DataFrame, already_parallel: bool | None = None) -> DataFrame:
    """Repartition a (small, pre-explode) doc table to the session's
    parallelism: doc corpora often arrive as a handful of files, and the
    explode-heavy operators below would otherwise run the entire
    shingle/token fan-out on one core. The shuffle moves only the compact
    pre-explode rows — and is skipped entirely when the input is already
    parallel (a 100 TB corpus arrives with thousands of splits; repartition
    there would be a wasted full-corpus shuffle).

    Parallelism is probed WITHOUT ``df.rdd`` (which forces a plan→RDD
    conversion per call): callers that know pass ``already_parallel``
    explicitly; otherwise the leaf input-file count stands in for the split
    count. File count only *under*-estimates splits (large files are split
    further by maxPartitionBytes), so the probe errs toward a repartition of
    an input that is by definition small."""
    if already_parallel is True:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if already_parallel is None:
        try:
            if len(df.inputFiles()) >= target:
                return df
        except Exception:
            pass  # non-file source — fall through to repartition
    return df.repartition(target)


def normalized_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text.

    Built as ``arrays_zip`` of ``n`` shifted ``slice``s of the token array
    + one ``transform`` over the zipped structs: the token array (and the
    regex normalization feeding it) is evaluated O(n) times per ROW.
    The earlier per-index formulation (``transform(sequence(...), i ->
    concat_ws(get(toks, i), ...))``) re-evaluated the full
    regex+split chain inside every ``F.get`` — higher-order-function
    lambdas are interpreted with no common-subexpression elimination, so
    shingling cost was O(n·words) normalizations per doc (~10× slower
    end-to-end, measured at sf0.1). Tail shingles shorter than ``n``
    (docs with < n words) come out identically: slices past the end are
    empty, ``arrays_zip`` null-pads, ``concat_ws`` drops the nulls.
    """
    c = normalized_text(col)
    toks = F.split(c, " ")
    length = F.greatest(F.size(toks) - n + 1, F.lit(1))
    parts = [F.slice(toks, k + 1, length) for k in range(n)]
    sh = F.transform(
        F.arrays_zip(*parts),
        lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)]),
    )
    return F.array_distinct(F.filter(sh, lambda s: F.length(s) > 0))


# ------------------------------------------------------------------ exact
def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: groups of byte-identical texts. Returns one row per
    duplicated text with the canonical keeper (min id) and group size."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_docs") > 1)
    )


def fingerprint_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Near-exact dedup on the normalized-text fingerprint (case/punct/
    whitespace-insensitive)."""
    return (
        docs.groupBy(F.md5(normalized_text(text_col)).alias("fingerprint"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keeper_id"))
        .where(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------- jaccard
def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """All (a < b) pairs with n-gram-shingle Jaccard ≥ threshold, via an
    inverted-index self-join (never materializes the n² pair space).

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    (frequent-shingle stopwording) — at corpus scale this bounds the join
    fan-out to O(max_df²) per hot shingle instead of O(corpus²), so it
    DEFAULTS ON. Pass None for the exact uncapped result (the oracle
    baseline; only safe on modest corpora).
    """
    sh = _spread(docs).select(
        F.col(id_col).alias("doc"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    if max_shingle_df is not None:
        # broadcast the HOT set (tiny: shingles above the cap), not the keep
        # set (≈ the whole vocabulary at corpus scale)
        hot = (
            sh.groupBy("shingle").count().where(F.col("count") > max_shingle_df).select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- minhash
def minhash_signature(col: Column | str, num_hashes: int = 32, reproducible: bool = True) -> Column:
    """MinHash signature as an array of per-hash minima over the shingle
    set. ``reproducible=True`` hashes via md5(i || ':' || shingle) and takes
    the lexicographic min hex string (portable to any SQL engine);
    ``False`` uses xxhash64 (faster, JVM-only)."""
    sh = word_shingles(col)
    if reproducible:
        return F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))
            ),
        )
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(i, s))).cast("string"),
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    reproducible: bool = False,
) -> DataFrame:
    """LSH candidate pairs: shingle → minhash → band → bucket-join.

    Two plan shapes, both whole-stage-codegen with no interpreted array
    lambdas in the hot path:

    - ``reproducible=False`` (the DEFAULT — the deployment shape): ONE shingle explode, then
      every signature slot as a codegen'd ``min(xxhash64(i, h0))`` aggregate
      in a single groupBy (the simhash vote-agg pattern) — the shuffle
      carries ``num_hashes`` partial mins per doc per partition instead of
      ``num_hashes×`` the shingle rows. Band buckets are a pure projection
      (xxhash64 over the band's min columns). ~``num_hashes``× fewer
      shuffled rows than the explode-per-hash shape.
    - ``reproducible=True`` (oracle mode): explode shingles × hash index →
      md5 → two partial-aggregating groupBys (min per (doc, i), band bucket
      per (doc, band)) — portable to any SQL engine for the DuckDB oracle.

    Map-side combine means the shuffles carry at most num_hashes (resp.
    bands) rows per doc per partition, independent of document length.
    Verify candidates with ngram_jaccard on the pairs.
    """
    rows_per_band = num_hashes // bands
    docs = _spread(docs)
    if not reproducible:
        # FAST path: NO num_hashes× row explosion. One shingle explode,
        # then all `num_hashes` signature slots as codegen'd
        # min(xxhash64(i, base)) aggregates in a SINGLE groupBy (the
        # simhash vote-agg pattern) — the shuffle carries num_hashes
        # partial mins per doc per partition instead of num_hashes× the
        # shingle rows. Band buckets are then a pure projection
        # (xxhash64 over the band's min columns), exploded to (band,
        # bucket) rows for the self-join. ~32× fewer shuffled rows than
        # the reproducible shape at num_hashes=32.
        postings = docs.select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(text_col)).alias("shingle"),
        ).select("doc", F.xxhash64("shingle").alias("h0"))
        sig = postings.groupBy("doc").agg(
            *[
                F.min(F.xxhash64(F.lit(i), F.col("h0"))).alias(f"m{i}")
                for i in range(num_hashes)
            ]
        )
        band_structs = [
            F.struct(
                F.lit(band).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"m{i}")
                        for i in range(band * rows_per_band, (band + 1) * rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for band in range(bands)
        ]
        banded = sig.select(
            "doc", F.explode(F.array(*band_structs)).alias("bb")
        ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        # Pair generation WITHOUT a self-join: a self-join would duplicate
        # the whole signature subtree (scan + shingle explode + 32-agg,
        # twice). Instead groupBy (band, bucket) → collect_set(doc) and
        # emit the a<b pairs per bucket with higher-order functions —
        # one scan, one signature pass, 3 shuffles total. Bucket member
        # lists are small by LSH design (a pathological all-identical
        # corpus is quadratic either way — same as the join).
        buckets = (
            banded.groupBy("band", "bucket")
            .agg(F.array_sort(F.collect_set("doc")).alias("ds"))
            .where(F.size("ds") >= 2)
        )
        pair_arr = F.flatten(
            F.transform(
                F.col("ds"),
                lambda x, i: F.transform(
                    F.slice(F.col("ds"), i + 2, F.size(F.col("ds"))),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
        return (
            buckets.select(F.explode(pair_arr).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
    else:
        postings = docs.select(
            F.col(id_col).alias("doc"),
            F.explode(word_shingles(text_col)).alias("shingle"),
        ).withColumn("i", F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))))
        h = F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("shingle")))
        minh = (
            postings.select("doc", "i", h.alias("h"))
            .groupBy("doc", "i")
            .agg(F.min("h").alias("h"))
        )
        banded = (
            minh.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
            .groupBy("doc", "band")
            .agg(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.transform(
                            F.array_sort(F.collect_list(F.struct("i", "h"))),
                            lambda s: s["h"],
                        ),
                    )
                ).alias("bucket")
            )
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


# ---------------------------------------------------------------- simhash
def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over token xxhash64 values: for each bit, sum ±1 over
    tokens and take the sign. Pure Catalyst (bit ops + aggregate over the
    token array) — no UDF, no shuffle."""
    c = normalized_text(col)
    toks = F.filter(F.split(c, " "), lambda t: F.length(t) > 0)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # shiftright/shiftleft need literal bit counts → unroll over the 64 bits.
    # (Bind i via a factory: pyspark counts lambda params, so default-arg
    # binding would turn this into a 3-arg higher-order lambda.)
    def _vote_fn(i: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    out = F.lit(0).cast("long")
    for i in range(64):
        vote = F.aggregate(hashes, F.lit(0), _vote_fn(i))
        bit_val = F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        out = out.bitwiseOR(F.when(vote > 0, bit_val).otherwise(F.lit(0).cast("long")))
    return out


def simhash_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    reproducible: bool = False,
) -> DataFrame:
    """(doc, simhash) via exploded tokens + per-bit codegen'd vote
    aggregates — the scale form of simhash64 (one shuffle, map-side
    combined; no interpreted array lambdas).

    ``reproducible=True`` switches to a 32-bit signature whose per-token
    hash is the first 8 hex chars of md5 (portable to any SQL engine for
    the oracle harness, mirroring the minhash_signature pattern); the
    default 64-bit fast path hashes with xxhash64 (JVM-only).
    """
    bits = 32 if reproducible else 64
    toks = _spread(docs).select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.filter(F.split(normalized_text(text_col), " "), lambda t: F.length(t) > 0)
        ).alias("tok"),
    )
    if reproducible:
        h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    else:
        h = F.xxhash64("tok")
    toks = toks.withColumn("h", h)
    votes = toks.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        sim = sim.bitwiseOR(F.when(F.col(f"_b{i}") > 0, bit_val).otherwise(F.lit(0).cast("long")))
    return votes.select("doc", sim.alias("simhash"))


def simhash_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_bits: int = 16,
    reproducible: bool = False,
) -> DataFrame:
    """SimHash near-dup candidates: docs sharing the top ``prefix_bits`` of
    their simhash (banded-prefix blocking; at scale, repeat over rotated
    hashes for full Hamming coverage). ``reproducible`` selects the 32-bit
    md5-based signature (SQL-oracle portable) over the 64-bit xxhash64 one.
    """
    bits = 32 if reproducible else 64
    s = simhash_table(docs, id_col, text_col, reproducible=reproducible)
    block = F.shiftrightunsigned(F.col("simhash"), bits - prefix_bits).alias("block")
    s = s.select("doc", "simhash", block)
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, (F.col("a.block") == F.col("b.block")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
            .cast("long")
            .alias("hamming"),
        )
    )


# ------------------------------------------------------------- embeddings
def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_buckets: int = 256,
    decimals: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. The DEFAULT blocks by a
    random-hyperplane LSH sketch first (see similarity.py) so the self-join
    stays within buckets — the form that survives a 100 TB corpus.
    ``num_buckets=1`` is the exact all-pairs baseline: opt-in, only for
    modest candidate sets (it is what the SQL oracle reproduces)."""
    from .similarity import cosine_expr, hyperplane_bucket

    v = emb.select(F.col(id_col).alias("doc"), F.col(vec_col).alias("vec"))
    if num_buckets > 1:
        v = v.withColumn("_bkt", hyperplane_bucket("vec", bits=8))
        cond = (F.col("a._bkt") == F.col("b._bkt")) & (F.col("a.doc") < F.col("b.doc"))
    else:
        cond = F.col("a.doc") < F.col("b.doc")
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.round(cosine_expr(F.col("a.vec"), F.col("b.vec")), decimals).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
