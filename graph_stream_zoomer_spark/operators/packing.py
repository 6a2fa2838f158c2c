"""Training-example preparation: sequence packing and deterministic splits.

The last mile of a pretraining data pipeline: after dedup/quality filtering,
turns are packed into fixed-token-budget training sequences and every
example is routed to a train/val/test split — both must be deterministic
(re-running the pipeline on the same snapshot yields byte-identical splits)
and shuffle-minimal at 100 TB.

- ``pack_sequences``: token-offset chunking — per conversation, each turn's
  pack index = floor(running-start-offset / max_tokens). One window pass on
  the conv_id exchange the successor binding already needs; a turn whose
  tokens straddle a boundary starts inside its pack (the standard
  concat-then-chunk pretraining layout, where examples are later truncated/
  continued at the token level). Exactly reproducible in SQL (cumsum
  window), unlike greedy bin-packing which is inherently sequential.
- ``assign_split``: md5-hash bucketing of a stable key into named splits by
  percentage — no sampling randomness, no global sort, portable to any
  engine (the same document lands in the same split everywhere, forever).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    turns: DataFrame,
    max_tokens: int,
    token_count: Column | None = None,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """Assign each turn a ``pack_id`` (conv-scoped chunk of ~max_tokens) and
    its ``tok_offset`` within the conversation's token stream. Output keeps
    every input column and adds (n_tokens, tok_offset, pack_idx, pack_id).
    """
    if token_count is None:
        from ..functions.text import expr_token_count

        token_count = expr_token_count("text")
    w = Window.partitionBy(conv_col).orderBy(order_col)
    d = turns.withColumn("n_tokens", token_count.cast("bigint"))
    d = d.withColumn(
        "tok_offset",
        F.coalesce(F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)),
    )
    d = d.withColumn("pack_idx", (F.col("tok_offset") / max_tokens).cast("bigint"))
    return d.withColumn(
        "pack_id", F.concat_ws("#", F.col(conv_col), F.col("pack_idx").cast("string"))
    )


def assign_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 5,
    test_pct: int = 5,
) -> DataFrame:
    """Deterministic md5-hash split: bucket = md5(key) mod 100; the first
    ``val_pct`` buckets are 'val', the next ``test_pct`` 'test', the rest
    'train'. Pure projection (no shuffle, no randomness); reproducible on
    any SQL engine via the same md5 arithmetic."""
    if val_pct + test_pct >= 100:
        raise ValueError("val_pct + test_pct must leave room for train")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10).cast("long"),
        F.lit(100),
    )
    split = (
        F.when(bucket < val_pct, F.lit("val"))
        .when(bucket < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def deterministic_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    group_cols: list[str] | None = None,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic k-per-group subsample: rank rows inside each group by
    md5(key) (a uniform, engine-portable pseudo-random order — the same
    trick assign_split uses) and keep the first ``k``.

    The reproducible alternative to ``df.sample``: re-running, re-ordering
    input files, or porting to another engine yields the SAME sample, which
    is what a training-data pipeline needs for auditability. ``key_col``
    must be UNIQUE per group — rows sharing a key share hash and
    tie-break, so which of them takes the rank is partition-order luck. With
    ``group_cols`` (e.g. language, source) it is stratified sampling: one
    window exchange on the group key, no global sort; without, a single
    partition-free rank is avoided by ranking within a constant group —
    callers sampling globally at 100 TB should pass group_cols (stratify)
    or pre-filter, since a global top-k by hash is a TakeOrderedAndProject
    at heart and k rows must fit the driver.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    order = F.md5(F.col(key_col).cast("string"))
    if group_cols:
        w = Window.partitionBy(*group_cols).orderBy(order, F.col(key_col))
        ranked = df.withColumn(rank_col, F.row_number().over(w))
        return ranked.where(F.col(rank_col) <= k)
    # global: hash-order the whole frame; Catalyst plans the filter+sort as
    # a distributed top-k (TakeOrderedAndProject) when an action limits it
    w = Window.orderBy(order, F.col(key_col))
    return df.withColumn(rank_col, F.row_number().over(w)).where(F.col(rank_col) <= k)


def weighted_sample(
    df: DataFrame,
    k: int,
    key_col: str,
    weight_col: str,
    group_cols: list[str] | None = None,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic WEIGHTED k-per-group subsample — Efraimidis–Spirakis
    A-ES (one-pass weighted reservoir sampling, IPL 2006): each row gets
    priority u^(1/w) with u a uniform pseudo-random in (0, 1]; the k
    largest priorities are a weighted-without-replacement sample. The
    training-data use is quality-weighted corpus subsampling: w = a
    quality score makes high-quality docs proportionally likelier while
    the output stays an auditable, rerun/engine-stable sample.

    Determinism: u is md5-derived from the key (the assign_split trick,
    disjoint "ws:" hash prefix so weighting never correlates with splits
    or uniform samples; as with ``deterministic_sample``, ``key_col``
    must be unique per group — duplicate keys tie on both priority and
    tie-break); the rank key is ln(u)/w — the monotone log form
    of u^(1/w), numerically safe for tiny u — ROUNDED to 9 decimals
    before ranking with a key tie-break, so engines whose libm log
    differs in the last ulp still rank identically (the repo's
    round-before-rank discipline).

    Scale: identical plan shape to ``deterministic_sample`` — one window
    exchange on the group key when stratified; the global form is a
    distributed top-k and k rows must fit the driver.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w_col = F.col(weight_col).cast("double")
    checked_w = F.when(
        w_col.isNull() | (w_col <= 0),
        F.raise_error(F.lit(f"weighted_sample: weights in {weight_col} must be > 0")),
    ).otherwise(w_col)
    # u in (0, 1]: first 12 md5 hex digits -> (h+1)/2^48; +1 keeps ln(u)
    # finite and makes u=1 (ln=0, the best possible priority) reachable
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col(key_col).cast("string"))), 1, 12),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(float(1 << 48))
    # DESC: larger ln(u)/w (closer to 0) == larger u^(1/w)
    prio = F.round(F.log(u) / checked_w, 9)
    if group_cols:
        win = Window.partitionBy(*group_cols).orderBy(prio.desc(), F.col(key_col))
        ranked = df.withColumn(rank_col, F.row_number().over(win))
        return ranked.where(F.col(rank_col) <= k)
    win = Window.orderBy(prio.desc(), F.col(key_col))
    return df.withColumn(rank_col, F.row_number().over(win)).where(F.col(rank_col) <= k)


def stratified_sample_rates(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    key_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum rate-based downsampling (the "data mixing" primitive:
    keep 100% of code, 30% of web, 5% of logs, …).

    Deterministic: a row survives iff md5-bucket(key) < rate·10⁶, the same
    engine-portable hash arithmetic as assign_split — so the sample is
    stable across runs, input orderings, and engines, and composable with
    assign_split (independent md5 prefixes: bucket uses hex chars 9-16,
    split uses 1-8, so sampling never biases the split).

    Scale: the rates dict becomes a tiny dimension DataFrame joined with a
    broadcast hash join (never a shuffle of the fact side); the filter is
    a pure projection after it. Strata missing from ``rates`` get
    ``default_rate`` (0.0 = drop, the safe default for an explicit mix).
    """
    for s, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for stratum {s!r} must be in [0,1], got {r}")
    spark = df.sparkSession
    rates_df = spark.createDataFrame(
        [(s, int(round(r * 1_000_000))) for s, r in sorted(rates.items())],
        f"{strata_col} string, _keep_ppm long",
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 9, 8), 16, 10).cast("long"),
        F.lit(1_000_000),
    )
    default_ppm = int(round(default_rate * 1_000_000))
    return (
        df.join(F.broadcast(rates_df), strata_col, "left")
        .withColumn("_keep_ppm", F.coalesce(F.col("_keep_ppm"), F.lit(default_ppm)))
        .where(bucket < F.col("_keep_ppm"))
        .drop("_keep_ppm")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_len: int = 200,
    overlap: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-length overlapping character chunks (the RAG / context-window
    preparation step): chunk k starts at k·(chunk_len − overlap); the
    chunk count is ceil(max(len − overlap, 1) / stride), so the final
    chunk always reaches the end of the document (it may be shorter than
    chunk_len, never empty) and no chunk is wholly contained in its
    predecessor.

    Pure projection + explode — zero shuffle, stream-transparent, and the
    fan-out happens inside the row (no pre-materialized chunk array
    survives the explode). Returns (id_col, chunk_idx, chunk_start,
    n_chars, chunk_text). Deterministic and engine-portable (integer
    arithmetic only), so it oracle-checks against plain SQL.
    """
    if chunk_len < 1 or overlap < 0 or overlap >= chunk_len:
        raise ValueError("need chunk_len >= 1 and 0 <= overlap < chunk_len")
    stride = chunk_len - overlap
    dlen = F.length(F.col(text_col))
    n_chunks = F.floor(
        (F.greatest(dlen - overlap, F.lit(1)) + (stride - 1)) / stride
    ).cast("int")
    out = (
        docs.where(dlen > 0)
        .select(id_col, text_col)
        .withColumn(
            "chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        )
        .withColumn("chunk_start", (F.col("chunk_idx") * stride).cast("bigint"))
        .withColumn(
            "chunk_text",
            F.substring(
                F.col(text_col), F.col("chunk_start").cast("int") + 1, chunk_len
            ),
        )
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        "chunk_start",
        F.length("chunk_text").cast("bigint").alias("n_chars"),
        "chunk_text",
    )
