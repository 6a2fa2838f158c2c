"""Deterministic mergeable sketches — cardinality, frequency, and
membership summaries a 100 TB training-data pipeline needs where exact
answers would shuffle the corpus (Bar-Yossef et al. KMV distinct counting,
RANDOM'02; Cormode & Muthukrishnan count-min, J.Alg 2005; Bloom CACM 1970).
No reference equivalent (graph-stream-zoomer has no sketch operators); the
Spark-first designs below are all algebraic — partial-aggregating,
mergeable across partitions/windows, and (in ``reproducible`` mode)
bit-exactly reconstructible in ANSI SQL for the DuckDB oracle harness.

Scale notes (what survives a 1000-executor run):
  - KMV distinct: ONE window exchange on the group key (``pre_distinct=False``)
    or distinct-first (default) when duplication is high — the distinct's
    partial aggregation combines map-side, so the shuffle carries distinct
    (group, hash) rows, not the corpus. The estimate itself is integer
    arithmetic: ``(k-1) * 2^32 div kth_min_hash`` — order-free and
    hash-exact cross-engine (no float accumulation).
  - Count-min: the sketch is ``depth × width`` counters built by ONE
    partially-aggregated groupBy — shuffle volume is bounded by
    ``depth*width`` rows PER MAP TASK regardless of corpus size, and two
    sketches merge by adding counters (windowed/streaming-friendly).
  - Bloom semi-join: the classic shuffle-avoidance move — build a bitmap
    from the SMALL side (same smallness contract as any broadcast join),
    broadcast the single-row bitmap, and filter the 100 TB probe side with
    ZERO probe-side shuffle (plan-pinned). False positives only — the
    output is a superset of the true semi-join, to be tightened by the
    real join downstream; false negatives are impossible (pinned).
  - Hash choice: ``reproducible=True`` derives every hash from
    md5(seed:value) — 32-bit, available in DuckDB for the oracle; the
    deployment default is xxhash64 (JVM codegen, no string md5 per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HASH_SPACE = 1 << 32  # reproducible h32 range; fast path is pmod-folded into it

def _word_and_bit(pos: Column) -> tuple[Column, Column]:
    # 1 << (pos % 32) as a 32-literal array lookup: pyspark's shiftleft()
    # takes a Python-int shift only; a constant array + element_at folds in
    # Catalyst. Built per-call — F.lit needs an active session.
    bit_lut = F.array(*[F.lit(1 << b).cast("long") for b in range(32)])
    word = (pos / 32).cast("int")
    bit = F.element_at(bit_lut, (pos % 32).cast("int") + 1)
    return word, bit


def _hash32(col: Column, seed: int, reproducible: bool) -> Column:
    """Non-negative hash in [0, 2^32): md5-derived (SQL-portable) or
    xxhash64 folded by pmod (deployment — stays in codegen, no per-row
    string md5). DuckDB twin of the reproducible form:
    ``('0x' || substr(md5(seed || ':' || CAST(x AS VARCHAR)), 1, 8))::BIGINT``.
    """
    if reproducible:
        payload = F.concat(F.lit(f"{seed}:"), col.cast("string"))
        return F.conv(F.substring(F.md5(payload), 1, 8), 16, 10).cast("long")
    return F.pmod(F.xxhash64(F.lit(seed), col), F.lit(_HASH_SPACE)).cast("long")


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch
# ---------------------------------------------------------------------------


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
    reproducible: bool = False,
    pre_distinct: bool = True,
) -> DataFrame:
    """Approximate COUNT(DISTINCT col) per group via the k smallest distinct
    hash values (Bar-Yossef et al.): with fewer than ``k`` distinct values
    the count is EXACT; otherwise ``est = (k-1) * 2^32 div kth_min`` —
    standard error ~ 1/sqrt(k-2). Integer-exact estimator: no float in the
    pipeline, so Spark and the SQL oracle agree bit-for-bit.

    Two plan shapes (both correct; pick by duplication ratio):
      - ``pre_distinct=True`` (default, high-duplication corpora): distinct
        (group, hash) first — partial agg combines map-side, the shuffle
        carries distinct rows only; then one window exchange on the group.
      - ``pre_distinct=False`` (near-unique keys): a single ``dense_rank``
        window exchange does dedup + ranking in one pass over raw rows.

    Returns one row per group: ``group_cols… , est_distinct: bigint``.
    """
    if k < 2:
        raise ValueError(f"kmv_distinct needs k >= 2 (estimator is (k-1)/U_(k)); got {k}")
    g = list(group_cols or [])
    # NULL keys hash to NULL, which Spark windows sort FIRST and SQL engines
    # sort LAST — and COUNT(DISTINCT) ignores NULL anyway: drop them.
    df = df.where(F.col(col).isNotNull())
    h = _hash32(F.col(col), 0, reproducible)
    est_expr = F.when(
        F.col("_n") < k, F.col("_n")
    ).otherwise(
        F.expr(f"div({(k - 1) * _HASH_SPACE}L, greatest(_kth, 1L))")
    )
    if not g:
        # global sketch: an empty-partition window would be a single-
        # partition global sort; orderBy().limit(k) is TakeOrdered —
        # per-partition top-k merged on the driver, k rows moved total.
        kept = df.select(h.alias("_h")).distinct().orderBy("_h").limit(k)
        agg = kept.agg(F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_kth"))
        return agg.select(est_expr.cast("long").alias("est_distinct"))
    if pre_distinct:
        hashed = df.select(*g, h.alias("_h")).distinct()
        w = Window.partitionBy(*g).orderBy("_h")
        kept = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
        agg = kept.groupBy(*g).agg(
            F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_kth")
        )
    else:
        w = Window.partitionBy(*g).orderBy("_h")
        ranked = df.select(*g, h.alias("_h")).withColumn("_dr", F.dense_rank().over(w))
        kept = ranked.where(F.col("_dr") <= k)
        agg = kept.groupBy(*g).agg(
            F.max("_dr").alias("_n"), F.max("_h").alias("_kth")
        )
    return agg.select(*g, est_expr.cast("long").alias("est_distinct"))


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
    reproducible: bool = False,
) -> DataFrame:
    """The MERGEABLE representation behind ``kmv_distinct`` — one row per
    group with ``kept: array<long>``, the sorted ≤ k smallest distinct
    hashes. This is KMV's analog of HLL's register table / CMS's counter
    table / bloom's word table: sketches of disjoint (or overlapping —
    dedup is by hash value) corpus parts combine via ``kmv_merge`` into
    exactly the whole corpus's sketch, which is what partition-level
    sketch logs and cross-day rollups need. ``kmv_estimate`` reads the
    count back out; estimates from merged parts == estimate of the whole
    (pinned)."""
    if k < 2:
        raise ValueError(f"kmv_sketch needs k >= 2 (estimator is (k-1)/U_(k)); got {k}")
    g = list(group_cols or [])
    df = df.where(F.col(col).isNotNull())
    h = _hash32(F.col(col), 0, reproducible)
    if not g:
        kept = df.select(h.alias("_h")).distinct().orderBy("_h").limit(k)
        return kept.agg(F.sort_array(F.collect_list("_h")).alias("kept"))
    hashed = df.select(*g, h.alias("_h")).distinct()
    w = Window.partitionBy(*g).orderBy("_h")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return topk.groupBy(*g).agg(F.sort_array(F.collect_list("_h")).alias("kept"))


def kmv_merge(
    sketches: DataFrame, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge KMV sketch rows (several ``kept`` arrays per group → one):
    union the hash sets, keep the k smallest. Pure Catalyst array ops per
    grouped row — flatten, dedup, sort, slice — after ONE combinable
    collect per group (each input row is ≤ k longs, so state is bounded
    by rows_per_group·k)."""
    if k < 2:
        raise ValueError(f"kmv_merge needs k >= 2; got {k}")
    g = list(group_cols or [])
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("kept")))), 1, k
    ).alias("kept")
    if not g:
        return sketches.agg(merged)
    return sketches.groupBy(*g).agg(merged)


def kmv_estimate(
    sketches: DataFrame, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from ``kmv_sketch`` rows — the same
    integer-exact estimator as ``kmv_distinct`` (exact below k, else
    ``(k-1)·2^32 div kth_min``), so sketch→estimate equals the direct
    one-pass form bit-for-bit (pinned)."""
    if k < 2:
        raise ValueError(f"kmv_estimate needs k >= 2; got {k}")
    g = list(group_cols or [])
    n = F.size(F.col("kept"))
    est = F.when(n < k, n.cast("long")).otherwise(
        F.expr(f"div({(k - 1) * _HASH_SPACE}L, greatest(element_at(kept, {k}), 1L))")
    )
    return sketches.select(*g, est.cast("long").alias("est_distinct"))


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007) — register table + estimate
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    col: str,
    b: int = 8,
    group_cols: list[str] | None = None,
    reproducible: bool = False,
) -> DataFrame:
    """HyperLogLog register table: one row per (group, bucket) with the
    max leading-zero rank (rho) observed — m = 2^b registers, bucket = the
    hash's top ``b`` bits, rho = leading zeros of the remaining 32-b bits
    + 1. ONE map-side-combined groupBy(max); registers merge by MAX, which
    is idempotent — replayed/windowed merges are harmless, same contract
    as the bloom bitmap. Unseen buckets are implicit zeros (hll_estimate
    accounts for them).

    Everything is integer arithmetic — rho comes from the BINARY-STRING
    length of the remainder (``length(bin(w))``, exact in Spark and
    DuckDB alike), never float log2, whose edge-of-ulp behavior at exact
    powers of two differs across engines."""
    if not 4 <= b <= 16:
        raise ValueError(f"hll needs 4 <= b <= 16; got {b}")
    g = list(group_cols or [])
    rem_bits = 32 - b
    h = _hash32(F.col(col), 0, reproducible)
    bucket = F.expr(f"div(_h, {1 << rem_bits}L)")
    w = F.col("_h") % (1 << rem_bits)
    rho = F.when(w == 0, F.lit(rem_bits + 1)).otherwise(
        rem_bits - F.length(F.bin(w)) + 1
    )
    hashed = df.where(F.col(col).isNotNull()).select(*g, h.alias("_h"))
    return (
        hashed.select(*g, bucket.cast("long").alias("bucket"), rho.alias("_rho"))
        .groupBy(*g, "bucket")
        .agg(F.max("_rho").cast("long").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame, b: int = 8, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate from an hll_registers table, with the
    standard corrections: raw = alpha_m·m²/Σ2^(-rho) (unseen registers
    count as rho=0), linear counting below 2.5·m, and the 32-bit
    large-range correction. Σ2^(-rho) is carried as the integer
    Σ2^(Rmax-rho) (exact: ≤ m·2^Rmax ≤ 2^33 fits long for every b); the
    constant numerator alpha_ppm·m²·2^Rmax is folded to ONE double literal
    on the driver — for b ≥ 11 it exceeds 2^63, so carrying it in BIGINT
    would silently wrap under Spark's non-ANSI arithmetic and corrupt both
    the estimate and the correction-branch comparisons. The estimate is a
    float either way (pinned by accuracy tests, not a SQL oracle)."""
    g = list(group_cols or [])
    m = 1 << b
    rmax = 32 - b + 1
    alpha = (
        0.7213 / (1 + 1.079 / m)
        if m >= 128
        else {16: 0.673, 32: 0.697, 64: 0.709}[m]
    )
    alpha_ppm = round(alpha * 1_000_000)
    agg = registers.groupBy(*g).agg(
        F.count(F.lit(1)).alias("_seen"),
        F.sum(
            F.expr(f"shiftleft(1L, {rmax} - cast(max_rho as int))")
        ).alias("_s_seen"),
    )
    zeros = F.lit(m) - F.col("_seen")  # unseen registers, rho = 0
    s_total = F.col("_s_seen") + zeros * (1 << rmax)
    # numerator folded driver-side in exact Python int arithmetic, then
    # rounded ONCE to double (it exceeds int64 for b >= 11); the division
    # denominator s_total stays integer-exact in long
    num = float(alpha_ppm * m * m * (1 << rmax)) / 1_000_000.0
    raw = F.lit(num) / s_total.cast("double")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    two32 = float(1 << 32)
    large = -F.lit(two32) * F.log(F.lit(1.0) - raw / F.lit(two32))
    est = (
        F.when((raw <= 2.5 * m) & (zeros > 0), lc)
        .when(raw > two32 / 30.0, large)
        .otherwise(raw)
    )
    return agg.select(*g, est.cast("double").alias("est_distinct"))


# ---------------------------------------------------------------------------
# Count-min sketch: frequency estimation + heavy hitters
# ---------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    reproducible: bool = False,
) -> DataFrame:
    """Build a count-min sketch of ``col``'s frequency distribution: one row
    per (row_idx, bucket) with the counter value. ONE groupBy — the
    posexplode fans each input row to ``depth`` (row, bucket) pairs map-side
    and partial aggregation collapses them to at most ``depth*width``
    counters per task before the (tiny) shuffle. Two sketches over disjoint
    data merge by summing counters — windowed / streaming-incremental by
    construction.
    """
    if width < 1 or depth < 1:
        raise ValueError(f"cms_sketch needs width,depth >= 1; got {width}x{depth}")
    c = F.col(col)
    buckets = F.array(
        *[F.pmod(_hash32(c, r, reproducible), F.lit(width)) for r in range(depth)]
    )
    pairs = df.where(c.isNotNull()).select(
        F.posexplode(buckets).alias("row_idx", "bucket")
    )
    return pairs.groupBy("row_idx", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    reproducible: bool = False,
) -> DataFrame:
    """Point-estimate the frequency of each item: min over the sketch's
    ``depth`` rows of the item's counter (one-sided error — never an
    underestimate). The sketch (≤ depth*width rows) is broadcast; the only
    item-side exchange is the final min-per-item groupBy, which rides the
    posexplode's partitioning when ``items`` is already item-partitioned
    (e.g. the output of a distinct). Empty buckets count as 0.
    """
    c = F.col(item_col)
    buckets = F.array(
        *[F.pmod(_hash32(c, r, reproducible), F.lit(width)) for r in range(depth)]
    )
    probes = items.select(
        item_col, F.posexplode(buckets).alias("row_idx", "bucket")
    )
    joined = probes.join(F.broadcast(sketch), ["row_idx", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )


def cms_heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    width: int = 1024,
    depth: int = 4,
    reproducible: bool = False,
) -> DataFrame:
    """Items whose count-min frequency estimate is ≥ ``threshold``. The
    one-sided CMS guarantee means NO true heavy hitter is missed; collision
    overestimates can only add candidates (filter exactly downstream if
    needed). Candidate set = distinct items of ``df`` here; at 100 TB pass
    a pre-sampled / pre-filtered candidate frame to ``cms_lookup`` instead
    of re-scanning the corpus for candidates.
    """
    sketch = cms_sketch(df, col, width, depth, reproducible)
    candidates = df.select(col).distinct()
    est = cms_lookup(sketch, candidates, col, width, depth, reproducible)
    return est.where(F.col("est_count") >= threshold)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning
# ---------------------------------------------------------------------------


def bloom_bits(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
    reproducible: bool = False,
) -> DataFrame:
    """Bloom bitmap of ``col`` as (word:int, bits:bigint) rows — 32 bits
    per word (shift stays far from BIGINT sign overflow on every engine).
    ONE exchange: each row fans to ``num_hashes`` (word, bit) pairs map-side
    and ``bit_or`` partial-aggregates to ≤ num_bits/32 rows per task.
    Bitmaps of disjoint inputs merge by word-wise ``bit_or`` (idempotent —
    re-delivered rows are harmless, so streaming twins need no dedup).
    """
    if num_bits < 1 or num_hashes < 1:
        raise ValueError(
            f"bloom needs num_bits,num_hashes >= 1; got {num_bits}/{num_hashes}"
        )
    c = F.col(col)
    positions = F.array(
        *[F.pmod(_hash32(c, r, reproducible), F.lit(num_bits)) for r in range(num_hashes)]
    )
    word, bit = _word_and_bit(F.col("pos"))
    pairs = df.where(c.isNotNull()).select(F.explode(positions).alias("pos")).select(
        word.alias("word"), bit.alias("bit")
    )
    return pairs.groupBy("word").agg(F.expr("bit_or(bit)").alias("bits"))


def bloom_semi_join(
    probe: DataFrame,
    probe_col: str,
    build: DataFrame,
    build_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
    reproducible: bool = False,
) -> DataFrame:
    """Filter ``probe`` to rows whose key is (probably) present in
    ``build`` — the bloom-pruned semi-join. The build side must be the
    small side (the same contract as a broadcast join); its bitmap is
    collapsed to ONE map-typed row and broadcast, so the probe side is a
    scan + filter with ZERO shuffle (plan-pinned in tests/test_plans.py) —
    at 100 TB this prunes the big side before any real join pays its
    exchange. Output keeps every true member (no false negatives — pinned)
    plus a deterministic, hash-defined set of false positives
    (~(1 - e^(-kn/m))^k); run the exact join on the survivors when the
    final answer must be FP-free.
    """
    words = bloom_bits(build, build_col, num_bits, num_hashes, reproducible)
    bitmap = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("_bloom")
    )
    c = F.col(probe_col)
    member = F.lit(True)
    for r in range(num_hashes):
        pos = F.pmod(_hash32(c, r, reproducible), F.lit(num_bits))
        word, bit = _word_and_bit(pos)
        member = member & (
            F.coalesce(F.element_at(F.col("_bloom"), word), F.lit(0)).bitwiseAND(bit) != 0
        )
    out_cols = probe.columns
    return probe.crossJoin(F.broadcast(bitmap)).where(member).select(*out_cols)


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch (DDSketch-style, Masson et al. VLDB 2019)
# ---------------------------------------------------------------------------

def _pow2_lut() -> Column:
    # 2^0 .. 2^62 as a literal array: exact integer scaling without
    # column-shift expressions (element_at folds in Catalyst; the Python
    # shiftright API only takes literal shift amounts)
    return F.array(*[F.lit(1 << i).cast("long") for i in range(63)])


def _lh_bin(x: Column, r: int) -> Column:
    """Bucket index of non-negative integer ``x`` with relative error
    2^-r: values below 2^(r+1) map to themselves (EXACT); above, the top
    r+1 significant bits index the bucket — bin = (e-r)*2^r + (x >> (e-r))
    with e = bit_length(x)-1. Monotone in x, ≤ 2^r bins per octave.

    The shift is taken as the first r+1 chars of the binary string (conv
    base 2 → 10), NOT a long/long division: Spark's ``/`` is DOUBLE
    division, which loses low bits above 2^53 and would mis-bin huge
    values; the string form is exact over the full 63-bit range (pinned
    vs Python ints at 2^60-scale inputs)."""
    e = F.length(F.bin(x)) - F.lit(1)
    g = (e - F.lit(r)).cast("long")
    shifted = F.conv(F.substring(F.bin(x), 1, r + 1), 2, 10).cast("long")  # x >> (e-r)
    return F.when(x < F.lit(1 << (r + 1)), x).otherwise(
        g * F.lit(1 << r) + shifted
    )


def _lh_rep(b: Column, r: int) -> Column:
    """Lower bound of bucket ``b`` (the inverse of _lh_bin): the returned
    quantile value, under-estimating the true value by < 2^-r relative."""
    g = F.floor(b / F.lit(1 << r)).cast("long") - F.lit(1)
    return F.when(b < F.lit(1 << (r + 1)), b).otherwise(
        (b - g * F.lit(1 << r)) * F.element_at(_pow2_lut(), g.cast("int") + 1)
    )


def log_histogram(
    df: DataFrame,
    col: str,
    r: int = 5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile sketch of a non-negative integer metric column (lengths,
    counts, latencies) as a log-scaled histogram — the DDSketch layout
    (Masson et al., VLDB 2019) restricted to integer inputs so every step
    is integer-exact and SQL-reproducible (no float log in any engine).

    One row per (group, bin) with the bin's row count. Values below
    2^(r+1) get their own bin (exact); above, each octave splits into 2^r
    log-spaced bins, so any quantile read from the sketch under-estimates
    the true value by < 2^-r relative (~3% at the default r=5).

    Scale: ONE partially-aggregated exchange (map-side combine leaves
    ≤ 64·2^r rows per map task regardless of corpus size); sketches MERGE
    by adding counts per bin — windowed/streaming/rollup-friendly. NULLs
    are skipped; negative values are rejected up front (the sketch domain
    is non-negative metrics — remap or shift signed data first).
    """
    if not 1 <= r <= 16:
        raise ValueError(f"log_histogram needs 1 <= r <= 16; got {r}")
    g = list(group_cols or [])
    x = F.col(col).cast("long")
    df = df.where(x.isNotNull())
    # reject negatives loudly instead of silently mis-binning them: the
    # guard is one Catalyst conditional, no extra pass
    checked = F.when(x < 0, F.raise_error(F.lit(f"log_histogram: negative value in {col}"))).otherwise(x)
    return (
        df.select(*g, _lh_bin(checked, r).alias("bin"))
        .groupBy(*g, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def lh_quantiles(
    hist: DataFrame,
    qs_ppm: list[int],
    r: int = 5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Read quantiles out of a ``log_histogram`` sketch: for each group and
    each q (parts-per-million, e.g. 500000 = median), the lower bound of
    the bin holding the rank-ceil(q·n) value — percentile_disc semantics
    with < 2^-r relative under-estimate, integer-exact end to end.

    The sketch is tiny (≤ 64·2^r rows per group), so the rank scan is a
    window cumsum over the group's bins plus one aggregation — the
    exchanges move sketch rows, never corpus rows.
    """
    if not qs_ppm:
        raise ValueError("lh_quantiles needs at least one q_ppm")
    for q in qs_ppm:
        if not 0 < q <= 1_000_000:
            raise ValueError(f"q_ppm must be in (0, 1000000]; got {q}")
    g = list(group_cols or [])
    # ungrouped sketches still get a (constant) partition spec: the frame
    # is ≤ 64·2^r rows by construction, and an explicit spec keeps the
    # plan-quality contract (no "No Partition Defined" global sort)
    w_ord = (Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))).orderBy("bin")
    w_all = Window.partitionBy(*g) if g else Window.partitionBy(F.lit(1))
    cum = hist.select(
        *g,
        "bin",
        F.sum("cnt").over(w_ord).alias("_cum"),
        F.sum("cnt").over(w_all).alias("_n"),
    )
    spark = hist.sparkSession
    qdf = spark.createDataFrame([(int(q),) for q in qs_ppm], "q_ppm bigint")
    joined = cum.crossJoin(F.broadcast(qdf))
    # rank = ceil(q·n) in exact integers, split so no intermediate exceeds
    # long range (q_ppm*n wraps once n passes ~9.2e12 — squarely inside
    # the 100 TB regime): with n = a·10^6 + b, ceil(qn/10^6) =
    # q·a + ceil(q·b/10^6); q·a ≤ n and q·b < 10^12, both safe
    rank = F.expr(
        "q_ppm * div(_n, 1000000) + div(q_ppm * pmod(_n, 1000000) + 999999, 1000000)"
    )
    picked = (
        joined.groupBy(*g, "q_ppm")
        .agg(F.min(F.when(F.col("_cum") >= rank, F.col("bin"))).alias("_b"))
    )
    return picked.select(*g, "q_ppm", _lh_rep(F.col("_b"), r).alias("value"))


def quantile_sketch(
    df: DataFrame,
    col: str,
    qs_ppm: list[int],
    r: int = 5,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``log_histogram`` → ``lh_quantiles`` in one call: per-group
    approximate quantiles of a non-negative integer column with < 2^-r
    relative error, one corpus exchange total."""
    return lh_quantiles(
        log_histogram(df, col, r=r, group_cols=group_cols),
        qs_ppm,
        r=r,
        group_cols=group_cols,
    )
