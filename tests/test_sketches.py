"""Sketch operators: KMV distinct, count-min, bloom semi-join — accuracy
guarantees, cross-path agreement, mergeability, and plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from graph_stream_zoomer_spark.operators.sketches import (
    bloom_bits,
    bloom_semi_join,
    cms_heavy_hitters,
    cms_lookup,
    cms_sketch,
    hll_estimate,
    hll_registers,
    kmv_distinct,
)
from graph_stream_zoomer_spark.plans.inspect import plan_stats

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


# ---------------------------------------------------------------------------
# KMV
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("reproducible", [False, True])
def test_kmv_exact_below_k(events, reproducible):
    """With fewer than k distinct values the KMV 'estimate' is exact."""
    got = kmv_distinct(
        events, "user_id", k=1024, group_cols=["event_type"], reproducible=reproducible
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact")
    )
    rows = got.join(exact, "event_type").collect()
    assert len(rows) == 5
    assert all(r.est_distinct == r.exact for r in rows), rows


@pytest.mark.parametrize("reproducible", [False, True])
def test_kmv_estimator_error_bound(events, reproducible):
    """Estimator branch (150 distinct users > k=64): relative error within
    ~3 standard errors (1/sqrt(k-2) ≈ 12.7%) on the deterministic fixture."""
    got = kmv_distinct(events, "user_id", k=64, group_cols=["event_type"],
                       reproducible=reproducible).collect()
    assert len(got) == 5
    for r in got:
        assert abs(r.est_distinct - 150) / 150 < 0.40, got


def test_kmv_global_uses_take_ordered(events):
    """group_cols=None must NOT plan an empty-partition window (global
    single-partition sort): the global sketch is distinct → TakeOrdered."""
    got = kmv_distinct(events, "user_id", k=64, reproducible=True)
    st = plan_stats(got)
    assert "Window" not in st.text, st.text[:3000]
    assert "TakeOrderedAndProject" in st.text, st.text[:3000]
    (row,) = got.collect()
    assert abs(row.est_distinct - 150) / 150 < 0.40


def test_kmv_both_plan_shapes_agree(events):
    """pre_distinct=True (distinct-first) and pre_distinct=False (single
    dense_rank exchange) are alternative PLANS of the same estimator —
    identical output bit-for-bit."""
    a = kmv_distinct(events, "user_id", k=64, group_cols=["event_type"],
                     reproducible=True, pre_distinct=True)
    b = kmv_distinct(events, "user_id", k=64, group_cols=["event_type"],
                     reproducible=True, pre_distinct=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmv_dense_rank_single_exchange(events):
    """The pre_distinct=False shape is ONE shuffle end-to-end (window dedup
    + rank + group agg all ride the same group-key partitioning)."""
    st = plan_stats(
        kmv_distinct(events, "user_id", k=64, group_cols=["event_type"],
                     pre_distinct=False)
    )
    assert st.num_exchanges == 1, st.text[:3000]


def test_parameter_guards(events):
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_distinct(events, "user_id", k=1)
    with pytest.raises(ValueError, match="width,depth"):
        cms_sketch(events, "user_id", width=0)
    with pytest.raises(ValueError, match="num_bits,num_hashes"):
        bloom_bits(events, "user_id", num_bits=0)
    with pytest.raises(ValueError, match="4 <= b <= 16"):
        hll_registers(events, "user_id", b=2)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("reproducible", [False, True])
def test_hll_linear_counting_branch(events, reproducible):
    """150 distinct users << 2.5·m at b=8 → the linear-counting branch,
    well inside its accuracy envelope."""
    regs = hll_registers(events, "user_id", b=8, group_cols=["event_type"],
                         reproducible=reproducible)
    got = hll_estimate(regs, b=8, group_cols=["event_type"]).collect()
    assert len(got) == 5
    for r in got:
        assert abs(r.est_distinct - 150) / 150 < 0.15, got


@pytest.mark.parametrize("reproducible", [False, True])
def test_hll_raw_branch(events, reproducible):
    """10,000 distinct event_ids > 2.5·m → the raw alpha·m²/ΣZ branch;
    standard error 1.04/sqrt(256) ≈ 6.5%, allow 3σ."""
    regs = hll_registers(events, "event_id", b=8, reproducible=reproducible)
    (row,) = hll_estimate(regs, b=8).collect()
    assert abs(row.est_distinct - 10000) / 10000 < 0.20, row


@pytest.mark.parametrize("b,n", [(14, 60_000), (16, 200_000)])
def test_hll_raw_branch_large_b_no_overflow(spark, b, n):
    """b >= 11 regression: the raw-branch numerator alpha·m²·2^Rmax exceeds
    2^63 (b=16 needs ~4.1e20) — carried in BIGINT it silently wrapped
    negative under non-ANSI arithmetic, corrupting the estimate and the
    correction-branch comparisons. Now folded to a double literal: the
    estimate must land within the standard-error envelope (1.04/sqrt(m)
    < 1%; allow 5%)."""
    df = spark.range(n).select(F.col("id").alias("user_id"))
    regs = hll_registers(df, "user_id", b=b)
    (row,) = hll_estimate(regs, b=b).collect()
    assert row.est_distinct > 0, row
    assert abs(row.est_distinct - n) / n < 0.05, row


def test_hll_registers_merge_by_max(events):
    """Registers of two disjoint halves merge by per-bucket MAX into
    exactly the whole corpus's registers (idempotent — the streaming /
    windowed-rollup contract, same as the bloom bitmap's bit_or)."""
    from pyspark.sql import functions as F

    a = events.where(F.col("event_id") % 2 == 0)
    bhalf = events.where(F.col("event_id") % 2 == 1)
    merged = (
        hll_registers(a, "user_id", b=8)
        .unionAll(hll_registers(bhalf, "user_id", b=8))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = hll_registers(events, "user_id", b=8)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_registers_single_exchange(events):
    st = plan_stats(hll_registers(events, "user_id", b=8, group_cols=["event_type"]))
    assert st.num_exchanges == 1, st.text[:3000]
    assert "EvalPython" not in st.text


# ---------------------------------------------------------------------------
# count-min
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("reproducible", [False, True])
def test_cms_never_underestimates(events, reproducible):
    """The CMS guarantee: est >= true count for EVERY item, even at a width
    small enough to force collisions."""
    sketch = cms_sketch(events, "user_id", width=64, depth=4, reproducible=reproducible)
    cand = events.select("user_id").distinct()
    est = cms_lookup(sketch, cand, "user_id", width=64, depth=4,
                     reproducible=reproducible)
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    rows = est.join(exact, "user_id").collect()
    assert len(rows) == 150
    assert all(r.est_count >= r.c for r in rows)


def test_cms_lookup_absent_items_estimate_zero(events, spark):
    """Items never inserted hit empty buckets at a wide sketch: the left
    join's coalesce-0 path must yield est 0, not drop the row."""
    sketch = cms_sketch(events, "user_id", width=4096, depth=4)
    absent = spark.range(1_000_000, 1_000_005).withColumnRenamed("id", "user_id")
    rows = cms_lookup(sketch, absent, "user_id", width=4096, depth=4).collect()
    assert len(rows) == 5
    assert all(r.est_count == 0 for r in rows), rows


def test_cms_exact_when_wide(events):
    """At width >> n_distinct * depth the min over rows sheds all
    collisions: heavy hitters == exact heavy hitters with exact counts."""
    hh = cms_heavy_hitters(events, "user_id", threshold=78, width=4096, depth=4)
    exact = {
        r.user_id: r.c
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")).collect()
        if r.c >= 78
    }
    got = {r.user_id: r.est_count for r in hh.collect()}
    assert got == exact


def test_cms_sketches_merge_by_addition(events, spark):
    """CMS is algebraic: counter-wise sum of two disjoint halves' sketches
    == the whole corpus's sketch (the streaming/windowed-merge contract)."""
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 2 == 1)
    merged = (
        cms_sketch(a, "user_id", width=256, depth=4)
        .unionAll(cms_sketch(b, "user_id", width=256, depth=4))
        .groupBy("row_idx", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_sketch(events, "user_id", width=256, depth=4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_build_single_exchange(events):
    st = plan_stats(cms_sketch(events, "user_id"))
    assert st.num_exchanges == 1, st.text[:3000]


# ---------------------------------------------------------------------------
# bloom semi-join
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )


@pytest.fixture(scope="module")
def building(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


@pytest.mark.parametrize("reproducible", [False, True])
def test_bloom_no_false_negatives(orders, building, reproducible):
    out = bloom_semi_join(orders, "o_custkey", building, "c_custkey",
                          num_bits=4096, num_hashes=5, reproducible=reproducible)
    true_sj = orders.join(
        building, orders.o_custkey == building.c_custkey, "left_semi"
    )
    assert true_sj.exceptAll(out).count() == 0


def test_bloom_false_positive_rate_bounded(orders, building):
    """FP rate ≈ (1 - e^(-kn/m))^k ≈ 0.3% at n=302, m=4096, k=5; allow 6x
    slack for hash nonuniformity on the small fixture."""
    out = bloom_semi_join(orders, "o_custkey", building, "c_custkey",
                          num_bits=4096, num_hashes=5)
    true_n = orders.join(
        building, orders.o_custkey == building.c_custkey, "left_semi"
    ).count()
    fp = out.count() - true_n
    assert fp >= 0
    assert fp <= 0.018 * orders.count(), fp


def test_bloom_bitmaps_merge_by_bit_or(building, spark):
    """Bitmap of A ∪ B == word-wise bit_or of the two bitmaps (idempotent —
    re-delivered rows are harmless)."""
    a = building.where(F.col("c_custkey") % 2 == 0)
    b = building.where(F.col("c_custkey") % 2 == 1)
    merged = (
        bloom_bits(a, "c_custkey", 4096, 5)
        .unionAll(bloom_bits(b, "c_custkey", 4096, 5))
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    whole = bloom_bits(building, "c_custkey", 4096, 5)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_probe_side_is_shuffle_free(orders, building):
    """The 100-TB contract: every exchange sits under the broadcast build
    subtree; the probe side is scan → broadcast-join → filter."""
    out = bloom_semi_join(orders, "o_custkey", building, "c_custkey")
    st = plan_stats(out)
    assert st.num_sortmerge_joins == 0
    assert len(re.findall(r"BroadcastNestedLoopJoin", st.text)) >= 1
    # 2 exchanges total, both on the (tiny) bitmap build side
    assert st.num_exchanges <= 2, st.text[:3000]
    # no Python anywhere — the whole pipeline is Catalyst expressions
    assert "EvalPython" not in st.text


# ---------------------------------------------------------------------------
# Log-histogram quantile sketch
# ---------------------------------------------------------------------------


def test_lh_small_values_exact(events):
    """Values below 2^(r+1) bin to themselves: quantiles over a small-value
    column are EXACT (percentile_disc semantics)."""
    from graph_stream_zoomer_spark.operators.sketches import quantile_sketch

    small = events.select((F.col("user_id") % 50).alias("v"))
    got = {
        r["q_ppm"]: r["value"]
        for r in quantile_sketch(small, "v", [250_000, 500_000, 900_000], r=5).collect()
    }
    exact = small.selectExpr(
        "percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS p25",
        "percentile_disc(0.50) WITHIN GROUP (ORDER BY v) AS p50",
        "percentile_disc(0.90) WITHIN GROUP (ORDER BY v) AS p90",
    ).first()
    assert got[250_000] == exact["p25"]
    assert got[500_000] == exact["p50"]
    assert got[900_000] == exact["p90"]


def test_lh_relative_error_bound(events):
    """For large values the returned quantile under-estimates the exact one
    by < 2^-r relative (the DDSketch guarantee, integer form)."""
    from graph_stream_zoomer_spark.operators.sketches import quantile_sketch

    r = 5
    big = events.select((F.col("user_id") * 977 + 13).alias("v"))
    qs = [100_000, 500_000, 990_000]
    got = {row["q_ppm"]: row["value"] for row in quantile_sketch(big, "v", qs, r=r).collect()}
    for q in qs:
        exact = big.selectExpr(
            f"percentile_disc({q/1e6}) WITHIN GROUP (ORDER BY v) AS p"
        ).first()["p"]
        assert got[q] <= exact, (q, got[q], exact)
        assert exact - got[q] < exact * 2 ** -r + 1, (q, got[q], exact)


def test_lh_grouped_matches_per_group(events):
    """Grouped sketch == independent per-group sketches."""
    from graph_stream_zoomer_spark.operators.sketches import quantile_sketch

    df = events.select("event_type", (F.col("user_id") * 31).alias("v"))
    got = {
        (r["event_type"], r["q_ppm"]): r["value"]
        for r in quantile_sketch(df, "v", [500_000], r=4, group_cols=["event_type"]).collect()
    }
    for et in [r["event_type"] for r in df.select("event_type").distinct().collect()]:
        solo = quantile_sketch(df.where(F.col("event_type") == et), "v", [500_000], r=4).first()
        assert got[(et, 500_000)] == solo["value"], et


def test_lh_sketches_merge_by_addition(events, spark):
    """sketch(A ∪ B) == per-bin count sum of sketch(A) and sketch(B) — the
    mergeability that makes the sketch windowed/rollup-friendly."""
    from graph_stream_zoomer_spark.operators.sketches import log_histogram

    df = events.select((F.col("user_id") * 7 + 1).alias("v"), "event_type")
    a = df.where(F.col("event_type") < "n")
    b = df.where(F.col("event_type") >= "n")
    merged = (
        log_histogram(a, "v", r=5)
        .unionAll(log_histogram(b, "v", r=5))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = log_histogram(df, "v", r=5)
    key = lambda r: (r["bin"], r["cnt"])
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))


def test_lh_single_exchange_and_guards(events):
    """Plan: ONE partially-aggregated exchange for the histogram build; the
    quantile read only moves sketch rows. Guards reject bad params and
    negative values."""
    from graph_stream_zoomer_spark.operators.sketches import (
        log_histogram,
        lh_quantiles,
        quantile_sketch,
    )

    hist = log_histogram(events.select((F.col("user_id") + 1).alias("v")), "v")
    st = plan_stats(hist)
    assert st.num_exchanges == 1, st.text[:2000]
    assert "partial" in st.text.lower(), st.text[:2000]

    with pytest.raises(ValueError, match="1 <= r <= 16"):
        log_histogram(events, "user_id", r=0)
    with pytest.raises(ValueError, match="q_ppm"):
        lh_quantiles(hist, [])
    with pytest.raises(ValueError, match="q_ppm"):
        lh_quantiles(hist, [2_000_000])
    neg = events.select((F.col("user_id") - 10_000_000).alias("v"))
    with pytest.raises(Exception, match="negative value"):
        quantile_sketch(neg, "v", [500_000]).collect()


def test_lh_nulls_skipped(spark):
    from graph_stream_zoomer_spark.operators.sketches import log_histogram

    df = spark.createDataFrame([(1,), (None,), (5,), (None,)], "v bigint")
    rows = log_histogram(df, "v", r=5).collect()
    assert sum(r["cnt"] for r in rows) == 2


def test_lh_bin_exact_above_double_precision(spark):
    """Binning must be exact over the full 63-bit range: Spark's `/` is
    DOUBLE division (lossy above 2^53), so the shift is taken from the
    binary string instead — pinned against Python integer arithmetic on
    2^60-scale values that straddle bucket boundaries."""
    from graph_stream_zoomer_spark.operators.sketches import log_histogram

    r = 5
    vals = []
    for e in (53, 57, 60, 62):
        base = 1 << e
        # boundary-straddling values: bucket edges are multiples of 2^(e-r)
        step = 1 << (e - r)
        vals += [base, base + step - 1, base + step, base + 3 * step + 7, (base << 1) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = {}
    for row in log_histogram(df, "v", r=r).collect():
        got[row["bin"]] = got.get(row["bin"], 0) + row["cnt"]

    def pybin(x):
        if x < 1 << (r + 1):
            return x
        e = x.bit_length() - 1
        return (e - r) * (1 << r) + (x >> (e - r))

    exp = {}
    for v in vals:
        exp[pybin(v)] = exp.get(pybin(v), 0) + 1
    assert got == exp


def test_lh_rank_split_identity(spark):
    """The overflow-safe split rank q·div(n,1e6) + ceil(q·mod(n,1e6)/1e6)
    equals ceil(q·n/1e6) exactly, including at n where the naive product
    q_ppm·n wraps past 2^63."""

    rows = []
    for n in (1, 7, 999_999, 1_000_000, 123_456_789, 9_300_000_000_000, 2**62):
        for q in (1, 250_000, 500_000, 999_999, 1_000_000):
            rows.append((q, n))
    got = spark.createDataFrame(rows, "q_ppm bigint, _n bigint").selectExpr(
        "q_ppm",
        "_n",
        "q_ppm * div(_n, 1000000) + div(q_ppm * pmod(_n, 1000000) + 999999, 1000000) AS rank",
    ).collect()
    for r_ in got:
        # exact integer ceil (math.ceil over a float quotient is itself
        # imprecise at 2^62 — Python big-int arithmetic is the oracle)
        assert r_["rank"] == -(-(r_["q_ppm"] * r_["_n"]) // 1_000_000), r_


def test_kmv_sketch_merge_estimate(events, spark):
    """KMV's mergeable form (the analog of HLL registers / CMS counters /
    bloom words): part sketches merge into exactly the whole corpus's
    sketch, and sketch→estimate equals the one-pass kmv_distinct
    bit-for-bit — including on overlapping parts (dedup is by hash)."""
    from graph_stream_zoomer_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch,
    )

    k = 64
    a = events.where(F.col("event_id") % 2 == 0)
    b = events.where(F.col("event_id") % 3 != 1)  # overlaps a
    parts = kmv_sketch(a, "user_id", k=k, group_cols=["event_type"]).unionAll(
        kmv_sketch(b, "user_id", k=k, group_cols=["event_type"])
    )
    merged = kmv_merge(parts, k=k, group_cols=["event_type"])
    whole = kmv_sketch(
        events.where((F.col("event_id") % 2 == 0) | (F.col("event_id") % 3 != 1)),
        "user_id",
        k=k,
        group_cols=["event_type"],
    )
    key = lambda r: (r["event_type"], list(r["kept"]))
    assert sorted(map(key, merged.collect())) == sorted(map(key, whole.collect()))
    # estimate from the sketch == the direct one-pass estimator
    est_s = kmv_estimate(
        kmv_sketch(events, "user_id", k=k, group_cols=["event_type"]),
        k=k,
        group_cols=["event_type"],
    )
    est_d = kmv_distinct(events, "user_id", k=k, group_cols=["event_type"])
    assert sorted(map(tuple, est_s.collect())) == sorted(map(tuple, est_d.collect()))
    # global (ungrouped) forms agree too
    gs = kmv_estimate(kmv_sketch(events, "user_id", k=k), k=k).first()[0]
    gd = kmv_distinct(events, "user_id", k=k).first()[0]
    assert gs == gd
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_sketch(events, "user_id", k=1)


def test_lh_bin_properties_random(spark):
    """Property pins over random 63-bit ints: binning is monotone
    non-decreasing in x, the representative lower-bounds x, and the
    relative gap is < 2^-r — checked against the Python model in one
    Spark pass (hypothesis supplies the adversarial sample)."""
    from hypothesis import given, settings, strategies as st

    from graph_stream_zoomer_spark.operators.sketches import _lh_bin, _lh_rep

    r = 5

    def pybin(x):
        if x < 1 << (r + 1):
            return x
        e = x.bit_length() - 1
        return (e - r) * (1 << r) + (x >> (e - r))

    def pyrep(b):
        if b < 1 << (r + 1):
            return b
        g = b // (1 << r) - 1
        return (b - g * (1 << r)) << g

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1),
                    min_size=1, max_size=40))
    def check(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v bigint")
        rows = df.select(
            "v", _lh_bin(F.col("v"), r).alias("b"),
            _lh_rep(_lh_bin(F.col("v"), r), r).alias("rep"),
        ).collect()
        for row in rows:
            assert row["b"] == pybin(row["v"]), row
            assert row["rep"] == pyrep(row["b"]), row
            assert row["rep"] <= row["v"]
            if row["v"] > 0:
                assert row["v"] - row["rep"] <= row["v"] * 2 ** -r, row
        svals = sorted(vals)
        sbins = sorted(pybin(v) for v in vals)
        assert [pybin(v) for v in svals] == sbins  # monotone

    check()
