"""Trailing z-score rate anomalies — operators/anomaly.py."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest

from graph_stream_zoomer_spark.operators.anomaly import rate_anomalies


def _events(spark):
    base = datetime(2024, 1, 1)
    rows = []
    # key 'a': 12 baseline buckets alternating 9/11 events, then a 100-spike
    for b in range(12):
        for i in range(9 if b % 2 == 0 else 11):
            rows.append(("a", base + timedelta(seconds=60 * b + i)))
    for i in range(100):
        rows.append(("a", base + timedelta(seconds=60 * 12 + i % 60)))
    # key 'b': constant rate → zero variance → never scored
    for b in range(14):
        for i in range(5):
            rows.append(("b", base + timedelta(seconds=60 * b + i)))
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


def test_rate_anomalies_flags_spike_exactly(spark):
    out = rate_anomalies(
        _events(spark), bucket_seconds=60, trailing=12, min_trailing=3
    )
    rows = {(r.event_type, r.bucket_start): r for r in out.collect()}
    t0 = int(datetime(2024, 1, 1).timestamp())
    spike = rows[("a", t0 + 60 * 12)]
    # closed form over exact sums: s=120 s2=1212 n=12 → var=12/11
    want_z = round(90 / math.sqrt(12 / 11), 5)
    assert spike.n_events == 100 and spike.trailing_n == 12
    assert spike.z_score == pytest.approx(want_z) and spike.is_anomaly
    # warm-up buckets (< min_trailing predecessors) are unscored
    assert rows[("a", t0)].z_score is None and not rows[("a", t0)].is_anomaly
    assert rows[("a", t0 + 60)].z_score is None
    # steady baseline buckets are scored but not flagged
    mid = rows[("a", t0 + 60 * 8)]
    assert mid.z_score is not None and not mid.is_anomaly
    # zero-variance key never scores
    assert all(
        rows[("b", t0 + 60 * b)].z_score is None
        and not rows[("b", t0 + 60 * b)].is_anomaly
        for b in range(14)
    )
    with pytest.raises(ValueError):
        rate_anomalies(_events(spark), trailing=2, min_trailing=3)


def test_rate_anomalies_single_exchange(spark):
    """The groupBy rides the repartition(key) exchange (subset clustering)
    and the trailing window rides the same one — 1 exchange end-to-end."""
    from graph_stream_zoomer_spark.plans.inspect import plan_stats

    st = plan_stats(rate_anomalies(_events(spark)))
    assert st.num_exchanges == 1, st.text[:3000]
    assert "SinglePartition" not in st.text
    assert "EvalPython" not in st.text  # no Python UDFs in the plan


def test_rate_anomalies_foreachbatch_form_matches_batch(spark, tmp_path):
    """The documented streaming shape: the same function inside
    foreachBatch over a bucket-complete slice emits byte-identical rows
    to the batch run."""
    src = str(tmp_path / "ev")
    _events(spark).write.parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    out = str(tmp_path / "out")

    def sink(bdf, _bid):
        rate_anomalies(bdf, bucket_seconds=60).write.mode("append").parquet(out)

    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(map(tuple, rate_anomalies(batch, bucket_seconds=60).collect()))
    assert got == want and len(got) > 0
