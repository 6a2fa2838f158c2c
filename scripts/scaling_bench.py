"""Scaling-efficiency evidence for the north rule.

The rule requires throughput scaling efficiency ≥ 0.8 between cluster sizes
N and 4N executors. No real cluster exists in this sandbox, so the evidence
protocol (per driver instruction) is: run the SAME job on the SAME input at
local[8] and local[32] and report throughput at both plus
efficiency = (throughput_32 / throughput_8) / 4.

Each parallelism level runs in a fresh subprocess (own JVM) so JIT/caches
don't leak between levels. Two jobs are measured:
  - batch: the flagship windowed graph grouping over synthetic transcripts
  - streaming: the full streaming job (stream-stream successor join →
    watermarked dedup → windowed agg → idempotent sink), availableNow over
    a pre-written parquet input

Writes BENCH.md at the repo root.

Usage:  python scripts/scaling_bench.py            # orchestrate both levels
        python scripts/scaling_bench.py worker N   # internal
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS_BATCH = int(os.environ.get("GSZ_SCALE_BATCH_CONVS", "1000000"))
N_CONVS_STREAM = int(os.environ.get("GSZ_SCALE_STREAM_CONVS", "100000"))
LEVELS = (8, 32)


def worker(cpus: int, input_dir: str) -> None:
    from pyspark.sql import SparkSession

    from graph_stream_zoomer_spark import Count, AvgProperty, StreamGraphConfig, WindowConfig
    from graph_stream_zoomer_spark.operators.grouping import GroupingBuilder
    from graph_stream_zoomer_spark.sources.transcripts import generate_transcripts, transcript_graph
    from graph_stream_zoomer_spark.streaming.job import read_transcript_stream, run_grouping_job

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"gsz-scaling-{cpus}")
        .config("spark.sql.shuffle.partitions", "64")  # FIXED across levels: strong scaling varies only the worker threads, not the partitioning
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    cfg = StreamGraphConfig(window=WindowConfig.tumbling(600, "SECONDS"))
    op = (
        GroupingBuilder()
        .add_vertex_grouping_key(":label")
        .add_vertex_aggregate_function(Count())
        .add_vertex_aggregate_function(AvgProperty("text_len"))
        .add_edge_grouping_key(":label")
        .add_edge_aggregate_function(Count())
        .set_window_config(cfg.window)
        .set_config(cfg)
        .build()
    )

    # ---- batch flagship --------------------------------------------------
    t = generate_transcripts(spark, N_CONVS_BATCH, num_partitions=64)
    n_turns = t.count()
    t0 = time.time()
    out = transcript_graph(t, cfg, use_arrow=False).apply(op)
    rows = out.vertices.count() + out.edges.count()
    batch_s = time.time() - t0

    # ---- streaming job ---------------------------------------------------
    stream_turns = spark.read.parquet(os.path.join(input_dir, "turns"))
    n_stream_turns = stream_turns.count()
    out_root = tempfile.mkdtemp(prefix=f"gsz_scale_{cpus}_")
    t0 = time.time()
    stream = read_transcript_stream(spark, os.path.join(input_dir, "turns"))
    run_grouping_job(spark, stream, op, out_root)
    stream_s = time.time() - t0
    shutil.rmtree(out_root, ignore_errors=True)

    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "batch_turns": n_turns,
                "batch_s": round(batch_s, 2),
                "batch_tps": round(n_turns / batch_s, 1),
                "out_rows": rows,
                "stream_turns": n_stream_turns,
                "stream_s": round(stream_s, 2),
                "stream_tps": round(n_stream_turns / stream_s, 1),
            }
        )
    )
    spark.stop()


def orchestrate() -> None:
    # one shared streaming input for all levels
    from pyspark.sql import SparkSession

    from graph_stream_zoomer_spark.sources.transcripts import generate_transcripts

    input_dir = tempfile.mkdtemp(prefix="gsz_scale_input_")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    generate_transcripts(spark, N_CONVS_STREAM, num_partitions=64).write.parquet(
        os.path.join(input_dir, "turns")
    )
    spark.stop()

    results = {}
    for cpus in LEVELS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker", str(cpus), input_dir],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("WORKER_RESULT ")]
        if not line:
            print(p.stdout[-3000:], file=sys.stderr)
            print(p.stderr[-3000:], file=sys.stderr)
            raise RuntimeError(f"worker local[{cpus}] failed")
        results[cpus] = json.loads(line[0].removeprefix("WORKER_RESULT "))
    shutil.rmtree(input_dir, ignore_errors=True)

    lo, hi = LEVELS
    factor = hi / lo
    eff_batch = (results[hi]["batch_tps"] / results[lo]["batch_tps"]) / factor
    eff_stream = (results[hi]["stream_tps"] / results[lo]["stream_tps"]) / factor
    md = f"""# BENCH — throughput & scaling evidence

Machine: single host, Spark local mode (each level = fresh JVM, same input).
Protocol per driver instruction: same job, same input, local[{lo}] vs
local[{hi}]; efficiency = (tps_{hi} / tps_{lo}) / {int(factor)}.

## Flagship: windowed graph grouping (batch, {results[lo]['batch_turns']:,} turns)

| parallelism | wall s | grouped turns/sec |
|---|---|---|
| local[{lo}] | {results[lo]['batch_s']} | {results[lo]['batch_tps']:,.0f} |
| local[{hi}] | {results[hi]['batch_s']} | {results[hi]['batch_tps']:,.0f} |

**Batch scaling efficiency ({lo}→{hi} cores): {eff_batch:.2f}**

## Streaming job (stream-stream successor join → watermarked dedup →
windowed agg → idempotent sink; {results[lo]['stream_turns']:,} turns, availableNow)

| parallelism | wall s | turns/sec |
|---|---|---|
| local[{lo}] | {results[lo]['stream_s']} | {results[lo]['stream_tps']:,.0f} |
| local[{hi}] | {results[hi]['stream_s']} | {results[hi]['stream_tps']:,.0f} |

**Streaming scaling efficiency ({lo}→{hi} cores): {eff_stream:.2f}**

Raw: `{json.dumps(results)}`

Notes on reading these numbers: local-mode scaling under-states cluster
scaling — all {hi} threads share one JVM heap, one shuffle disk, and one
driver; a real 4N-executor cluster adds memory bandwidth and I/O in
proportion. The plan itself is partition-parallel end to end (hash
aggregations with map-side combine, joinless edge expansion, no
driver-side loops or collects), so the partition count — not any
single-threaded stage — is the scaling unit.
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3])
    else:
        orchestrate()
