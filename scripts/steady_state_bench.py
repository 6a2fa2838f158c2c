"""Steady-state streaming throughput scaling — the drain-artifact-free
evidence for the north rule's ≥0.8 N→4N criterion.

The availableNow protocol in scaling_bench.py measures a whole drain:
startup + one giant data batch + the window-close no-data batch. The
fixed (non-scaling) parts of that — query startup/teardown and the
close batch's state machinery — cap the measurable 2→8 ratio at
(4C+F)/(4C+4F) ≈ 0.7 for the main recipe even under perfectly linear
compute (BENCH.md per-batch probe), which is an artifact of measuring a
BOUNDED drain: the north rule's 10^12-turn regime is a continuous job
where micro-batches follow each other indefinitely and the fixed parts
amortize to zero.

This protocol measures that regime directly: the input is split into K
time-ordered chunks, the job runs unified (one query) with
maxFilesPerTrigger so the drain becomes a SEQUENCE of data micro-batches,
and throughput is computed ONLY over the steady-state batches — batch 0
(JIT/state-store init) and the trailing no-data close batch are excluded,
exactly as they would vanish from a continuous job's long-run rate.
Per-batch input rows and triggerExecution wall times come from the
engine's own StreamingQueryProgress via ProgressListener.

Same discipline as scaling_bench.py otherwise: fresh taskset-pinned JVM
per level visit, interleaved (2, 8) pairs, fixed state partitions, median
of pair ratios.

Usage:  python scripts/steady_state_bench.py             # orchestrate
        python scripts/steady_state_bench.py worker N <in> # internal
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONVS = int(os.environ.get("GSZ_STEADY_CONVS", "480000"))
N_CHUNKS = int(os.environ.get("GSZ_STEADY_CHUNKS", "24"))
FILES_PER_TRIGGER = int(os.environ.get("GSZ_STEADY_FPT", "3"))  # → 8 data batches
# N vs 4N pinned cores. Overridable: a (1,4) pair sits even deeper inside
# the VM's near-perfect-concurrency range than (2,8), shrinking the
# small-set turbo artifact the hw probe measures.
LEVELS = tuple(
    int(x) for x in os.environ.get("GSZ_STEADY_LEVELS", "2,8").split(",")
)
REPS = int(os.environ.get("GSZ_STEADY_REPS", "2"))
STREAM_PARTITIONS = 8


def build_input(path: str) -> None:
    """Write the transcript turns as N_CHUNKS time-ordered parquet chunk
    dirs with strictly increasing mtimes (the file source processes files
    in mtime order; out-of-order chunks would advance the watermark past
    later chunks and drop their rows as late — changing the work done)."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from graph_stream_zoomer_spark.sources.transcripts import generate_transcripts

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    turns = generate_transcripts(spark, N_CONVS).persist()
    lo, hi = turns.agg(
        F.min("ts").cast("long"), F.max("ts").cast("long")
    ).first()
    span = (hi - lo + 1) / N_CHUNKS
    for i in range(N_CHUNKS):
        chunk = turns.where(
            (F.col("ts").cast("long") >= lo + i * span)
            & (F.col("ts").cast("long") < lo + (i + 1) * span)
        )
        # ONE file per chunk: a trigger boundary through a multi-file chunk
        # would process part of the chunk's time range, advance the
        # watermark to its max, and drop the remainder as late (chunk part
        # files each span the whole chunk range after the shuffle)
        chunk.coalesce(1).write.mode("overwrite").parquet(f"{path}/c{i:03d}.tmp")
        for f in sorted(os.listdir(f"{path}/c{i:03d}.tmp")):
            if f.endswith(".parquet"):
                os.replace(f"{path}/c{i:03d}.tmp/{f}", f"{path}/c{i:03d}_{f}")
        shutil.rmtree(f"{path}/c{i:03d}.tmp")
        time.sleep(1.05)  # distinct mtimes → deterministic processing order
    n = spark.read.parquet(path).count()
    print(f"INPUT_READY turns={n}", flush=True)
    spark.stop()


def worker(cpus: int, input_dir: str) -> None:
    from pyspark.sql import SparkSession

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scaling_bench import _hw_probe

    hw = _hw_probe(cpus)

    from graph_stream_zoomer_spark import (
        AvgProperty,
        Count,
        StreamGraphConfig,
        WindowConfig,
    )
    from graph_stream_zoomer_spark.operators.grouping import GroupingBuilder
    from graph_stream_zoomer_spark.streaming.job import (
        read_transcript_stream,
        run_grouping_job,
    )

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"gsz-steady-{cpus}")
        .config("spark.sql.shuffle.partitions", str(STREAM_PARTITIONS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cpus)}",
        )
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
    out_root = tempfile.mkdtemp(prefix=f"gsz_steady_{cpus}_")
    stream = read_transcript_stream(
        spark, input_dir, max_files_per_trigger=FILES_PER_TRIGGER
    )
    res = run_grouping_job(spark, stream, op, out_root, unified=True)
    shutil.rmtree(out_root, ignore_errors=True)

    batches = [
        {
            "batch_id": p["batch_id"],
            "rows": p["num_input_rows"],
            "trigger_ms": p["duration_ms"].get("triggerExecution"),
        }
        for p in res.listener.progress
    ]
    # steady state: data batches only (the trailing no-data close batch and
    # any empty triggers drop out). Two cuts: "steady" excludes batch 0
    # (state-store provider init); "tail" additionally drops the next two
    # batches — JIT compilation spreads over the early batches and costs
    # roughly fixed CPU, i.e. a larger WALL share at 2 cores, biasing the
    # ratio down.
    data = [b for b in batches if b["rows"] > 0 and b["trigger_ms"]]
    steady = [b for b in data if b["batch_id"] > 0]
    tail = [b for b in data if b["batch_id"] > 2]

    def agg(bs):
        rows = sum(b["rows"] for b in bs)
        secs = sum(b["trigger_ms"] for b in bs) / 1000.0
        return rows, round(secs, 2), round(rows / secs, 1) if secs else None

    s_rows, s_secs, s_tps = agg(steady)
    t_rows, t_secs, t_tps = agg(tail)
    print(
        "WORKER_RESULT "
        + json.dumps(
            {
                "cpus": cpus,
                "steady_batches": len(steady),
                "steady_rows": s_rows,
                "steady_s": s_secs,
                "steady_tps": s_tps,
                "tail_batches": len(tail),
                "tail_tps": t_tps,
                "batches": batches,
                **hw,
            }
        ),
        flush=True,
    )
    spark.stop()


def orchestrate() -> None:
    input_dir = tempfile.mkdtemp(prefix="gsz_steady_in_")
    subprocess.run(
        [sys.executable, __file__, "build", input_dir], check=True
    )
    pairs = []
    for rep in range(REPS):
        visit = []
        for cpus in LEVELS:
            mask = f"0-{cpus - 1}"
            out = subprocess.run(
                ["taskset", "-c", mask, sys.executable, __file__, "worker", str(cpus), input_dir],
                check=True,
                capture_output=True,
                text=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("WORKER_RESULT")][-1]
            r = json.loads(line[len("WORKER_RESULT ") :])
            visit.append(r)
            print(f"rep{rep} cpus={cpus}: steady {r['steady_tps']} tps, "
                  f"tail {r['tail_tps']} tps, hw {r['hw_tps']} units/s; "
                  f"batches {[(b['batch_id'], b['rows'], b['trigger_ms']) for b in r['batches']]}",
                  flush=True)
            r.pop("batches", None)
        pairs.append(visit)
        factor = LEVELS[1] / LEVELS[0]
        ratio = (visit[1]["steady_tps"] / visit[0]["steady_tps"]) / factor
        t_ratio = (visit[1]["tail_tps"] / visit[0]["tail_tps"]) / factor
        hw_granted = (visit[1]["hw_tps"] / visit[0]["hw_tps"]) / factor
        print(
            f"PAIR {rep}: steady eff {ratio:.3f}, tail eff {t_ratio:.3f}, "
            f"hw granted {hw_granted:.3f}, tail hw-normalized {t_ratio / hw_granted:.3f}",
            flush=True,
        )
    factor = LEVELS[1] / LEVELS[0]

    def effs(key):
        return [(p[1][key] / p[0][key]) / factor for p in pairs]

    hw = effs("hw_tps")
    print(
        "FINAL "
        + json.dumps(
            {
                "levels": LEVELS,
                "pairs": pairs,
                "steady_effs": [round(e, 3) for e in effs("steady_tps")],
                "tail_effs": [round(e, 3) for e in effs("tail_tps")],
                "hw_granted": [round(e, 3) for e in hw],
                "steady_eff_median": round(statistics.median(effs("steady_tps")), 3),
                "tail_eff_median": round(statistics.median(effs("tail_tps")), 3),
                "tail_eff_hw_normalized_median": round(
                    statistics.median(
                        e / h for e, h in zip(effs("tail_tps"), hw)
                    ),
                    3,
                ),
            }
        ),
        flush=True,
    )
    shutil.rmtree(input_dir, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3])
    elif len(sys.argv) > 1 and sys.argv[1] == "build":
        build_input(sys.argv[2])
    else:
        orchestrate()
