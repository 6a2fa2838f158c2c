"""End-to-end ``spark-submit --py-files`` smoke test.

The north rule's deployment shape (BASELINE.json ``north_rule``) is
"run via spark-submit --py-files on a multi-executor cluster". This test
exercises exactly that surface: it builds the ``gsz.zip`` artifact the way
``scripts/package.py`` does, writes a small deterministic transcript
parquet, then launches the REAL ``spark-submit --py-files <zip>
scripts/run_streaming_job.py --available-now`` as a subprocess from a
neutral working directory with the repo stripped from ``PYTHONPATH`` — so
the ``graph_stream_zoomer_spark`` import must resolve from the shipped zip,
exactly as it would on a cluster where only ``--py-files`` distributes the
code. Asserts committed super-vertex/super-edge parquet and per-partition
lineage records.

Reference parity: the reference deploys via ``bin/flink run -c ...
<jar>`` (reference README.md:79-80); this is the Spark equivalent of that
packaged-artifact deployment test.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "run_streaming_job", os.path.join(REPO, "scripts", "run_streaming_job.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cli_window_kind_mapping():
    """--window-kind/--slide/--gap map onto the three WindowConfig kinds the
    north rule names (tumbling/sliding/session), and missing parameters
    fail fast instead of silently falling back to tumbling."""
    from graph_stream_zoomer_spark.config import WindowKind

    cli = _load_cli_module()
    base = ["--input", "/x", "--output", "/y"]
    p = cli.build_parser()

    cfg, op = cli.build_grouping(p.parse_args(base + ["--window", "300"]))
    assert cfg.window.kind == WindowKind.TUMBLING and cfg.window.size_s == 300

    cfg, _ = cli.build_grouping(
        p.parse_args(base + ["--window-kind", "sliding", "--window", "120", "--slide", "60"])
    )
    assert cfg.window.kind == WindowKind.SLIDING
    assert (cfg.window.size_s, cfg.window.slide_s) == (120, 60)

    cfg, _ = cli.build_grouping(
        p.parse_args(base + ["--window-kind", "session", "--gap", "1800"])
    )
    assert cfg.window.kind == WindowKind.SESSION and cfg.window.gap_s == 1800

    with pytest.raises(SystemExit):
        cli.build_grouping(p.parse_args(base + ["--window-kind", "sliding"]))
    with pytest.raises(SystemExit):
        cli.build_grouping(p.parse_args(base + ["--window-kind", "session"]))
    # contradictory flags fail fast too: --gap without session (or --slide
    # without sliding) must not silently run a tumbling window
    with pytest.raises(SystemExit):
        cli.build_grouping(p.parse_args(base + ["--gap", "1800"]))
    with pytest.raises(SystemExit):
        cli.build_grouping(p.parse_args(base + ["--window-kind", "session", "--gap", "60", "--slide", "30"]))


def _build_zip(dest: str) -> str:
    out = os.path.join(dest, "gsz.zip")
    pkg = os.path.join(REPO, "graph_stream_zoomer_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return out


@pytest.mark.skipif(shutil.which("spark-submit") is None, reason="no spark-submit on PATH")
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    from graph_stream_zoomer_spark.sources.transcripts import generate_transcripts

    input_dir = str(tmp_path / "input")
    out_root = str(tmp_path / "out")
    generate_transcripts(spark, 300, num_partitions=4).write.parquet(input_dir)
    n_turns = spark.read.parquet(input_dir).count()
    assert n_turns > 0

    zip_path = _build_zip(str(tmp_path))
    script = os.path.join(str(tmp_path), "run_streaming_job.py")
    shutil.copy(os.path.join(REPO, "scripts", "run_streaming_job.py"), script)

    env = dict(os.environ)
    # strip the repo from the import path: the zip must be the code source
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep) if p and REPO not in p
    )
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.driver.memory=2g",
            "--py-files", zip_path,
            script,
            "--input", input_dir,
            "--output", out_root,
            "--vertex-keys", ":label",
            "--edge-keys", ":label",
            "--vertex-aggs", "count,avg:text_len",
            "--edge-aggs", "count",
            "--window", "600",
            "--available-now",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "done:" in proc.stdout, proc.stdout[-2000:]

    # committed output readable and non-empty, schema as the job promises
    sv = spark.read.parquet(os.path.join(out_root, "vertices", "data"))
    se = spark.read.parquet(os.path.join(out_root, "edges", "data"))
    assert sv.count() > 0 and se.count() > 0
    assert {"window_start", "window_end", "vertex_label", "count", "avg_text_len"} <= set(
        sv.columns
    )

    # per-partition lineage was recorded by the subprocess job
    lineage = os.path.join(out_root, "vertices", "_lineage", "lineage.jsonl")
    recs = [json.loads(l) for l in open(lineage)]
    assert recs and all("batch_id" in r for r in recs)
    committed = json.load(open(os.path.join(out_root, "vertices", "_lineage", "commits.json")))
    assert committed  # at least one transactional commit
