"""Exactly-once summary sink + lineage/metrics bookkeeping.

North-rule requirement: an idempotent exactly-once sink keyed by
(window, group-key), resumable from checkpoint with per-partition lineage
and metrics.

Design: the summary stream runs in append mode, so a (window, group-key) row
is emitted exactly once per successful epoch — but a micro-batch can be
*re-executed* after a failure with the same batchId. Idempotence therefore
needs a transactional "already committed?" guard per batchId, plus a write
that can be safely repeated:

  - ``IcebergMergeSink``: when an Iceberg catalog is configured, foreachBatch
    issues ``MERGE INTO sink USING batch ON (window_start, group_key)`` —
    natively idempotent under Iceberg's snapshot isolation. (No Iceberg jars
    ship in this sandbox, so this path is config-gated and untested here;
    the contract is identical to the parquet fallback.)
  - ``IdempotentParquetSink`` (sandbox default): writes each micro-batch to
    ``data/batch_id=<id>/`` via a rename-commit (tmp dir + atomic rename) and
    records the batchId in a commit log; a re-delivered batchId is skipped.
    Readers see exactly-once rows because every (window, group-key) appears
    in exactly one committed batch directory (append-mode uniqueness) and
    uncommitted tmp dirs are ignored.

Lineage/metrics: every commit appends a JSON line with batchId, row count,
per-partition row counts (computed with spark_partition_id — the
"per-partition lineage"), wall time, and input watermark, to
``_lineage/lineage.jsonl`` under the sink root. A StreamingQueryListener
mirror captures engine-side progress (rows/sec, state store size).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class SinkMetrics:
    batches: list[dict] = field(default_factory=list)


class IdempotentParquetSink:
    """foreachBatch sink with batchId-transactional parquet commits.

    LOCAL-FILESYSTEM SANDBOX SINK: the commit log, rename-commit, and
    parquet-footer lineage all use POSIX paths (os.listdir / os.replace /
    local pyarrow reads), which is correct only when the sink root is a
    local directory visible to the driver. On a real cluster the sink root
    is object storage — use ``IcebergMergeSink`` there (the production
    path; identical exactly-once contract). A non-local root raises
    immediately rather than failing mid-stream."""

    def __init__(self, root: str, key_cols: list[str] | None = None, transform=None) -> None:
        """``transform``: optional DataFrame→DataFrame applied to each batch
        before commit — used for the salted final merge (merge_partials)."""
        scheme = root.split("://", 1)[0] if "://" in root else ""
        if scheme not in ("", "file"):
            raise ValueError(
                f"IdempotentParquetSink needs a local filesystem root "
                f"(got scheme {scheme!r}): its commit log and footer-derived "
                f"lineage are POSIX-path based. Use IcebergMergeSink for "
                f"object-store deployments."
            )
        self.transform = transform
        # strip the scheme BEFORE deriving sub-paths: os.path.join on a
        # "file://…" string builds a RELATIVE "file:/…" tree under the cwd
        self.root = root.removeprefix("file://")
        self.data_dir = os.path.join(self.root, "data")
        self.lineage_dir = os.path.join(self.root, "_lineage")
        self.commits_path = os.path.join(self.lineage_dir, "commits.json")
        self.lineage_path = os.path.join(self.lineage_dir, "lineage.jsonl")
        self.key_cols = key_cols
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)
        self.metrics = SinkMetrics()

    # -- commit log -------------------------------------------------------
    def _committed(self) -> set[int]:
        if not os.path.exists(self.commits_path):
            return set()
        with open(self.commits_path) as f:
            return set(json.load(f))

    def _record_commit(self, batch_id: int) -> None:
        committed = self._committed() | {batch_id}
        tmp = self.commits_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(sorted(committed), f)
        os.replace(tmp, self.commits_path)

    # -- foreachBatch body --------------------------------------------------
    @staticmethod
    def _footer_counts(written_dir: str) -> dict[int, int]:
        """Per-partition row counts from the written part files' parquet
        footers — metadata-only reads, no Spark job. The part index in the
        filename IS the task partition index, so this reproduces the
        spark_partition_id breakdown the lineage contract promises."""
        import re as _re

        import pyarrow.parquet as pq

        counts: dict[int, int] = {}
        for name in os.listdir(written_dir):
            m = _re.match(r"part-(\d+)", name)
            if not m or not name.endswith(".parquet"):
                continue
            n = pq.ParquetFile(os.path.join(written_dir, name)).metadata.num_rows
            if n:
                counts[int(m.group(1))] = int(n)
        return counts

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # replayed batch after restart — idempotent skip
        t0 = time.time()
        if self.transform is not None:
            batch = self.transform(batch)
        flat = flatten_window(batch)
        target = os.path.join(self.data_dir, f"batch_id={batch_id}")
        tmp = target + ".tmp"
        # Every action on a foreachBatch DataFrame re-executes the whole
        # micro-batch plan (stateful join + agg included), so the write is
        # the ONE action per batch: it executes the plan exactly once, and
        # the lineage row counts come from the written files' parquet
        # footers (metadata reads) instead of a second count job over a
        # persisted copy of the summary rows.
        flat.write.mode("overwrite").parquet(tmp)
        part_counts = self._footer_counts(tmp)
        n_rows = int(sum(part_counts.values()))
        if n_rows:
            if os.path.exists(target):  # crashed after write, before commit log
                import shutil

                shutil.rmtree(target)
            os.replace(tmp, target)
        else:
            # empty batches (e.g. the first availableNow batch, where the
            # watermark has not yet closed any window) commit in the log but
            # leave no data dir — read() tolerates the missing dir
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
        self._record_commit(batch_id)
        rec = {
            "batch_id": batch_id,
            "rows": n_rows,
            "partitions": part_counts,
            "wall_s": round(time.time() - t0, 3),
            "committed_at": time.time(),
        }
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self.metrics.batches.append(rec)

    def read(self, spark: SparkSession) -> DataFrame:
        committed = self._committed()
        paths = [
            p
            for b in sorted(committed)
            if os.path.exists(p := os.path.join(self.data_dir, f"batch_id={b}"))
        ]  # empty batches commit without a data dir
        if not paths:
            return None
        return spark.read.parquet(*paths)


class IcebergMergeSink:
    """foreachBatch MERGE INTO an Iceberg table keyed (window_start, key).

    Requires an Iceberg-enabled SparkSession (spark.sql.catalog.* configured
    with iceberg-spark-runtime on the classpath). MERGE makes re-delivered
    batches no-ops on matching keys, giving exactly-once without a separate
    commit log.
    """

    def __init__(self, table: str, key_cols: list[str]) -> None:
        if not key_cols:
            raise ValueError("IcebergMergeSink needs at least one key column")
        self.table = table
        self.key_cols = key_cols

    def merge_sql(self, columns: list[str], source_view: str = "_gsz_batch") -> str:
        """The MERGE statement issued per micro-batch — exposed so the
        contract (idempotent upsert keyed on key_cols, full-row update on
        match, insert otherwise) is unit-testable without Iceberg jars."""
        missing = [c for c in self.key_cols if c not in columns]
        if missing:
            raise ValueError(f"batch is missing key columns {missing} (has {columns})")
        non_keys = [c for c in columns if c not in self.key_cols]
        if not non_keys:
            raise ValueError("MERGE needs at least one non-key column to update")
        on = " AND ".join(f"t.{c} = s.{c}" for c in self.key_cols)
        set_cols = ", ".join(f"{c} = s.{c}" for c in non_keys)
        return (
            f"MERGE INTO {self.table} t\n"
            f"USING {source_view} s\n"
            f"ON {on}\n"
            f"WHEN MATCHED THEN UPDATE SET {set_cols}\n"
            f"WHEN NOT MATCHED THEN INSERT *"
        )

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        flat = flatten_window(batch)
        flat.createOrReplaceTempView("_gsz_batch")
        spark.sql(self.merge_sql(flat.columns))


def flatten_window(df: DataFrame) -> DataFrame:
    """window struct → (window_start, window_end) columns (parquet/Iceberg
    friendly key columns)."""
    if "window" not in df.columns:
        return df
    return df.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in df.columns if c != "window"],
    ).drop("window")


class ProgressListener:
    """StreamingQueryListener capturing per-batch engine metrics
    (input rows, processed rows/sec, state rows) into a list of dicts."""

    def __init__(self) -> None:
        self.progress: list[dict] = []

    def attach(self, spark: SparkSession) -> None:
        from pyspark.sql.streaming import StreamingQueryListener

        outer = self

        class _L(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                p = event.progress
                outer.progress.append(
                    {
                        "batch_id": p.batchId,
                        "num_input_rows": p.numInputRows,
                        "processed_rows_per_sec": p.processedRowsPerSecond,
                        # per-phase wall times (triggerExecution = the whole
                        # batch) — the basis for steady-state throughput
                        # measurements that exclude startup/drain fixed cost
                        "duration_ms": dict(getattr(p, "durationMs", {}) or {}),
                        "state_operators": len(p.stateOperators),
                        # per-operator state detail: the runtime evidence for
                        # state-size claims (e.g. the slim pre-join projection
                        # keeping text payloads out of join state). Guarded
                        # per-field: availability varies by operator kind.
                        "state_detail": [
                            {
                                "operator": getattr(so, "operatorName", None),
                                "rows_total": getattr(so, "numRowsTotal", None),
                                "rows_updated": getattr(so, "numRowsUpdated", None),
                                "memory_bytes": getattr(
                                    so, "memoryUsedBytes", None
                                ),
                            }
                            for so in p.stateOperators
                        ],
                        # per-partition lineage: each source's committed
                        # offset range for this batch (file-stream batch
                        # indices here; Kafka topic-partition offsets on a
                        # real cluster) — together with the checkpoint
                        # offset log this is the resume-evidence trail the
                        # north rule asks for ("per-partition lineage and
                        # metrics").
                        "sources": [
                            {
                                "description": getattr(s, "description", None),
                                "start_offset": getattr(s, "startOffset", None),
                                "end_offset": getattr(s, "endOffset", None),
                                "num_input_rows": getattr(s, "numInputRows", None),
                            }
                            for s in getattr(p, "sources", [])
                        ],
                    }
                )

            def onQueryTerminated(self, event):
                pass

            def onQueryIdle(self, event):
                pass

        self._listener = _L()
        spark.streams.addListener(self._listener)

    def detach(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self._listener)

    def state_summary(self) -> dict[str, dict]:
        """Peak per-operator state footprint across the run: {operator:
        {peak_rows, peak_bytes, batches}} — the number you watch when
        deciding state-store backend (heap vs RocksDB) and validating
        that state carries only the columns it should."""
        out: dict[str, dict] = {}
        for batch in self.progress:
            for so in batch.get("state_detail", []):
                name = so["operator"] or "unknown"
                cur = out.setdefault(
                    name, {"peak_rows": 0, "peak_bytes": 0, "batches": 0}
                )
                cur["batches"] += 1
                if so["rows_total"] is not None:
                    cur["peak_rows"] = max(cur["peak_rows"], so["rows_total"])
                if so["memory_bytes"] is not None:
                    cur["peak_bytes"] = max(cur["peak_bytes"], so["memory_bytes"])
        return out
