"""Keyed-state session-window merge via ``applyInPandasWithState`` — the
flatMapGroupsWithState-style final-merge stage.

The built-in ``F.session_window`` path (streaming/pipeline.py) covers the
default case; this operator is the explicit keyed-state alternative for
when session semantics outgrow the built-in (custom eviction, per-key gap,
emit-on-update). Reference parity target is the same windowed grouping
contract (impl/algorithm/GraphStreamGrouping.java:180-185) with session
windows substituted for tumbling ones; the reference itself has no session
windows (README.md:85-87 lists them as future work), so goldens come from
our batch engine.

Design (per grouping key, all state Arrow-serialized):

  state = (starts[], lasts[], partials[] flattened with one stride per
  aggregate slot). Each micro-batch merges its rows into the open-session
  list (classic interval merge: an event extends a session when it falls
  within ``gap`` of the session's last event), emits every session whose
  ``last + gap`` the watermark has passed (append semantics — each session
  exactly once), keeps the rest, and arms an event-time timeout at the
  earliest pending close so idle keys still flush when the watermark
  advances on no-data micro-batches.

Aggregates reuse the decomposed partial/merge forms of
operators/aggregation.py: count→sum, avg→(sum,cnt), min/max/sum native;
NaN is the "no value yet" sentinel inside a slot (SQL null out).

Scale: state per key is O(open sessions), not O(events); the shuffle is the
single groupBy(key) exchange; batch→state transfer is Arrow-batched with no
per-row Python objects.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    from ..operators.grouping import GraphStreamGrouping

STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
        StructField("partials", ArrayType(DoubleType())),  # n_sessions × n_slots
    ]
)


def _slot_spec(aggs) -> list[tuple[str, str]]:
    """[(slot_name, merge_kind)] per aggregate, mirroring
    AggregateFunction.partial_exprs order."""
    slots: list[tuple[str, str]] = []
    for a in aggs:
        if a.kind == "count":
            slots.append((f"_s_{a.output_key}", "sum"))
        elif a.kind == "avg":
            slots.append((f"_s_{a.output_key}_sum", "sum"))
            slots.append((f"_s_{a.output_key}_cnt", "sum"))
        else:
            slots.append((f"_s_{a.output_key}", a.kind))
    return slots or [("_s__group_size", "sum")]


def _merge_slot(kind: str, a: float, b: float) -> float:
    if math.isnan(a):
        return b
    if math.isnan(b):
        return a
    if kind == "sum":
        return a + b
    if kind == "min":
        return min(a, b)
    return max(a, b)


def stateful_session_summaries(
    op: "GraphStreamGrouping", vertices: DataFrame
) -> DataFrame:
    """Session-window vertex grouping with explicit keyed state.

    ``vertices``: watermarked vertex-observation stream (vertex_id,
    event_time, vertex_label, vertex_properties). Returns the super-vertex
    summary stream (append mode), same shape as the built-in session path.
    """
    from .pipeline import _project_super_vertices

    assert op.window.gap_s is not None, "stateful session merge needs a session window"
    # microseconds: Spark timestamps are us-resolution internally; ms-truncated
    # state would mis-merge sessions whose gap boundary falls between ms ticks
    gap_us = int(round(op.window.gap_s * 1_000_000))

    enhanced = op.enhance_vertices(vertices)
    group_cols = op._vertex_group_cols()
    aggs = op.vertex_aggs
    slots = _slot_spec(aggs)
    n_slots = len(slots)

    # per-row partial inputs, one double column per slot
    row_exprs: list = []
    for a in aggs:
        c = F.col(op._agg_in(a)) if a.property_key else None
        if a.kind == "count":
            row_exprs.append(F.lit(1.0).alias(f"_s_{a.output_key}"))
        elif a.kind == "avg":
            row_exprs.append(c.cast("double").alias(f"_s_{a.output_key}_sum"))
            row_exprs.append(
                F.when(c.isNotNull(), 1.0).otherwise(0.0).alias(f"_s_{a.output_key}_cnt")
            )
        else:
            row_exprs.append(c.cast("double").alias(f"_s_{a.output_key}"))
    if not aggs:
        row_exprs.append(F.lit(1.0).alias("_s__group_size"))

    keyed = enhanced.select(
        *group_cols, F.col("event_time"), *row_exprs
    )

    key_fields = [keyed.schema[c] for c in group_cols]
    out_fields = list(key_fields) + [
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
    ]
    for a in aggs:
        out_fields.append(
            StructField(a.output_key, LongType() if a.kind == "count" else DoubleType())
        )
    if not aggs:
        out_fields.append(StructField("_group_size", LongType()))
    out_schema = StructType(out_fields)
    out_cols = [f.name for f in out_fields]

    def merge_sessions(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            starts, lasts, flat = state.get
            starts = list(starts)
            lasts = list(lasts)
            partials = [
                list(flat[i * n_slots : (i + 1) * n_slots]) for i in range(len(starts))
            ]
        else:
            starts, lasts, partials = [], [], []

        wm = state.getCurrentWatermarkMs() * 1000  # -> us

        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                ev = (pdf["event_time"].astype("int64") // 1_000).to_numpy()  # ns -> us
                vals = pdf[[s for s, _ in slots]].to_numpy(dtype="float64")
                order = ev.argsort(kind="stable")
                for idx in order:
                    t = int(ev[idx])
                    if wm > 0 and t < wm:
                        continue  # late row beyond the watermark — dropped
                    starts.append(t)
                    lasts.append(t)
                    # native floats: the state tuple is pickled to the JVM,
                    # which cannot unpickle numpy scalars
                    partials.append([float(x) for x in vals[idx]])

        # interval-merge the session list (sessions merge when the next
        # one starts within gap of the previous one's last event)
        if starts:
            triples = sorted(zip(starts, lasts, partials), key=lambda s: (s[0], s[1]))
            merged: list[list] = [list(triples[0])]
            for s, last, p in triples[1:]:
                cur = merged[-1]
                # inclusive boundary: Spark's session merge joins an event at
                # exactly last+gap into the session (windows [s, last+gap)
                # merge when next.start <= current.end)
                if s <= cur[1] + gap_us:
                    cur[1] = max(cur[1], last)
                    cur[2] = [
                        _merge_slot(slots[j][1], cur[2][j], p[j]) for j in range(n_slots)
                    ]
                else:
                    merged.append([s, last, p])
        else:
            merged = []

        closed = [m for m in merged if m[1] + gap_us <= wm]
        open_ = [m for m in merged if m[1] + gap_us > wm]

        if closed:
            rows: dict[str, list] = {c: [] for c in out_cols}
            for s, last, p in closed:
                for kf, kv in zip(group_cols, key):
                    rows[kf].append(kv)
                rows["window_start"].append(pd.Timestamp(s, unit="us"))
                rows["window_end"].append(pd.Timestamp(last + gap_us, unit="us"))
                j = 0
                for a in aggs:
                    if a.kind == "count":
                        rows[a.output_key].append(int(p[j]))
                        j += 1
                    elif a.kind == "avg":
                        ssum, scnt = p[j], p[j + 1]
                        rows[a.output_key].append(
                            ssum / scnt if scnt > 0 and not math.isnan(ssum) else None
                        )
                        j += 2
                    else:
                        v = p[j]
                        rows[a.output_key].append(None if math.isnan(v) else v)
                        j += 1
                if not aggs:
                    rows["_group_size"].append(int(p[0]))
            yield pd.DataFrame(rows, columns=out_cols)

        if open_:
            state.update(
                (
                    [m[0] for m in open_],
                    [m[1] for m in open_],
                    [x for m in open_ for x in m[2]],
                )
            )
            # flush on watermark progress even if the key sees no new data
            # (timeout API is ms: round the earliest us close time up)
            close_ms = -(-min(m[1] + gap_us for m in open_) // 1000)
            state.setTimeoutTimestamp(max(close_ms, wm // 1000 + 1))
        else:
            state.remove()

    raw = keyed.groupBy(*group_cols).applyInPandasWithState(
        merge_sessions,
        out_schema,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
    agg_out = [a.output_key for a in aggs] or ["_group_size"]
    windowed = raw.select(
        F.struct(
            F.col("window_start").alias("start"), F.col("window_end").alias("end")
        ).alias("window"),
        *group_cols,
        *agg_out,
    )
    return _project_super_vertices(op, windowed)
