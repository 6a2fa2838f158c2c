"""Sequence-pattern matching (CEP) over transcript turn streams.

The reference has no CEP operator; this is part of the engine's streaming
surface (north rule: "structured-streaming / CEP engine"). A pattern is an
ordered list of role predicates; a match is a run of consecutive turns
(turn_idx, turn_idx+1, …) of one conversation whose roles equal the pattern,
with the whole run inside a time bound.

Batch form: `lead()` over (conv_id, turn_idx) — one shuffle, no UDF.
Streaming form: keyed state per conv_id via ``applyInPandasWithState`` —
the stream is not ordered, so turns are buffered per conversation and a
match is emitted exactly once when its full run is present; state is
trimmed by the event-time watermark (a turn can only begin a match until
``watermark − within``).

Scale: both forms shuffle once on conv_id. Conversations are short (the
generator means ≈9 turns) so per-key state is O(turns in the open horizon);
at 10^12 turns the shuffle is the same conv_id exchange the successor-edge
binding needs, so the input table's bucket(conv_id) layout serves both.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

MATCH_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("start_turn_idx", IntegerType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType())),
        StructField("roles", ArrayType(StringType())),
        StructField("ts_us", ArrayType(LongType())),
        StructField("emitted", ArrayType(IntegerType())),
    ]
)


def match_sequence(
    turns: DataFrame, pattern: list[str], within: str = "1 hour"
) -> DataFrame:
    """Batch CEP: all (conv_id, start_turn_idx) whose next ``len(pattern)``
    consecutive turns carry exactly the pattern roles, last turn within
    ``within`` of the first. One shuffle (the conv_id window exchange)."""
    n = len(pattern)
    assert n >= 1
    # Parse once with the shared grammar and execute via the normalized
    # microsecond count — Spark's multi-unit INTERVAL literal grammar is
    # stricter than _interval_us (rejects fractional non-final units), so
    # re-parsing the raw string could fail specs the validator blessed.
    within_us = _interval_us(within)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cols = [F.col("role").alias("_r0"), F.col("ts").alias("_t0"), F.col("turn_idx")]
    for i in range(1, n):
        cols.append(F.lead("role", i).over(w).alias(f"_r{i}"))
        cols.append(F.lead("ts", i).over(w).alias(f"_t{i}"))
        cols.append(F.lead("turn_idx", i).over(w).alias(f"_i{i}"))
    d = turns.select("conv_id", *cols)
    cond: Column = F.col("_r0") == pattern[0]
    for i in range(1, n):
        cond = cond & (F.col(f"_r{i}") == pattern[i])
        # consecutive turns only — lead() skips nothing, but be explicit so
        # the predicate survives a change of ordering column
        cond = cond & (F.col(f"_i{i}") == F.col("turn_idx") + i)
    last_t = F.col(f"_t{n-1}") if n > 1 else F.col("_t0")
    cond = cond & (last_t <= F.col("_t0") + F.expr(f"INTERVAL {within_us} MICROSECOND"))
    return d.where(cond).select(
        "conv_id",
        F.col("turn_idx").alias("start_turn_idx"),
        F.col("_t0").alias("start_ts"),
        last_t.alias("end_ts"),
    )


def match_followed_by(
    turns: DataFrame,
    first: str,
    then: str,
    within: str = "1 hour",
    not_between: str | None = None,
) -> DataFrame:
    """CEP skip-till-next-match: each ``first``-role turn matched with the
    NEXT ``then``-role turn of the same conversation (any gap, not just
    adjacent — the relaxed selection policy match_sequence's strict
    contiguity lacks), last turn within ``within`` of the first;
    ``not_between`` adds negation (no such role strictly between the pair).

    One conv_id window exchange, no join: next-occurrence lookup is a
    min-over-following-frame aggregate (min of (turn_idx, ts) structs over
    ROWS 1 FOLLOWING → UNBOUNDED), which Spark evaluates in a single pass
    per partition — O(turns) per conversation, not O(turns²).
    """
    within_us = _interval_us(within)  # normalized: see match_sequence note
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(1, Window.unboundedFollowing)
    )

    def next_of(role: str) -> Column:
        return F.min(
            F.when(F.col("role") == role, F.struct("turn_idx", "ts"))
        ).over(w)

    d = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        next_of(then).alias("_nb"),
        *([next_of(not_between).alias("_nc")] if not_between else []),
    ).where(F.col("role") == first)
    cond = (
        F.col("_nb").isNotNull()
        & (F.col("_nb.ts") <= F.col("ts") + F.expr(f"INTERVAL {within_us} MICROSECOND"))
    )
    if not_between:
        cond = cond & (
            F.col("_nc").isNull() | (F.col("_nc.turn_idx") > F.col("_nb.turn_idx"))
        )
    return d.where(cond).select(
        "conv_id",
        F.col("turn_idx").alias("start_turn_idx"),
        F.col("_nb.turn_idx").alias("end_turn_idx"),
        F.col("ts").alias("start_ts"),
        F.col("_nb.ts").alias("end_ts"),
    )


def streaming_match_sequence(
    turns: DataFrame, pattern: list[str], within: str = "1 hour"
) -> DataFrame:
    """Streaming CEP over a watermarked transcript stream (same output as
    the batch form, emitted exactly once per match).

    Per-conversation keyed state holds the turns that may still begin or
    extend a match (those newer than watermark − within) plus the set of
    already-emitted start indices; each micro-batch merges new turns, emits
    every complete unseen run, and expires turns past the watermark horizon.
    Emission is keyed by the run's start turn — exactly-once, and safe for
    overlapping runs that share turns.
    """
    n = len(pattern)
    within_us = _interval_us(within)

    def matcher(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            idxs, roles, ts_us, emitted_list = state.get
            buf = {int(i): (r, int(t)) for i, r, t in zip(idxs, roles, ts_us)}
            emitted = set(int(i) for i in emitted_list)
        else:
            buf, emitted = {}, set()
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                tcol = (pdf["ts"].astype("int64") // 1_000).to_numpy()
                for i, r, t in zip(pdf["turn_idx"], pdf["role"], tcol):
                    buf[int(i)] = (str(r), int(t))

        out = {"conv_id": [], "start_turn_idx": [], "start_ts": [], "end_ts": []}
        for i in sorted(buf):
            if i in emitted:  # already emitted in an earlier batch
                continue
            run = [buf.get(i + j) for j in range(n)]
            if any(x is None for x in run):
                continue
            if [x[0] for x in run] != pattern:
                continue
            if run[-1][1] > run[0][1] + within_us:
                continue
            out["conv_id"].append(key[0])
            out["start_turn_idx"].append(i)
            out["start_ts"].append(pd.Timestamp(run[0][1], unit="us"))
            out["end_ts"].append(pd.Timestamp(run[-1][1], unit="us"))
            emitted.add(i)

        # retention: a turn stays while it could still join a run whose
        # start is not yet expired (starts expire at watermark − within);
        # emitted starts stay in the buffer (a turn can be the MIDDLE of an
        # overlapping later-completing run) but are remembered in `emitted`
        # so each match is produced exactly once.
        horizon = wm_us - within_us
        keep = {
            i: v
            for i, v in buf.items()
            # v could still matter if some possible start j in [i-n+1, i]
            # is alive (its ts unknown if absent — approximate with v's ts,
            # conservative because |ts_j - ts_i| ≤ within for a viable run)
            if v[1] + within_us >= horizon
        }
        if keep:
            ks = sorted(keep)
            state.update(
                (
                    [int(i) for i in ks],
                    [keep[i][0] for i in ks],
                    [int(keep[i][1]) for i in ks],
                    sorted(int(i) for i in emitted if i in keep),
                )
            )
            # wake on watermark progress so expired state is trimmed even if
            # the conversation never speaks again
            min_close_ms = min(v[1] + 2 * within_us for v in keep.values()) // 1000
            state.setTimeoutTimestamp(max(min_close_ms, wm_us // 1000 + 1))
        else:
            state.remove()

        if out["conv_id"]:
            yield pd.DataFrame(out)

    return (
        turns.select("conv_id", "turn_idx", "role", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            matcher,
            MATCH_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


FOLLOWED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("start_turn_idx", IntegerType()),
        StructField("end_turn_idx", IntegerType()),
        StructField("start_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
    ]
)


def streaming_match_followed_by(
    turns: DataFrame,
    first: str,
    then: str,
    within: str = "1 hour",
    not_between: str | None = None,
) -> DataFrame:
    """Streaming twin of :func:`match_followed_by` — same output rows,
    emitted exactly once per matched pair, over a watermarked stream.

    Skip-till-next-match needs a *decision*, not just a detection: a
    ``first``-role turn at index ``i`` pairs with the NEXT ``then``-role
    turn, so with out-of-order arrival we may only decide once every index
    between ``i`` and the candidate is present (a missing turn could be an
    earlier ``then`` — or a blocking ``not_between``). Per-conversation
    keyed state buffers turns; each start is decided exactly once:

    - *live* (``ts_i + within ≥ watermark``): decided only through a
      gap-free walk from ``i+1`` — stop at the first ``then`` (emit iff in
      time bound and no ``not_between`` seen), stay undecided on a gap or
      if the walk runs off the buffered suffix.
    - *finalize* (``ts_i + within < watermark``): any still-missing turn
      would now be late (dropped upstream), so the buffer IS the
      conversation — decide over the present turns, gaps and all.

    Decisions (both match and no-match) are recorded so re-scans never
    re-emit; state expires on the same ``watermark − within`` horizon as
    :func:`streaming_match_sequence`, with an event-time timeout at the
    earliest undecided start's finalization deadline so decisions fire
    even if the conversation never speaks again. One conv_id shuffle —
    the same exchange every other per-conversation operator uses.
    """
    within_us = _interval_us(within)

    def decide(buf: dict, i: int, allow_gaps: bool):
        """Returns ('match', j) | ('nomatch', None) | ('open', None)."""
        t0 = buf[i][1]
        expected = i + 1
        saw_neg = False
        for k in sorted(x for x in buf if x > i):
            if not allow_gaps and k != expected:
                return ("open", None)
            expected = k + 1
            role = buf[k][0]
            if role == then:
                if buf[k][1] > t0 + within_us or saw_neg:
                    return ("nomatch", None)
                return ("match", k)
            if not_between is not None and role == not_between:
                saw_neg = True
        # ran off the buffered suffix without a `then`
        return ("nomatch", None) if allow_gaps else ("open", None)

    def matcher(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            idxs, roles, ts_us, decided_list = state.get
            buf = {int(i): (r, int(t)) for i, r, t in zip(idxs, roles, ts_us)}
            decided = set(int(i) for i in decided_list)
        else:
            buf, decided = {}, set()
        wm_us = state.getCurrentWatermarkMs() * 1000

        if not state.hasTimedOut:
            for pdf in pdfs:
                if pdf.empty:
                    continue
                tcol = (pdf["ts"].astype("int64") // 1_000).to_numpy()
                for i, r, t in zip(pdf["turn_idx"], pdf["role"], tcol):
                    buf[int(i)] = (str(r), int(t))

        out = {
            "conv_id": [],
            "start_turn_idx": [],
            "end_turn_idx": [],
            "start_ts": [],
            "end_ts": [],
        }
        for i in sorted(buf):
            if i in decided or buf[i][0] != first:
                continue
            finalize = buf[i][1] + within_us < wm_us
            verdict, j = decide(buf, i, allow_gaps=finalize)
            if verdict == "open":
                continue
            decided.add(i)
            if verdict == "match":
                out["conv_id"].append(key[0])
                out["start_turn_idx"].append(i)
                out["end_turn_idx"].append(j)
                out["start_ts"].append(pd.Timestamp(buf[i][1], unit="us"))
                out["end_ts"].append(pd.Timestamp(buf[j][1], unit="us"))

        # retention mirrors streaming_match_sequence: a turn stays while it
        # could still serve a start whose deadline has not expired
        horizon = wm_us - within_us
        keep = {i: v for i, v in buf.items() if v[1] + within_us >= horizon}
        if keep:
            ks = sorted(keep)
            state.update(
                (
                    [int(i) for i in ks],
                    [keep[i][0] for i in ks],
                    [int(keep[i][1]) for i in ks],
                    sorted(int(i) for i in decided if i in keep),
                )
            )
            undecided = [
                keep[i][1] + within_us
                for i in ks
                if keep[i][0] == first and i not in decided
            ]
            if undecided:
                # fire at the earliest finalization deadline
                t_ms = min(undecided) // 1000 + 1
            else:
                t_ms = min(v[1] + 2 * within_us for v in keep.values()) // 1000
            state.setTimeoutTimestamp(max(t_ms, wm_us // 1000 + 1))
        else:
            state.remove()

        if out["conv_id"]:
            yield pd.DataFrame(out)

    return (
        turns.select("conv_id", "turn_idx", "role", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            matcher,
            FOLLOWED_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


_UNIT_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _interval_us(spec: str) -> int:
    """Parse a multi-part interval spec ('1 hour', '1.5 hours 30 minutes',
    '2 weeks') to microseconds. Shared by batch and streaming CEP so the
    same ``within`` string is accepted — or rejected, with a clear message —
    by both entry points (plan-build time, never inside an executor)."""
    toks = spec.strip().split()
    if not toks or len(toks) % 2 != 0:
        raise ValueError(
            f"invalid interval {spec!r}: expected '<qty> <unit> [<qty> <unit> ...]'"
        )
    total = 0
    for qty, unit in zip(toks[::2], toks[1::2]):
        u = unit.lower().rstrip("s")
        if u not in _UNIT_US:
            raise ValueError(
                f"unsupported interval unit {unit!r} in {spec!r}; "
                f"supported: {', '.join(sorted(_UNIT_US))}(s)"
            )
        try:
            q = float(qty)
        except ValueError:
            raise ValueError(f"invalid interval quantity {qty!r} in {spec!r}") from None
        total += int(q * _UNIT_US[u])
    return total
