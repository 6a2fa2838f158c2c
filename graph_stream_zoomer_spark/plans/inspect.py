"""Physical-plan inspection helpers — the engine's plan-quality contract.

The reference delegates all optimization to Flink's planner (SURVEY.md §4);
this engine delegates to Catalyst, and these helpers make the delegation
*testable*: plan-quality tests assert pushed filters, pruned scans,
whole-stage codegen coverage, broadcast joins, and shuffle counts, so a
regression that silently de-optimizes a pipeline fails CI instead of
surfacing as a 10× slowdown at scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanStats:
    text: str
    num_exchanges: int
    num_broadcast_joins: int
    num_sortmerge_joins: int
    num_codegen_spans: int
    pushed_filters: list[str]
    read_schemas: list[str]

    def scan_reads_only(self, *cols: str) -> bool:
        """True if every scan's ReadSchema is a subset of ``cols``."""
        allowed = set(cols)
        for rs in self.read_schemas:
            got = set(re.findall(r"(\w+):", rs))
            if not got <= allowed:
                return False
        return True


def plan_stats(df: DataFrame) -> PlanStats:
    text = formatted_plan(df)
    return PlanStats(
        text=text,
        # the formatted output lists each node twice (tree + detail);
        # count only the numbered detail entries
        num_exchanges=len(re.findall(r"^\(\d+\) Exchange", text, re.M)),
        num_broadcast_joins=len(re.findall(r"BroadcastHashJoin", text)),
        num_sortmerge_joins=len(re.findall(r"SortMergeJoin", text)),
        num_codegen_spans=len(re.findall(r"WholeStageCodegen", text)),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
    )
