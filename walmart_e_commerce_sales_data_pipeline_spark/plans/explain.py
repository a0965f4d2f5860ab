"""Physical-plan inspection helpers.

The scale story of this engine is "declare the plan, verify Catalyst chose
the physical strategy you'd want".  These helpers turn that verification
into assertions usable from tests and from the bench: did the filter push
into the parquet scan, did the small side broadcast, how wide are the
whole-stage-codegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text of the physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan in the plan (empty list = nothing
    pushed — usually a red flag for a filtered parquet read)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    """True if the plan contains a broadcast hash/nested-loop join."""
    plan = formatted_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (fewer spans for the same plan =
    wider fused pipelines = less row materialization between operators).

    Parsed from simple-mode explain, where fused operators carry a
    ``*(n)`` codegen-id prefix (formatted mode omits the markers).
    Under AQE the markers only exist in the *final* plan — run an action
    on the DataFrame first, then call this.
    """
    simple = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "simple"
    )
    return len(set(re.findall(r"\*\((\d+)\)", simple)))
