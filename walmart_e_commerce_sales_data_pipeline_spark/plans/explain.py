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


def _top_level_groups(args: str) -> list[str]:
    """Split a formatted-explain ``Arguments:`` payload into its top-level
    ``[...]`` groups (bracket-depth scan — window expressions nest brackets
    and commas freely, so a regex cannot do this)."""
    groups: list[str] = []
    depth = 0
    start = -1
    for i, ch in enumerate(args):
        if ch == "[":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append(args[start + 1 : i])
    return groups


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """The ``Arguments:`` payload of every window-class physical node whose
    partition spec is EMPTY — the single-task funnel Spark warns about as
    "No Partition Defined for Window operation".  An unpartitioned window
    moves its entire input through one task, which is a scale-killer unless
    the input is provably bounded (a post-``limit`` head, a counts-of-counts
    table, a 12-row aggregate).  ``tests/test_plan_sweep.py`` fails the
    suite when one appears outside its justification whitelist.

    Detected from formatted explain: a physical ``Window`` prints
    ``[exprs], [partSpec], [orderSpec]`` when both are present and
    ``[exprs], [spec]`` when only one is — the two-group form is an ORDER
    spec (⇒ unpartitioned) exactly when it carries ASC/DESC sort markers,
    which partition specs never do.  ``WindowGroupLimit`` leads with its
    partition spec, empty ⇒ ``[]``.
    """
    plan = formatted_plan(df)
    lines = plan.splitlines()
    out: list[str] = []
    for i, line in enumerate(lines):
        m = re.match(r"\((\d+)\) (Window|WindowGroupLimit)\b", line.strip())
        if not m:
            continue
        for j in range(i + 1, min(i + 6, len(lines))):
            arg_line = lines[j].strip()
            if arg_line.startswith("Arguments: "):
                groups = _top_level_groups(arg_line[len("Arguments: ") :])
                if m.group(2) == "Window":
                    empty = len(groups) == 1 or (
                        len(groups) == 2
                        and (" ASC" in groups[1] or " DESC" in groups[1])
                    )
                else:  # WindowGroupLimit: [partSpec], [orderSpec], fn, k, mode
                    empty = bool(groups) and not groups[0].strip()
                if empty:
                    out.append(f"{m.group(2)}: {arg_line[:160]}")
                break
    return out


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
