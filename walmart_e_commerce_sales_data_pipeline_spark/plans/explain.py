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


def _plan_tree(plan: str) -> list[tuple[int, str, int]]:
    """Parse the tree section of a formatted explain into
    ``(indent, node_name, node_id)`` triples, in tree order.  Indent is the
    column where the node name starts, so a node's direct child is the next
    line with a strictly greater indent."""
    out: list[tuple[int, str, int]] = []
    for line in plan.splitlines():
        if not line.strip():
            break  # tree section ends at the first blank line
        m = re.match(r"^([+\-:*\s]*)([A-Za-z][\w ]*?)\s.*\((\d+)\)\s*$", line)
        if m:
            out.append((len(m.group(1)), m.group(2).strip(), int(m.group(3))))
    return out


def _node_details(plan: str) -> dict[int, str]:
    """Map node id -> its detail block in a formatted explain."""
    out: dict[int, str] = {}
    cur_id: int | None = None
    buf: list[str] = []
    for line in plan.splitlines():
        m = re.match(r"^\((\d+)\) ", line)
        if m:
            if cur_id is not None:
                out[cur_id] = "\n".join(buf)
            cur_id = int(m.group(1))
            buf = [line]
        elif cur_id is not None:
            buf.append(line)
    if cur_id is not None:
        out[cur_id] = "\n".join(buf)
    return out


# Child shapes that bound the rows entering a single-partition task,
# independent of data scale: a partial aggregate emits one row per
# upstream task; WindowGroupLimit / LocalLimit cap rows at k per task.
_BOUNDED_FUNNEL_CHILDREN = ("WindowGroupLimit", "LocalLimit", "GlobalLimit")


def single_partition_funnels(df: DataFrame) -> list[str]:
    """Every ``Exchange SinglePartition`` whose child does NOT provably
    bound its input, plus every ``Coalesce 1`` — the remaining silent
    scale-killer shape after nested-loop joins and unpartitioned windows:
    a stray ``repartition(1)``/``coalesce(1)``, or an operator that forces
    the whole dataset through one task.

    A SinglePartition exchange is fine when its child is a partial
    aggregate (one row per upstream task reaches the exchange) or a
    WindowGroupLimit/LocalLimit (≤ k rows per task).  Anything else —
    a Project, Filter, scan, or final aggregate feeding SinglePartition —
    moves unbounded rows into one task and is reported.
    ``tests/test_plan_sweep.py`` fails the suite when one appears outside
    its justification whitelist."""
    plan = formatted_plan(df)
    tree = _plan_tree(plan)
    details = _node_details(plan)
    out: list[str] = []
    for i, (indent, name, nid) in enumerate(tree):
        det = details.get(nid, "")
        if name == "Coalesce" and re.search(r"Arguments: 1\b", det):
            out.append(f"Coalesce 1 (node {nid})")
            continue
        if name != "Exchange" or "SinglePartition" not in det:
            continue
        child = next(
            ((n, cid) for ind, n, cid in tree[i + 1 :] if ind > indent), None
        )
        if child is None:
            out.append(f"Exchange SinglePartition (node {nid}) with no child")
            continue
        cname, cid = child
        cdet = details.get(cid, "")
        is_partial_agg = "Aggregate" in cname and "partial_" in cdet
        # a partial (keyless) distinct/dedup pre-agg also emits ≤ one row
        # per task per group, but only the keyless form is bounded here
        is_keyless_partial = (
            "Aggregate" in cname
            and re.search(r"Keys(?: \[\d+\])?: \[\]", cdet) is not None
        )
        bounded = (
            is_partial_agg
            or is_keyless_partial
            or any(cname.startswith(b) for b in _BOUNDED_FUNNEL_CHILDREN)
        )
        if not bounded:
            out.append(
                f"Exchange SinglePartition (node {nid}) fed by {cname} "
                f"(node {cid})"
            )
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
