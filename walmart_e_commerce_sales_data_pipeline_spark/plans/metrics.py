"""Runtime SQL-metric extraction from the shared SQLAppStatusStore.

`explain.py` verifies the plan Catalyst *chose*; this module verifies what
the plan actually *did* at runtime — bytes shuffled, bytes spilled, rows
scanned — the numbers that decide whether an operator survives a 100×
scale-up.  The bench records them per headline query so a regression that
keeps wall-clock flat on sf0.1 but doubles shuffle volume (a real 100 TB
problem) is still visible in BENCH JSON.

Reads the same store the Spark UI's SQL tab renders, via the py4j gateway;
no listener registration (the py4j callback server is unreliable in
short-lived scripts).  Metric values arrive UI-formatted ("216.0 B",
"1,024", "96.0 MiB (32.0 MiB, 32.0 MiB, 32.0 MiB)") — `_parse_bytes`
takes the leading total.  AQE re-planning repeats plan nodes, so metrics
are deduped by accumulator id before summing.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_SIZE_RE = re.compile(r"([\d.,]+)\s*(B|KiB|MiB|GiB|TiB|PiB)")
_UNIT = {"B": 1, "KiB": 1024**1, "MiB": 1024**2, "GiB": 1024**3, "TiB": 1024**4, "PiB": 1024**5}

# metric display name → key in the returned dict (bytes-valued metrics)
_BYTE_METRICS = {
    "shuffle bytes written": "shuffle_bytes",
    "spill size": "spill_bytes",
}

# metric display name → key for metrics aggregated by MAX of the per-task
# maximum (the last value in the "total (min, med, max)" UI format).  Peak
# memory is the funnel tell wall-clock hides at sf0.1: an operator that
# concentrates the dataset into one task shows up as a per-task peak far
# above its siblings long before it OOMs at scale.
_PEAK_METRICS = {
    "peak memory": "peak_memory_bytes",
}


def _parse_bytes(formatted: str) -> int:
    """Leading total of a UI-formatted size string, in bytes."""
    m = _SIZE_RE.search(formatted)
    if not m:
        return 0
    return int(float(m.group(1).replace(",", "")) * _UNIT[m.group(2)])


def _parse_max_bytes(formatted: str) -> int:
    """Last size in a UI-formatted "total (min, med, max)" string — the
    per-task maximum — in bytes; falls back to the only value when the
    metric has no distribution."""
    ms = _SIZE_RE.findall(formatted)
    if not ms:
        return 0
    num, unit = ms[-1]
    return int(float(num.replace(",", "")) * _UNIT[unit])


def execution_count(spark: SparkSession) -> int:
    """Number of SQL executions recorded so far (use as a watermark)."""
    return spark._jsparkSession.sharedState().statusStore().executionsList().size()


def metrics_since(spark: SparkSession, watermark: int) -> dict[str, int]:
    """Aggregate byte-valued SQL metrics over executions after `watermark`.

    Returns ``{"shuffle_bytes": n, "spill_bytes": n,
    "peak_memory_bytes": n}``: the byte metrics summed across every
    execution the store recorded past the watermark (a single query() call
    may trigger several — eager counts, persists), each deduped by
    accumulator id; peak memory is the MAX per-task peak across all
    operators instead — the single-task-funnel signal.
    """
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    totals = dict.fromkeys(
        [*_BYTE_METRICS.values(), *_PEAK_METRICS.values()], 0
    )
    for i in range(watermark, execs.size()):
        ex = execs.apply(i)
        values = store.executionMetrics(ex.executionId())
        seen: set[int] = set()
        it = ex.metrics().iterator()
        while it.hasNext():
            m = it.next()
            key = _BYTE_METRICS.get(m.name())
            peak_key = _PEAK_METRICS.get(m.name())
            acc = m.accumulatorId()
            if (key is None and peak_key is None) or acc in seen:
                continue
            seen.add(acc)
            v = values.get(acc)
            if not v.isDefined():
                continue
            if key is not None:
                totals[key] += _parse_bytes(v.get())
            else:
                totals[peak_key] = max(
                    totals[peak_key], _parse_max_bytes(v.get())
                )
    return totals
