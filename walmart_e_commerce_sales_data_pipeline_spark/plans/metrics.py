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


def _parse_bytes(formatted: str) -> int:
    """Leading total of a UI-formatted size string, in bytes."""
    m = _SIZE_RE.search(formatted)
    if not m:
        return 0
    return int(float(m.group(1).replace(",", "")) * _UNIT[m.group(2)])


def execution_count(spark: SparkSession) -> int:
    """Number of SQL executions recorded so far (use as a watermark)."""
    return spark._jsparkSession.sharedState().statusStore().executionsList().size()


def metrics_since(spark: SparkSession, watermark: int) -> dict[str, int]:
    """Aggregate byte-valued SQL metrics over executions after `watermark`.

    Returns ``{"shuffle_bytes": n, "spill_bytes": n}`` summed across every
    execution the store recorded past the watermark (a single query() call
    may trigger several — eager counts, persists), each deduped by
    accumulator id.
    """
    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    totals = dict.fromkeys(_BYTE_METRICS.values(), 0)
    for i in range(watermark, execs.size()):
        ex = execs.apply(i)
        values = store.executionMetrics(ex.executionId())
        seen: set[int] = set()
        it = ex.metrics().iterator()
        while it.hasNext():
            m = it.next()
            key = _BYTE_METRICS.get(m.name())
            acc = m.accumulatorId()
            if key is None or acc in seen:
                continue
            seen.add(acc)
            v = values.get(acc)
            if v.isDefined():
                totals[key] += _parse_bytes(v.get())
    return totals
