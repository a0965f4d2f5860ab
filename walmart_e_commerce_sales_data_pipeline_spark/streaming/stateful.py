"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API the built-in windowed/session
aggregations can't express: a per-user running profile (event count,
value sum, last-seen timestamp) that emits an updated row per user per
micro-batch.  The same callable works under ``foreachBatch``-free
``update`` output mode.

Scale: state is partitioned by the group key across the state store; the
pandas hook receives one group per call with Arrow transfer, so per-key
state stays O(1) and the operator scales with the key cardinality, not the
event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts_ns", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("last_ts_ns", LongType()),
    ]
)


# Self-contained (workers may not have this package on their import path).
def _update_user_profile(key, pdfs, state: GroupState):
    import pandas as pd

    n, vsum, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vsum += float(pdf["value"].sum())
        last = max(last, int(pdf["ts_ns"].max()))
    state.update((n, vsum, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "value_sum": [vsum], "last_ts_ns": [last]}
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile over a streaming (or batch) events frame
    with columns user_id, value, ts_ns."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
