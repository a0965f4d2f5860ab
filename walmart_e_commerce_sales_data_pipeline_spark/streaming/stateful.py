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


def transform_with_state_available() -> bool:
    """True when the transformWithStateInPandas runtime dependency
    (python protobuf, used by the typed-state wire protocol) is present."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_profiles_tws(events: DataFrame) -> DataFrame:
    """Same per-user running profile via ``transformWithStateInPandas`` —
    the Spark 4 arbitrary-state API (StatefulProcessor + typed state
    variables) that succeeds ``applyInPandasWithState``.  Semantics must
    match ``running_user_profiles`` exactly (asserted in tests).

    Requires the RocksDB state store provider when run on a stream
    (``events.rocksdb_state_conf()``) — the HDFS-backed store does not
    implement the multiple-column-family layout this API stores its typed
    state variables in.  Scale posture is the same as the v1 operator:
    state partitioned by key, Arrow transfer per group, O(1) per-key
    state; the typed-state handle additionally supports list/map state
    and timers for richer operators without schema-packing tricks.

    Environment gate: the TWS state protocol speaks protobuf between the
    JVM state server and the Python driver worker, so the ``protobuf``
    Python package must be importable (``pyspark[connect]`` ships it).
    Without it the stream fails at start with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — probe with
    ``transform_with_state_available()`` first (the test suite skips on
    absence; same documented-gate class as Delta/Iceberg/Avro).
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _UserProfileProcessor(StatefulProcessor):
        # Self-contained: workers may not have this package importable.
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._profile = handle.getValueState(
                "profile", "n BIGINT, value_sum DOUBLE, last_ts_ns BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, vsum, last = (
                self._profile.get() if self._profile.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                vsum += float(pdf["value"].sum())
                last = max(last, int(pdf["ts_ns"].max()))
            self._profile.update((n, vsum, last))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [vsum],
                    "last_ts_ns": [last],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_UserProfileProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
