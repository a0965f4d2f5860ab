"""The events loader (queries/tables.py) must normalize BOTH historical
parquet encodings of the ``ts`` column to the same (ts µs-timestamp,
ts_ns exact-ns long) contract:

- ``timestamp[us]`` (current driver testdata; loads as TIMESTAMP_NTZ),
- ``TIMESTAMP(NANOS)`` (earlier rounds; loadable only via the
  ``nanosAsLong`` escape hatch, arriving as a long).

The testdata only ships one encoding at a time, so this test synthesizes
the other with pyarrow and asserts the loader emits identical values for
identical instants — the regression guard for the drift that broke 20
queries in round 5.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

MICROS = [
    1704067200_000000,      # 2024-01-01 00:00:00 exactly (window boundary)
    1704067798_778549,
    1735689599_999999,      # end-of-year, max µs fraction
]


def _write(tmp_path, name: str, ts_type) -> str:
    d = tmp_path / name
    d.mkdir()
    unit = {"us": 1, "ns": 1000}[ts_type.unit]
    table = pa.table(
        {
            "event_id": pa.array(range(len(MICROS)), pa.int64()),
            "ts": pa.array([m * unit for m in MICROS], ts_type),
            "user_id": pa.array([7] * len(MICROS), pa.int64()),
            "event_type": pa.array(["click"] * len(MICROS)),
            "value": pa.array([1.5] * len(MICROS), pa.float64()),
            "props": pa.array(["{}"] * len(MICROS)),
        }
    )
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def test_both_encodings_normalize_identically(spark, tmp_path):
    us_dir = _write(tmp_path, "us", pa.timestamp("us"))
    ns_dir = _write(tmp_path, "ns", pa.timestamp("ns"))

    got_us = events(spark, us_dir).select("event_id", "ts", "ts_ns").orderBy("event_id").collect()
    got_ns = events(spark, ns_dir).select("event_id", "ts", "ts_ns").orderBy("event_id").collect()

    assert [tuple(r) for r in got_us] == [tuple(r) for r in got_ns]
    # exact ns contract: µs instants → ns multiples of 1000
    for r, m in zip(got_us, MICROS):
        assert r["ts_ns"] == m * 1000
        assert r["ts"].microsecond == m % 1_000_000


def test_stream_source_adapts_to_either_encoding(spark, tmp_path):
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_window_agg,
        read_events_stream,
        run_stream_to_memory,
    )

    outs = []
    for name, t in (("s_us", pa.timestamp("us")), ("s_ns", pa.timestamp("ns"))):
        d = _write(tmp_path, name, t)
        stream = read_events_stream(spark, d)
        qy = run_stream_to_memory(
            hourly_window_agg(stream, watermark="0 seconds"), f"enc_{name}", "append"
        )
        qy.awaitTermination(60)
        rows = spark.sql(f"SELECT * FROM enc_{name} ORDER BY window_start").collect()
        outs.append([tuple(r) for r in rows])
    assert outs[0] == outs[1]
    assert outs[0], "windows must be produced"
