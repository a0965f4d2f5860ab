"""Testdata table loaders for registered queries.

All tables are plain ``spark.read.parquet`` except ``events``: its ``ts``
column is parquet ``TIMESTAMP(NANOS)`` which Spark's reader rejects
(PARQUET_TYPE_ILLEGAL).  The loader flips the documented escape hatch
``spark.sql.legacy.parquet.nanosAsLong`` and rebuilds both a nanosecond
``ts_ns`` (long, exact, for arithmetic like sessionization gaps) and a
microsecond-truncated ``ts`` timestamp (for calendar functions / windows).

The loader also pins the session timezone to UTC: the driver's session may
run with any local TZ, and ``month()``/``date_format`` over TimestampType
are TZ-dependent — the DuckDB oracle evaluates naive timestamps, which
matches Spark only under UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    # Integer `div`, never float division: ts_ns ≈ 1.7e18 exceeds double's
    # 53-bit mantissa, so `/ 1000` floors ~1.6% of rows to the previous
    # microsecond and events on exact window boundaries land in the wrong
    # bucket.
    return (
        raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    )
