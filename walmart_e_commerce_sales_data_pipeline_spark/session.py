"""SparkSession factory.

One place to encode the scale posture: AQE on (runtime re-plan, skew-join
splitting, shuffle-partition coalescing), Arrow for any pandas interchange,
and shuffle partitions sized for the local test harness (the driver runs
``local[32]``).  On a real 1000-executor cluster the same code runs with
``spark.sql.shuffle.partitions`` raised (or left to AQE's coalescing with a
high initial value) — nothing else in the package assumes local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "walmart-ecommerce-sales-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults come from the environment so the same entry points work under
    the driver harness (``SPARK_GRAFT_CPUS``) and on a cluster (where
    ``master`` is injected by spark-submit and must NOT be overridden).
    """
    builder = SparkSession.builder.appName(app_name)

    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)

    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    builder = (
        builder
        # Adaptive execution: runtime shuffle coalescing, skew-join split,
        # broadcast conversion from runtime sizes.  Core of the 100 TB story.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas UDF / toPandas boundary (vectorized transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Timestamps in the driver testdata are timezone-naive; keep
        # session TZ fixed so month()/window() are deterministic everywhere.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()


def ensure_utc(spark: SparkSession) -> None:
    """Pin the session timezone to UTC (idempotent, no-op when already set).

    Centralized here (r5 verdict task #7) instead of scattered
    ``conf.set`` calls in query modules: sessions built by :func:`get_spark`
    are already UTC, but the external driver harness supplies its *own*
    session, so any entry point that evaluates calendar functions over
    timestamps must pin TZ itself.  The DuckDB oracles evaluate naive
    timestamps, which Spark's TZ-dependent ``month()``/``window()``/
    ``date_format()`` match only under UTC.
    """
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
