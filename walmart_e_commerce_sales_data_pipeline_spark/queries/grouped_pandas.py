"""Per-group z-score normalization: JVM window expressions (registered)
plus an ``applyInPandas`` twin (grouped-map Arrow coverage).

The REGISTERED query uses pure ``avg``/``stddev_samp`` window expressions —
no Python boundary, whole-stage codegen intact, the plan you would ship at
100×.  ``grouped_zscore_histogram_pandas`` computes the identical result
through the grouped-map Arrow path; ``tests/test_skew_bucketing_stateful.py``
asserts equality, which keeps the applyInPandas API family covered
(mapInPandas → multimodal features, applyInPandasWithState → streaming
profiles, applyInPandas → here) without shipping a Python stage in the
registered plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .registry import register
from .tables import table

_Z_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("z", DoubleType()),
    ]
)


@register(
    "grouped_zscore_histogram",
    oracle="""
    WITH z AS (
        SELECT event_type,
               (value - AVG(value) OVER (PARTITION BY event_type))
                   / NULLIF(STDDEV_SAMP(value) OVER (PARTITION BY event_type), 0) AS z
        FROM events
    )
    SELECT event_type,
           CASE WHEN z IS NULL THEN NULL
                ELSE CAST(GREATEST(-3, LEAST(3, FLOOR(z))) AS INTEGER) END AS z_bucket,
           COUNT(*) AS n
    FROM z
    GROUP BY event_type, z_bucket
    ORDER BY event_type, z_bucket NULLS FIRST
    """,
    description="per-group z-score normalization via pure-JVM window "
    "expressions (avg/stddev_samp OVER (PARTITION BY event_type)) bucketed "
    "into a clamped histogram — one shuffle on event_type, no Python "
    "boundary, whole-stage codegen intact.  An applyInPandas twin "
    "(grouped_zscore_histogram_pandas) computes the same result through "
    "the grouped-map Arrow path; a pytest asserts equality",
    tags=("window", "normalization"),
)
def grouped_zscore_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    return _bucket_histogram(_zscore_window(ev))


def _zscore_window(ev: DataFrame) -> DataFrame:
    """z per event via window expressions; NULL for degenerate groups.

    ``stddev_samp`` is NULL for 1-row groups and 0.0 for constant groups —
    both must yield NULL z (SQL NULLIF semantics), never NaN/Inf, because a
    NaN double sorts above all doubles in least/greatest and would bucket
    as +3 instead of staying NULL.
    """
    w = Window.partitionBy("event_type")
    m = F.avg("value").over(w)
    s = F.stddev_samp("value").over(w)
    z = F.when(s.isNotNull() & (s != 0), (F.col("value") - m) / s)
    return ev.select("event_type", "event_id", z.alias("z"))


def _bucket_histogram(z: DataFrame) -> DataFrame:
    # Explicit null propagation: Spark's least/greatest SKIP nulls, so a
    # NULL z would otherwise clamp to +3 instead of staying NULL.
    clamped = F.greatest(F.lit(-3), F.least(F.lit(3), F.floor("z"))).cast("int")
    bucket = F.when(F.col("z").isNotNull(), clamped)
    return (
        z.groupBy("event_type", bucket.alias("z_bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", F.col("z_bucket").asc_nulls_first())
    )


def grouped_zscore_histogram_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Arrow twin of the registered query (equality-tested)."""
    ev = table(spark, sf_dir, "events").select("event_type", "event_id", "value")

    # Self-contained closure (workers may not have this package importable).
    def zscore(pdf):
        m = pdf["value"].mean()
        s = pdf["value"].std(ddof=1)  # sample stddev == STDDEV_SAMP
        out = pdf[["event_type", "event_id"]].copy()
        # degenerate groups (1 row → std NaN; constant → std 0) get NULL z,
        # matching SQL semantics — a NaN double would survive into Spark
        # and bucket as +3 (NaN sorts above all doubles in least/greatest)
        if s != s or s == 0:
            out["z"] = None
        else:
            out["z"] = (pdf["value"] - m) / s
        return out

    z = ev.groupBy("event_type").applyInPandas(zscore, schema=_Z_SCHEMA)
    return _bucket_histogram(z)
