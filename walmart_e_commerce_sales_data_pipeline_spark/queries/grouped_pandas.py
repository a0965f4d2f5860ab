"""Grouped-map pandas coverage: ``applyInPandas`` per-group normalization.

Completes the pandas-UDF API family (mapInPandas → multimodal features,
applyInPandasWithState → streaming profiles, applyInPandas → here).  The
z-score itself is SQL-expressible — the oracle uses window functions — so
this doubles as a correctness check that the Arrow grouped-map path
computes exactly what the declarative engine computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
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
    description="per-group z-score normalization via applyInPandas "
    "(grouped-map Arrow path) bucketed into a clamped histogram; oracle "
    "computes the identical z via window functions — the pandas kernel "
    "must agree with the declarative engine.  NOTE: this entry exists to "
    "exercise the grouped-map Arrow family; for this shape the RECOMMENDED "
    "plan is the pure-JVM window expression the oracle itself uses "
    "(avg/stddev_samp OVER (PARTITION BY ...)) — no Python boundary, "
    "whole-stage codegen intact",
    tags=("pandas-udf", "normalization"),
)
def grouped_zscore_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    # Explicit null propagation: Spark's least/greatest SKIP nulls, so a
    # NULL z would otherwise clamp to +3 instead of staying NULL.
    clamped = F.greatest(F.lit(-3), F.least(F.lit(3), F.floor("z"))).cast("int")
    bucket = F.when(F.col("z").isNotNull(), clamped)
    return (
        z.groupBy("event_type", bucket.alias("z_bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", F.col("z_bucket").asc_nulls_first())
    )
