"""Incremental materialized aggregates via ``foreachBatch``.

Pattern: a streaming source drives micro-batches; each batch merges into a
partitioned parquet aggregate table keyed by a time bucket — upsert by
dynamic partition overwrite (only the partitions a batch touches get
rewritten).  This is the lakehouse-native incremental rollup the reference
pipeline (full recompute + CSV overwrite, wallmart_pipeline.py:140-143)
cannot express, and the bridge between the batch and streaming halves of
this engine.

At scale: each micro-batch rewrites only the touched partitions, so the
work per batch is proportional to the batch's event-time spread, not to
table history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup_sink(events_stream: DataFrame, table_path: str):
    """Maintain an hourly (count, sum) rollup parquet table incrementally.

    Uses dynamic partition overwrite: the batch's windows are re-aggregated
    from the *running state* (replaces the partition wholesale per window),
    relying on the upstream watermarked aggregation to emit finalized rows.
    """

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("hour_key", F.date_format("window_start", "yyyyMMddHH"))
                .write.mode("overwrite")
                .partitionBy("hour_key")
                .parquet(table_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        events_stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
    )
