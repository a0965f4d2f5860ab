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


def keyed_upsert_sink(
    change_stream: DataFrame,
    table_path: str,
    key: str,
    ts_col: str,
):
    """Maintain a latest-row-per-key parquet table from a CDC change
    stream (the SCD-1 ingest `latest_record_compaction` computes in
    batch), via ``foreachBatch`` + ``operators.maintenance.merge_upsert``.

    The partition-overwrite rollup above handles time-bucketed
    aggregates; this sink handles ARBITRARY-key upserts, and is safe
    under out-of-order delivery: a micro-batch may carry a row OLDER
    than what the table already holds for that key (a replayed file, a
    late partition), so the batch's candidates are unioned with the
    table's current rows for the touched keys and reduced to
    newest-per-key BEFORE the merge — last-writer-wins by event time,
    not by arrival order.  Newest-per-key uses the lexicographic
    ``max(struct(ts, ...))`` so ties resolve identically to the batch
    compaction query (and map-side-combine, not a window).

    At scale: per batch, work is O(batch keys) — the anti-join inside
    ``merge_upsert`` broadcasts the changeset keys and the touched-key
    read is a semi join; table history is never rescanned for
    aggregation, only rewritten by the swap (the rewrite floor a
    non-transactional format pays; MERGE INTO replaces the call site on
    a lakehouse deployment).
    """
    import os

    from ..operators.maintenance import merge_upsert

    def newest_per_key(df: DataFrame) -> DataFrame:
        others = [c for c in df.columns if c != key]
        m = F.max(F.struct(ts_col, *[c for c in others if c != ts_col])).alias("m")
        return (
            df.groupBy(key)
            .agg(m)
            .select(key, *[F.col(f"m.{c}").alias(c) for c in [ts_col] + [c for c in others if c != ts_col]])
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        best = newest_per_key(batch_df)
        if os.path.exists(table_path):
            current = spark.read.parquet(table_path)
            touched = current.join(
                best.select(key), key, "left_semi"
            ).select(*best.columns)
            best = newest_per_key(touched.unionByName(best))
        merge_upsert(spark, table_path, best, key)

    return (
        change_stream.writeStream.foreachBatch(merge_batch)
        .outputMode("update")
        .trigger(availableNow=True)
    )
