"""Bucketed tables: pre-shuffled storage for co-located joins.

A join between two tables bucketed by the join key into the same bucket
count needs **no Exchange at query time** — the shuffle was paid once at
write time and amortizes over every subsequent join/aggregation on that
key.  This is the storage-level answer to 'the lineitem⋈orders shuffle is
the bottleneck at 100 TB': bucket both fact tables by orderkey when they
land.

Tests assert the join plan over bucketed tables is Exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist a DataFrame as a bucketed (and bucket-sorted) catalog table.

    Sorting within buckets additionally enables sort-merge joins without a
    sort step and better min/max pruning inside each file.
    """
    writer = df.write.mode("overwrite").bucketBy(buckets, bucket_key)
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Spark plans a shuffle-free sort-merge join
    (verify with ``plans.formatted_plan`` — no Exchange above either scan).
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
