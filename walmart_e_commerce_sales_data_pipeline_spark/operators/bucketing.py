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


def table_bucket_spec(df: DataFrame) -> tuple[int, list[str]] | None:
    """(numBuckets, bucket column names) when ``df`` reads ONE bucketed
    file relation, else None.

    The detector walks the optimized logical plan's leaves (py4j into
    Catalyst: ``LogicalRelation`` -> ``HadoopFsRelation.bucketSpec``), so
    it sees through projections and filters stacked on a bucketed scan —
    those preserve the physical layout — but refuses anything with more
    than one leaf (a join/union result is not a bucketed table however
    its inputs were stored).  Used by
    ``operators.dispatch.size_dispatched_join`` to skip the sketch pass
    entirely when both sides are co-bucketed on the join key: the
    shuffle those sketches would size was already paid at write time.
    Returns None on any interop surprise — callers fall through to the
    sketch-dispatched tiers, never error."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        if leaves.size() != 1:
            return None
        rel = leaves.apply(0)
        if rel.getClass().getSimpleName() != "LogicalRelation":
            return None
        spec_opt = rel.relation().bucketSpec()
        if spec_opt.isEmpty():
            return None
        spec = spec_opt.get()
        cols = spec.bucketColumnNames()
        return int(spec.numBuckets()), [
            cols.apply(i) for i in range(cols.size())
        ]
    except Exception:  # noqa: BLE001 — detection is best-effort by design
        return None


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key.

    With matching bucket counts Spark plans a shuffle-free sort-merge join
    (verify with ``plans.formatted_plan`` — no Exchange above either scan).
    """
    return spark.table(left_table).join(spark.table(right_table), key, how)
