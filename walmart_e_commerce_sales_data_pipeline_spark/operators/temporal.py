"""Temporal join operators Spark lacks natively: as-of join and
bounded-range (interval) join — both expressed as compositions of built-in
DataFrame ops (SURVEY.md §2.11 'custom operators' strategy (a)).

As-of join — union-merge technique:
    tag both sides, union on (key, time), and take the running
    ``last(right_value, ignorenulls)`` over a (key)-partitioned window
    ordered by (time, side).  One shuffle on the key, state O(1) per row —
    the classic distributed as-of without a per-key sort-merge UDF.

Range join — bucket-prune technique:
    joining on |t_left − t_right| ≤ tol would be a cross join; bucketing
    both sides into tol-width bins and joining on (key, bin ∈ {b−1,b,b+1})
    bounds each row's candidates to its neighborhood, then the exact
    predicate filters.  Shuffle key is (key, bin) — skew-resistant for
    spread timestamps.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_value: str,
) -> DataFrame:
    """For every left row, attach ``right_value`` of the latest right row
    with ``right_time <= left_time`` for the same key (null if none).

    Right rows must be unique per (key, time) — pre-aggregate otherwise;
    equal timestamps match inclusively (the right row sorts first).
    """
    rv_type = right.schema[right_value].dataType
    payload = [c for c in left.columns if c != key]

    # left_time/right_time must be mutually comparable (same numeric or
    # timestamp type) — the caller normalizes, this operator doesn't cast.
    l2 = left.select(
        F.col(key),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rv_type).alias("_rv"),
        *payload,
    )
    r2 = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_value).alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in payload],
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l2.unionByName(r2)
        .withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
        .select(key, *payload, F.col("_asof").alias(f"asof_{right_value}"))
    )


def range_join_pairs(
    df: DataFrame,
    key: str,
    time_col: str,
    id_col: str,
    tolerance: int,
) -> DataFrame:
    """Self-join: pairs of rows sharing ``key`` with
    |t_a − t_b| ≤ tolerance and id_a < id_b.

    Time-bucket pruning replaces the quadratic cross join: each row joins
    only its own and neighboring tol-width bins.

    Binning is exact integer *floor* division: double division
    (``(t / tol).cast("long")``) loses bits above 2^53 for int64
    nanosecond timestamps (~1.7e18 > double's mantissa) and truncates
    toward zero for negative times — both misbin boundary rows, dropping
    pairs at exactly |delta| = tolerance.  ``div`` truncates toward zero,
    so subtract 1 when the remainder is negative to get true floor.
    """
    t = F.col(time_col)
    trunc = F.expr(f"`{time_col}` div {int(tolerance)}")
    bin_col: Column = F.when(t % tolerance < 0, trunc - 1).otherwise(trunc)
    a = df.select(
        F.col(key).alias("_k"),
        F.col(time_col).alias("ta"),
        F.col(id_col).alias("ida"),
        bin_col.alias("_bin"),
    )
    b = df.select(
        F.col(key).alias("_k"),
        F.col(time_col).alias("tb"),
        F.col(id_col).alias("idb"),
        F.explode(
            F.array(bin_col - 1, bin_col, bin_col + 1)
        ).alias("_bin"),
    )
    return (
        a.join(b, ["_k", "_bin"])
        .filter(
            (F.col("ida") < F.col("idb"))
            & (F.abs(F.col("ta") - F.col("tb")) <= tolerance)
        )
        .select(F.col("_k").alias(key), "ida", "idb", "ta", "tb")
        .distinct()
    )
