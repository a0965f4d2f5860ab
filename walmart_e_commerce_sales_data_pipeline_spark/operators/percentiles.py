"""Distributed exact interpolated percentiles.

Spark's built-in ``percentile`` aggregate (like any sort-based exact
quantile) buffers every value of a group in one aggregation state — fine
for small groups, fatal when a single group holds billions of rows at
100 TB (the executor needs the whole group's value multiset in memory).

``exact_group_percentiles`` computes the *identical* interpolated result
with bounded memory everywhere:

1. ``groupBy(keys, value)`` — the value HISTOGRAM per group (one shuffle,
   map-side combinable; distinct values ≪ rows on real data).
2. A per-group running count over the histogram (window ordered by value)
   assigns every distinct value its covered index range [start, end).
3. The target rank h = p·(n−1) needs at most the two distinct values
   covering ⌊h⌋ and ⌈h⌉: an EQUI-join on the group keys against the tiny
   per-group target table plus a residual range filter picks them out,
   and v_lo + (h − ⌊h⌋)·(v_hi − v_lo) is the standard linear
   interpolation both Spark's ``percentile`` and DuckDB's
   ``quantile_cont`` implement.

Per-executor state is one histogram partition plus a constant number of
target rows — no group ever materializes in one buffer.  The window in
step 2 partitions by the group keys; for the pathological single-group ×
billions-of-distinct-values case the same ladder works with a
range-partitioned global sort, which Spark's window already degrades to
per partition.

Equality with the built-in is pinned in tests/test_percentiles.py
(bit-level agreement on the driver testdata before rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_group_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    ps: list[float],
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` per group.

    Returns one row per group with a column ``p_<i>`` for each requested
    percentile (in ``ps`` order), matching
    ``F.expr(f"percentile({value_col}, {p})")`` exactly.
    """
    keys = [F.col(k) for k in key_cols]

    hist = df.groupBy(*keys, F.col(value_col).alias("_v")).agg(
        F.count("*").alias("_c")
    )
    w = Window.partitionBy(*key_cols).orderBy("_v")
    hist = (
        hist.withColumn("_end", F.sum("_c").over(w))
        .withColumn("_start", F.col("_end") - F.col("_c"))
    )

    totals = hist.groupBy(*key_cols).agg(F.max("_end").alias("_n"))
    targets = (
        totals.select(
            *key_cols,
            F.posexplode(F.array(*[F.lit(float(p)) for p in ps])).alias(
                "_pi", "_p"
            ),
            F.col("_n"),
        )
        .withColumn("_h", F.col("_p") * (F.col("_n") - 1))
        .withColumn("_lo", F.floor("_h"))
        .withColumn("_hi", F.ceil("_h"))
    )

    # Equi-join on the group keys; the residual filter keeps only the ≤ 2
    # histogram rows per target that cover the bracketing indices.  The
    # fan-out before the filter is |ps| per histogram row — constant.
    j = hist.join(targets, key_cols)
    covers_lo = (F.col("_start") <= F.col("_lo")) & (F.col("_lo") < F.col("_end"))
    covers_hi = (F.col("_start") <= F.col("_hi")) & (F.col("_hi") < F.col("_end"))
    per = (
        j.filter(covers_lo | covers_hi)
        .groupBy(*key_cols, "_pi", "_h", "_lo", "_hi")
        .agg(
            F.max(F.when(covers_lo, F.col("_v"))).alias("_vlo"),
            F.max(F.when(covers_hi, F.col("_v"))).alias("_vhi"),
        )
        .withColumn(
            # Spark's Percentile.getPercentile association, reproduced
            # bit-for-bit: lower·(1−frac) + higher·frac.  (The algebraic
            # twin lower + frac·(higher−lower) differs in the last ulp —
            # the parity test asserts bit-level equality with the
            # built-in, so the association must match exactly.)
            "_val",
            F.col("_vlo") * (F.lit(1.0) - (F.col("_h") - F.col("_lo")))
            + F.col("_vhi") * (F.col("_h") - F.col("_lo")),
        )
    )

    agg_cols = [
        F.max(F.when(F.col("_pi") == i, F.col("_val"))).alias(f"p_{i}")
        for i in range(len(ps))
    ]
    return per.groupBy(*key_cols).agg(*agg_cols)
