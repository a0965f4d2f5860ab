"""Operator-level tests for the temporal joins (as-of, bounded-range).

The range-join binning test targets the exact-arithmetic edge cases:
negative timestamps (floor vs truncate-toward-zero) and pairs at exactly
|delta| = tolerance, both against a brute-force cross-join oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from walmart_e_commerce_sales_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_pairs,
)


def _brute_force_pairs(spark, rows, tolerance):
    out = set()
    for k1, t1, i1 in rows:
        for k2, t2, i2 in rows:
            if k1 == k2 and i1 < i2 and abs(t1 - t2) <= tolerance:
                out.add((k1, i1, i2))
    return out


def test_range_join_exact_boundaries_and_negatives(spark):
    tol = 100
    rows = [
        # exact-tolerance boundary pair (delta == tol, straddling a bin edge)
        ("a", 99, 1), ("a", 199, 2),
        # negative timestamps: floor(-1/100) = -1, truncation would say 0
        ("b", -1, 3), ("b", 1, 4),
        ("b", -100, 5), ("b", 0, 6),       # delta == tol across zero
        ("b", -250, 7), ("b", -150, 8),    # fully negative, delta == tol
        # outside tolerance — must not pair
        ("c", 0, 9), ("c", 101, 10),
        ("c", -300, 11), ("c", -199, 12),
        # large int64-ns-scale values beyond double's 53-bit mantissa
        ("d", 1_700_000_000_000_000_000, 13),
        ("d", 1_700_000_000_000_000_100, 14),
        ("d", 1_700_000_000_000_000_201, 15),
    ]
    df = spark.createDataFrame(rows, ["k", "t", "id"])
    got = {
        (r["k"], r["ida"], r["idb"])
        for r in range_join_pairs(df, "k", "t", "id", tol).collect()
    }
    assert got == _brute_force_pairs(spark, rows, tol)


def test_asof_join_latest_value(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("a", 5, "L0"), ("b", 7, "L3")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 8, 3.0)],
        ["k", "rt", "v"],
    )
    got = {
        (r["k"], r["tag"], r["asof_v"])
        for r in asof_join(left, right, "k", "t", "rt", "v").collect()
    }
    # equal timestamps match inclusively; no earlier right row -> null
    assert got == {
        ("a", "L0", None),
        ("a", "L1", 1.0),
        ("a", "L2", 2.0),
        ("b", "L3", None),
    }
