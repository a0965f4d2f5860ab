"""Distributed exact percentiles vs Spark's sort-buffer built-in."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.operators.percentiles import (
    exact_group_percentiles,
)

PS = [0.5, 0.9, 0.99]


def _builtin(df, keys, col):
    return df.groupBy(*keys).agg(
        *[
            F.expr(f"percentile({col}, {p})").alias(f"p_{i}")
            for i, p in enumerate(PS)
        ]
    )


def test_matches_builtin_on_lineitem(spark):
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    got = {
        tuple(r[:1]): r[1:]
        for r in exact_group_percentiles(li, ["l_returnflag"], "l_extendedprice", PS)
        .orderBy("l_returnflag")
        .collect()
    }
    want = {
        tuple(r[:1]): r[1:]
        for r in _builtin(li, ["l_returnflag"], "l_extendedprice")
        .orderBy("l_returnflag")
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        for g, w in zip(got[k], want[k]):
            # identical interpolation formula on identical doubles — the
            # only legitimate divergence is the float summation order in
            # h = p·(n−1), which is a single multiply; assert bit-level.
            assert g == w, (k, got[k], want[k])


def test_edge_cases_single_and_duplicate_values(spark):
    df = spark.createDataFrame(
        [("a", 5.0)] * 7 + [("b", 1.0), ("b", 2.0)] + [("c", 3.0)],
        "k: string, v: double",
    )
    got = {
        r["k"]: (r["p_0"], r["p_1"], r["p_2"])
        for r in exact_group_percentiles(df, ["k"], "v", PS).collect()
    }
    want = {
        r["k"]: (r["p_0"], r["p_1"], r["p_2"])
        for r in _builtin(df, ["k"], "v").collect()
    }
    assert got == want
    assert got["a"] == (5.0, 5.0, 5.0)  # all-duplicate group
    assert got["c"] == (3.0, 3.0, 3.0)  # singleton group
