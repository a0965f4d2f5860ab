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


def test_dispatch_boundary_probe_and_overflow(spark):
    """The bounded-dispatch contract: a parquet-scan input is sized from
    footer metadata (no job), results below the threshold are the exact
    ladder (unchanged), and above the threshold the operator routes to the
    documented overflow path — percentile_approx with the same schema, or
    a hard error when asked to."""
    import pytest

    from walmart_e_commerce_sales_data_pipeline_spark.operators.percentiles import (
        _histogram_rows_bound,
    )

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    method, bound = _histogram_rows_bound(li, "l_extendedprice")
    assert method == "footer"          # plain scan: zero-job sizing
    assert bound >= li.count()

    # derived-but-row-reducing frame: the footer bound still applies
    # (aggregation above a scan can only drop rows)
    method1, bound1 = _histogram_rows_bound(
        li.groupBy("l_orderkey").agg(F.avg("l_extendedprice").alias("v")), "v"
    )
    assert method1 == "footer" and bound1 >= 0

    # no parquet leaves at all: falls back to the HLL pass
    mem = spark.createDataFrame([(float(i % 7),) for i in range(100)], "v: double")
    method2, bound2 = _histogram_rows_bound(mem, "v")
    assert method2 == "hll" and 0 < bound2 < 20

    # below the boundary nothing changes: exact ladder, bit-equal to the
    # built-in (the default threshold is far above this input)
    exact = exact_group_percentiles(li, ["l_returnflag"], "l_extendedprice", PS)

    # force the boundary under the input size: approx dispatch, same schema
    approx = exact_group_percentiles(
        li, ["l_returnflag"], "l_extendedprice", PS, max_histogram_rows=10
    )
    assert approx.columns == exact.columns
    want = {
        r["l_returnflag"]: tuple(r[1:])
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.percentile_approx("l_extendedprice", F.lit(p), F.lit(10_000))
                .cast("double")
                .alias(f"p_{i}")
                for i, p in enumerate(PS)
            ]
        )
        .collect()
    }
    got = {r["l_returnflag"]: tuple(r[1:]) for r in approx.collect()}
    assert got == want

    # the histogram window really is gone from the overflow plan
    from walmart_e_commerce_sales_data_pipeline_spark.plans import formatted_plan

    assert "Window" not in formatted_plan(approx)

    # error mode names the probe and the threshold
    with pytest.raises(ValueError, match="max_histogram_rows"):
        exact_group_percentiles(
            li,
            ["l_returnflag"],
            "l_extendedprice",
            PS,
            max_histogram_rows=10,
            on_overflow="error",
        )

    # forced-exact mode skips the probe entirely and stays exact
    forced = exact_group_percentiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        PS,
        max_histogram_rows=10,
        on_overflow="exact",
    )
    a = {r["l_returnflag"]: tuple(r[1:]) for r in forced.collect()}
    b = {r["l_returnflag"]: tuple(r[1:]) for r in exact.collect()}
    assert a == b


def test_caller_supplied_bound_skips_probe(spark):
    """histogram_rows_bound short-circuits the sizing probe: with a hint
    the dispatch trusts the caller (verified by feeding a frame the HLL
    probe would size ABOVE a tiny threshold, yet a small hint keeps the
    exact ladder), the error path names the caller probe, and the ladder
    output is identical with and without the hint."""
    import pytest

    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    base = exact_group_percentiles(
        li, ["l_returnflag"], "l_extendedprice", PS
    ).collect()
    hinted = exact_group_percentiles(
        li, ["l_returnflag"], "l_extendedprice", PS,
        histogram_rows_bound=li.count(),
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, hinted))

    # a small hint keeps the exact ladder even under a tiny threshold the
    # real probe would overflow — proof the probe never ran
    small = exact_group_percentiles(
        li, ["l_returnflag"], "l_extendedprice", PS,
        max_histogram_rows=10, histogram_rows_bound=5,
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, small))

    # and an over-threshold hint raises with the caller attribution
    with pytest.raises(ValueError, match="caller probe"):
        exact_group_percentiles(
            li, ["l_returnflag"], "l_extendedprice", PS,
            max_histogram_rows=10, on_overflow="error",
            histogram_rows_bound=11,
        )
