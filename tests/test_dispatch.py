"""Join-strategy dispatch pins (operators/dispatch.py): the sketch
estimator's overestimate law, the broadcast plan assertion, the
planted-skew crossover to the salted path, and row-identical semantics
on every path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walmart_e_commerce_sales_data_pipeline_spark.operators.dispatch import (
    estimate_join_stats,
    size_dispatched_join,
)


@pytest.fixture(scope="module")
def uniform_sides(spark):
    left = spark.range(0, 4000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 7).alias("rv")
    )
    return left, right


def test_estimator_never_underestimates(spark, uniform_sides):
    """AMS/CMS law: every depth row's inner product >= the true join
    size, so the min is too — est >= exact, and counts are exact."""
    left, right = uniform_sides
    stats = estimate_join_stats(left, right, "k")
    exact = left.join(right, "k").count()
    assert stats["n_left"] == 4000 and stats["n_right"] == 2000
    assert stats["est_join"] >= exact > 0


def test_broadcast_path_plan_and_semantics(spark, uniform_sides):
    """A side under the row threshold gets the broadcast hint on the
    SMALLER side — asserted in the physical plan — and the result is
    row-identical to the plain join."""
    left, right = uniform_sides
    joined, strategy, stats = size_dispatched_join(
        left, right, "k", broadcast_limit=2000
    )
    assert strategy == "broadcast"
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    # the build side is the smaller (right, 2000 rows) relation
    assert "BuildRight" in plan
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, left.join(right, "k").collect())
    )


def test_planted_skew_dispatches_salted_and_matches(spark):
    """One hot key holding half of each side: the estimated output
    (~hot^2) explodes past explosion_factor * (n_l + n_r), so the
    dispatch routes through the salted join — and the salted result is
    row-identical to the plain join (spot-checked by count + per-key
    counts, the frame is ~4M rows)."""
    hot = 2000
    left = spark.range(0, 2 * hot).select(
        F.when(F.col("id") < hot, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 2 * hot).select(
        F.when(F.col("id") < hot, 0).otherwise(-F.col("id")).alias("k"),
        F.col("id").alias("rv"),
    )
    joined, strategy, stats = size_dispatched_join(
        left,
        right,
        "k",
        broadcast_limit=1000,  # both sides are 4000 rows: no broadcast
        explosion_factor=8.0,
        salt_cols=["lv"],
    )
    assert strategy == "salted"
    assert stats["est_join"] >= hot * hot
    assert stats["est_join"] > 8.0 * (stats["n_left"] + stats["n_right"])
    plain = left.join(right, "k")
    assert joined.count() == plain.count() == hot * hot
    got = {
        (r["k"], r["n"]): 1
        for r in joined.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        (r["k"], r["n"]): 1
        for r in plain.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want
    assert joined.columns == plain.columns


def test_uniform_midsize_stays_shuffle(spark, uniform_sides):
    """No skew, both sides over the broadcast threshold: plain shuffle
    equi-join (AQE keeps runtime skew handling), identical rows."""
    left, right = uniform_sides
    joined, strategy, stats = size_dispatched_join(
        left, right, "k", broadcast_limit=100, salt_cols=["lv"]
    )
    assert strategy == "shuffle"
    assert joined.count() == left.join(right, "k").count()


def test_salted_swap_preserves_column_order(spark):
    """When the BIGGER side is the right one, the salted path swaps
    sides internally but the emitted column order still matches
    left.join(right, key)."""
    hot = 1500
    left = spark.range(0, hot).select(F.lit(0).alias("k"), F.col("id").alias("lv"))
    right = spark.range(0, 2 * hot).select(
        F.when(F.col("id") < hot, 0).otherwise(F.col("id") + 10_000).alias("k"),
        F.col("id").alias("rv"),
    )
    joined, strategy, stats = size_dispatched_join(
        left, right, "k", broadcast_limit=100, salt_cols=["rv"]
    )
    assert strategy == "salted"
    plain = left.join(right, "k")
    assert joined.columns == plain.columns
    assert joined.count() == plain.count() == hot * hot
