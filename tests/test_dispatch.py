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


def test_null_keys_excluded_from_estimate(spark):
    """r17 ADVICE pin: xxhash64 ignores NULL inputs, so unfiltered NULL
    join keys from both sides would share a bucket per depth row and the
    estimator would gain phantom NULLxNULL matches.  NULL-key rows must
    be invisible: counts cover joinable rows only and est_join is
    unchanged by however many NULL-key rows ride along."""
    left = spark.range(0, 1000).select(
        (F.col("id") % 100).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(0, 600).select(
        (F.col("id") % 100).alias("k"), (F.col("id") * 3).alias("rv")
    )
    clean = estimate_join_stats(left, right, "k")
    nulls_l = spark.range(0, 5000).select(
        F.lit(None).cast("long").alias("k"), F.col("id").alias("lv")
    )
    nulls_r = spark.range(0, 5000).select(
        F.lit(None).cast("long").alias("k"), (F.col("id") * 3).alias("rv")
    )
    noisy = estimate_join_stats(
        left.unionByName(nulls_l), right.unionByName(nulls_r), "k"
    )
    assert noisy == clean
    assert noisy["n_left"] == 1000 and noisy["n_right"] == 600
    exact = left.join(right, "k").count()
    assert noisy["est_join"] >= exact > 0


def test_bucketed_tier_skips_sketches_and_plans_shuffle_free(spark):
    """r17 VERDICT item 5: matching bucket specs on both sides dispatch
    to the "bucketed" strategy — no sketch aggregates run (asserted via
    the Spark job counter), the plan has no Exchange over either scan,
    and the result is row-identical to the plain join."""
    import shutil
    from pathlib import Path

    from walmart_e_commerce_sales_data_pipeline_spark.operators.bucketing import (
        table_bucket_spec,
        write_bucketed,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.plans import (
        execution_count,
        formatted_plan,
    )

    for t in ("disp_l_b", "disp_r_b", "disp_r_b6"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(Path("spark-warehouse") / t, ignore_errors=True)
    left = spark.range(0, 3000).select(
        (F.col("id") % 400).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(0, 1500).select(
        (F.col("id") % 400).alias("k"), (F.col("id") * 7).alias("rv")
    )
    write_bucketed(left, "disp_l_b", "k", buckets=4)
    write_bucketed(right, "disp_r_b", "k", buckets=4)
    bl = spark.table("disp_l_b")
    br = spark.table("disp_r_b")
    assert table_bucket_spec(bl) == (4, ["k"])
    # detection sees through a filter/projection on the bucketed scan
    assert table_bucket_spec(bl.filter(F.col("lv") >= 0)) == (4, ["k"])
    # a join result is NOT a bucketed table
    assert table_bucket_spec(bl.join(br, "k")) is None

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        mark = execution_count(spark)
        joined, strategy, stats = size_dispatched_join(bl, br, "k")
        # the sketch pass runs two aggregates + a 1-row collect — the
        # bucketed tier must not have executed ANY job yet
        assert execution_count(spark) == mark
        assert strategy == "bucketed"
        assert stats["n_buckets"] == 4 and stats["est_join"] is None
        plan = formatted_plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        expect = sorted(map(tuple, left.join(right, "k").collect()))
        assert sorted(map(tuple, joined.collect())) == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # MISMATCHED bucket counts do not co-locate: the dispatcher must
    # fall through to the sketch tiers, not fake a "bucketed" verdict
    write_bucketed(right, "disp_r_b6", "k", buckets=6)
    try:
        joined2, strategy2, stats2 = size_dispatched_join(
            bl, spark.table("disp_r_b6"), "k"
        )
        assert strategy2 != "bucketed"
        assert stats2["n_left"] == 3000 and stats2["n_right"] == 1500
        assert sorted(map(tuple, joined2.collect())) == expect
    finally:
        for t in ("disp_l_b", "disp_r_b", "disp_r_b6"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
