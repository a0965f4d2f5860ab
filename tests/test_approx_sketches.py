"""Approximate aggregates (HLL count-distinct, quantile sketches): no SQL
oracle possible (engine-specific sketches), so accuracy is asserted against
exact answers with the documented error bounds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF001


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF001}/orders.parquet")


def test_approx_count_distinct_within_bound(spark, orders):
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
    ).first()
    assert row["approx"] == pytest.approx(row["exact"], rel=0.06)  # 3σ of rsd=2%


def test_approx_percentile_close_to_exact(spark, orders):
    row = orders.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
    ).first()
    assert row["approx"] == pytest.approx(row["exact"], rel=0.01)


def test_approx_count_distinct_grouped_is_deterministic(spark, orders):
    a = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("n")
    ).collect()
    b = orders.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("n")
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # HLL is deterministic
