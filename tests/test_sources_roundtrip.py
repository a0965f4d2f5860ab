"""Source/sink coverage: JSON/ORC/CSV roundtrips with explicit schemas,
partitioned parquet writes with partition pruning, compression options."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.plans import formatted_plan
from walmart_e_commerce_sales_data_pipeline_spark.sources import (
    read_csv,
    read_json,
    read_parquet,
    write_parquet,
)


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF0001}/orders.parquet")


def _assert_same_rows(a, b, key="o_orderkey"):
    assert sorted(r[key] for r in a.collect()) == sorted(r[key] for r in b.collect())


def test_json_roundtrip(spark, orders, tmp_path):
    p = str(tmp_path / "orders_json")
    orders.selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS STRING) AS o_orderdate", "o_orderpriority",
    ).write.json(p)
    back = read_json(
        spark, p,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    assert back.count() == orders.count()
    _assert_same_rows(back, orders)


def test_orc_roundtrip(spark, orders, tmp_path):
    p = str(tmp_path / "orders_orc")
    orders.write.orc(p)
    back = spark.read.orc(p)
    assert back.schema == orders.schema
    _assert_same_rows(back, orders)


def test_csv_roundtrip_with_schema(spark, orders, tmp_path):
    p = str(tmp_path / "orders_csv")
    flat = orders.selectExpr(
        "o_orderkey", "o_totalprice", "o_orderstatus",
        "CAST(o_orderdate AS STRING) AS d",
    )
    flat.write.option("header", True).csv(p)
    back = read_csv(
        spark, p, "o_orderkey long, o_totalprice double, o_orderstatus string, d string"
    )
    assert back.count() == orders.count()
    got = {r["o_orderkey"]: r["o_totalprice"] for r in back.collect()}
    want = {r["o_orderkey"]: r["o_totalprice"] for r in flat.collect()}
    assert got == want  # exact double roundtrip through CSV


def test_partitioned_write_prunes_partitions(spark, orders, tmp_path):
    p = str(tmp_path / "orders_by_year")
    with_year = orders.withColumn("y", F.year("o_orderdate"))
    write_parquet(with_year, p, partition_by=["y"])

    back = read_parquet(spark, p)
    pruned = back.filter(F.col("y") == 1996)
    plan = formatted_plan(pruned)
    # partition pruning: the filter moves into PartitionFilters, and the
    # scan must not enumerate non-matching years
    assert "PartitionFilters" in plan
    assert pruned.count() == with_year.filter(F.col("y") == 1996).count()
    # physical layout: one directory per year
    years = {d.name for d in (tmp_path / "orders_by_year").iterdir() if d.is_dir()}
    assert any(d.startswith("y=1996") for d in years)
    assert len(years) >= 5


def test_zstd_compression_option(spark, orders, tmp_path):
    p = str(tmp_path / "orders_zstd")
    orders.write.option("compression", "zstd").parquet(p)
    back = spark.read.parquet(p)
    assert back.count() == orders.count()
    files = list((tmp_path / "orders_zstd").glob("*.zstd.parquet"))
    assert files, "zstd codec suffix expected in file names"


def test_orc_pushdown_and_partition_pruning(spark, orders, tmp_path):
    """The named ORC source/sink must carry the same scale contract as
    parquet: predicates push to the stripe level and partitionBy enables
    partition pruning."""
    from walmart_e_commerce_sales_data_pipeline_spark.sources import (
        read_orc,
        write_orc,
    )

    p = write_orc(orders, str(tmp_path / "orders_orc_part"), partition_by=["o_orderstatus"])
    back = read_orc(spark, p)
    q = back.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000)
    ).select("o_orderkey", "o_totalprice")
    plan = formatted_plan(q)
    # non-partition predicate pushed into the ORC scan
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1].splitlines()[0]
    # partition predicate pruned at planning time, not scanned+filtered
    assert "o_orderstatus" in plan.split("PartitionFilters")[1].splitlines()[0]
    n_f = orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000)
    ).count()
    assert q.count() == n_f > 0
