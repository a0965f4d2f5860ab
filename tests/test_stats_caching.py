"""Catalog statistics (ANALYZE TABLE → CBO inputs) and cache management."""

from __future__ import annotations

from tests.conftest import SF0001


def test_analyze_table_statistics(spark):
    import shutil
    from pathlib import Path

    spark.sql("DROP TABLE IF EXISTS stats_orders")
    shutil.rmtree(Path("spark-warehouse") / "stats_orders", ignore_errors=True)
    spark.read.parquet(f"{SF0001}/orders.parquet").write.saveAsTable("stats_orders")
    try:
        spark.sql("ANALYZE TABLE stats_orders COMPUTE STATISTICS FOR ALL COLUMNS")
        detail = {
            r["col_name"]: r["data_type"]
            for r in spark.sql("DESCRIBE TABLE EXTENDED stats_orders").collect()
        }
        assert "Statistics" in detail  # table-level sizeInBytes + rowCount
        assert "rows" in detail["Statistics"]
        col = {
            r["info_name"]: r["info_value"]
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED stats_orders o_custkey"
            ).collect()
        }
        assert col.get("distinct_count") is not None  # NDV feeds join estimates
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_orders")


def test_cache_table_plan_and_release(spark):
    df = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    df.createOrReplaceTempView("cache_li")
    spark.catalog.cacheTable("cache_li")
    try:
        spark.table("cache_li").count()  # materialize
        assert spark.catalog.isCached("cache_li")
        plan = spark.table("cache_li")._jdf.queryExecution().executedPlan().toString()
        # Spark 4 renders the cached relation as "Scan In-memory table"
        assert "In-memory table" in plan or "InMemoryTableScan" in plan
    finally:
        spark.catalog.uncacheTable("cache_li")
        assert not spark.catalog.isCached("cache_li")
