"""foreachBatch incremental rollup + catalog DDL (reference O17)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.pipeline import create_sql_tables
from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
    hourly_window_agg,
    read_events_stream,
    stage_stream_dir,
)
from walmart_e_commerce_sales_data_pipeline_spark.streaming.incremental import (
    hourly_rollup_sink,
)


def test_incremental_hourly_rollup(spark, tmp_path):
    out = str(tmp_path / "rollup")
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = hourly_rollup_sink(hourly_window_agg(stream), out).start()
    q.awaitTermination(120)
    q.stop()

    table = spark.read.parquet(out)
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

    batch_truth = hourly_window_agg(events(spark, SF0001))
    got = {str(r["window_start"]): (r["n"], r["sum_value"]) for r in table.collect()}
    want = {str(r["window_start"]): (r["n"], r["sum_value"]) for r in batch_truth.collect()}
    assert got == want
    # physical layout: one partition dir per hour (incremental unit)
    dirs = [d.name for d in (tmp_path / "rollup").iterdir() if d.is_dir()]
    assert all(d.startswith("hour_key=") for d in dirs)
    assert len(dirs) == len(want)


def test_create_sql_tables_catalog(spark):
    import shutil
    from pathlib import Path

    for t in ("clean_sales", "monthly_sales"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(Path("spark-warehouse") / t, ignore_errors=True)
    create_sql_tables(spark)
    tables = {t.name for t in spark.catalog.listTables()}
    assert {"clean_sales", "monthly_sales"} <= tables
    # idempotent (IF NOT EXISTS, reference wallmart_pipeline.py:21-35)
    create_sql_tables(spark)
    schema = {f.name for f in spark.table("clean_sales").schema.fields}
    assert schema == {"Store_ID", "Weekly_Sales", "IsHoliday", "CPI", "Unemployment", "Month"}
    for t in ("clean_sales", "monthly_sales"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
