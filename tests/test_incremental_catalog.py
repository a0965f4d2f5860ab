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


def test_keyed_upsert_sink_is_order_safe(spark, tmp_path):
    """The CDC upsert sink must converge to the batch latest-per-key state
    even when a later micro-batch delivers OLDER rows for a key (replayed
    file / late partition): last-writer-wins by event time, not arrival
    order."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.incremental import (
        keyed_upsert_sink,
    )

    src = tmp_path / "changes"
    src.mkdir()
    table = str(tmp_path / "state")
    schema = "user_id long, ts long, state string"

    def wave(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    all_rows = []

    def run_wave(name, rows):
        all_rows.extend(rows)
        wave(name, rows)
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = keyed_upsert_sink(stream, table, "user_id", "ts").option(
            "checkpointLocation", str(tmp_path / "ckpt")
        ).start()
        q.awaitTermination()

    run_wave("w1", [(1, 100, "a"), (2, 100, "a"), (3, 100, "a")])
    # wave 2: key 1 advances, key 2 gets an OLDER row (must NOT win),
    # key 4 appears
    run_wave("w2", [(1, 200, "b"), (2, 50, "stale"), (4, 120, "a")])
    # wave 3: key 2 advances for real; key 4 ties on ts with a larger
    # payload (lexicographic struct tiebreak, same as the batch query)
    run_wave("w3", [(2, 300, "c"), (4, 120, "z")])

    got = {
        r["user_id"]: (r["ts"], r["state"])
        for r in spark.read.parquet(table).collect()
    }
    batch = spark.createDataFrame(all_rows, schema)
    from pyspark.sql import functions as F

    expect = {
        r["user_id"]: (r["m"]["ts"], r["m"]["state"])
        for r in batch.groupBy("user_id")
        .agg(F.max(F.struct("ts", "state")).alias("m"))
        .collect()
    }
    assert got == expect
    assert got[2] == (300, "c") and got[1] == (200, "b")
    assert got[4] == (120, "z")  # tie resolved lexicographically
