"""Stream-stream interval join must produce exactly the batch join's pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events as load_events
from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
    read_events_stream,
    stage_stream_dir,
)
from walmart_e_commerce_sales_data_pipeline_spark.streaming.joins import attribution_join


def _split(ev):
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    return views, buys


def test_stream_stream_attribution_equals_batch(spark):
    batch_views, batch_buys = _split(load_events(spark, SF0001))
    batch_pairs = {
        (r["view_id"], r["purchase_id"])
        for r in attribution_join(batch_views, batch_buys).collect()
    }
    assert batch_pairs, "testdata should contain attributable pairs"

    # same parquet file as two independent streams
    s1 = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    s2 = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    sv, sb = _split(s1)[0], _split(s2)[1]
    q = (
        attribution_join(sv, sb)
        .writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    stream_pairs = {
        (r["view_id"], r["purchase_id"])
        for r in spark.sql("SELECT view_id, purchase_id FROM attr_test").collect()
    }
    assert stream_pairs == batch_pairs
