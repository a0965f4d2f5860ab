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


def test_stream_stream_left_outer_equals_batch(spark, tmp_path):
    """Abandonment shape: views with no qualifying purchase must surface
    exactly once with null purchase columns.  Batch emits the nulls
    immediately; the stream may only emit a null once the joint watermark
    proves no qualifying purchase can still arrive, so the tail of the
    stream is closed with far-future sentinel events on BOTH sides (the
    global watermark is the min across inputs) and the sentinels are
    excluded from the comparison."""
    import datetime

    SENTINEL_BASE = 10**12
    ev = load_events(spark, SF0001)
    batch_views, batch_buys = _split(ev)
    batch_rows = {
        (r["view_id"], r["purchase_id"])
        for r in attribution_join(batch_views, batch_buys, how="leftOuter").collect()
    }
    assert any(p is None for _, p in batch_rows), "corpus should have abandons"
    assert any(p is not None for _, p in batch_rows)

    far = ev.agg(F.max("ts")).first()[0] + datetime.timedelta(days=2)
    sentinel = spark.createDataFrame(
        [
            (SENTINEL_BASE, far, 999_999_901, "view", 0.0, "{}"),
            (SENTINEL_BASE + 1, far, 999_999_902, "purchase", 0.0, "{}"),
        ],
        spark.read.parquet(f"{SF0001}/events.parquet").schema,
    )
    sent_path = str(tmp_path / "sentinel.parquet")
    sentinel.coalesce(1).write.parquet(sent_path)
    import glob

    sent_file = glob.glob(f"{sent_path}/part-*.parquet")[0]

    s1 = read_events_stream(
        spark, stage_stream_dir(f"{SF0001}/events.parquet", sent_file)
    )
    s2 = read_events_stream(
        spark, stage_stream_dir(f"{SF0001}/events.parquet", sent_file)
    )
    sv, sb = _split(s1)[0], _split(s2)[1]
    q = (
        attribution_join(sv, sb, how="leftOuter")
        .writeStream.format("memory")
        .queryName("attr_outer_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()
    stream_rows = {
        (r["view_id"], r["purchase_id"])
        for r in spark.sql(
            "SELECT view_id, purchase_id FROM attr_outer_test"
        ).collect()
        if r["view_id"] < SENTINEL_BASE
    }
    assert stream_rows == batch_rows


def test_join_then_forward_decay_composition_equals_batch(spark, tmp_path):
    """TWO chained stateful operators — the watermarked stream-stream
    attribution join feeding the forward-decay accumulator — must equal
    the same composition over batch frames.  This is the production
    shape the forward organization exists for: the join emits attributed
    conversions as they resolve, and the decayed per-user engagement
    cells accumulate downstream by plain addition, no re-weighting —
    composable precisely because each conversion's weight depends only
    on ITS event time, never on "now".  Append mode (the only mode Spark
    allows for an aggregation after a stream-stream join), so the tail
    closes with far-future sentinels on both sides and a short agg
    watermark."""
    import datetime
    import glob

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_forward_decay,
    )

    SENTINEL_BASE = 10**12

    def conversions(pairs):
        return pairs.select(
            "user_id",
            F.col("purchase_ts").alias("ts"),
            F.lit(1.0).alias("value"),  # 100 cents per attributed conversion
        )

    ev = load_events(spark, SF0001)
    batch_views, batch_buys = _split(ev)
    batch = {
        (str(r["window_start"]), r["user_id"]): (r["n_events"], r["acc_fw"])
        for r in hourly_user_forward_decay(
            conversions(attribution_join(batch_views, batch_buys))
        ).collect()
    }
    assert batch, "corpus should have attributed conversions"

    far = ev.agg(F.max("ts")).first()[0] + datetime.timedelta(days=2)
    sentinel = spark.createDataFrame(
        [
            (SENTINEL_BASE, far, 999_999_901, "view", 0.0, "{}"),
            (SENTINEL_BASE + 1, far, 999_999_902, "purchase", 0.0, "{}"),
        ],
        spark.read.parquet(f"{SF0001}/events.parquet").schema,
    )
    sent_path = str(tmp_path / "sentinel.parquet")
    sentinel.coalesce(1).write.parquet(sent_path)
    sent_file = glob.glob(f"{sent_path}/part-*.parquet")[0]

    s1 = read_events_stream(
        spark, stage_stream_dir(f"{SF0001}/events.parquet", sent_file)
    )
    s2 = read_events_stream(
        spark, stage_stream_dir(f"{SF0001}/events.parquet", sent_file)
    )
    sv, sb = _split(s1)[0], _split(s2)[1]
    q = (
        hourly_user_forward_decay(
            conversions(attribution_join(sv, sb)), watermark="2 hours"
        )
        .writeStream.format("memory")
        .queryName("join_decay_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    q.stop()
    got = {
        (str(r["window_start"]), r["user_id"]): (r["n_events"], r["acc_fw"])
        for r in spark.sql("SELECT * FROM join_decay_test").collect()
        if r["user_id"] < SENTINEL_BASE
    }
    assert got == batch
