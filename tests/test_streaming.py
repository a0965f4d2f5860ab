"""Structured Streaming tests: the same transformations must produce the
same results over a stream (file source, availableNow trigger) as over the
batch DataFrame, and the native session_window must agree with the
oracle-checked lag+cumsum sessionization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.queries.events import (
    events_sessionization,
)
from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events as load_events
from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
    VALUE_HIST_BUCKETS,
    hourly_user_cms,
    hourly_value_histogram,
    hourly_window_agg,
    read_events_stream,
    run_stream_to_memory,
    session_window_agg,
    stage_stream_dir,
)


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_events(spark, SF0001)


def test_streaming_hourly_equals_batch(spark, events_batch, tmp_path_factory):
    batch = {
        (str(r["window_start"]), r["n"]): r["sum_value"]
        for r in hourly_window_agg(events_batch).collect()
    }

    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    assert stream.isStreaming
    q = run_stream_to_memory(hourly_window_agg(stream), "hourly_test", mode="complete")
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["n"]): r["sum_value"]
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0


def test_streaming_hourly_cms_equals_batch_and_bounds_state(spark, events_batch):
    """The per-hour count-min sketch must emit identical counter cells from
    the stream and the batch plan, keep at most depth*width cells of state
    per hour (user cardinality never enters the key domain), and its
    point-query estimate must dominate the exact per-user count."""
    import hashlib

    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        _CMS_DEPTH,
        _CMS_WIDTH,
    )

    batch = {
        (str(r["window_start"]), r["r"], r["b"]): r["c"]
        for r in hourly_user_cms(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(hourly_user_cms(stream), "cms_hourly_test", mode="complete")
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["r"], r["b"]): r["c"]
        for r in spark.sql("SELECT * FROM cms_hourly_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0
    per_hour: dict[str, int] = {}
    for (w, _r, _b) in got:
        per_hour[w] = per_hour.get(w, 0) + 1
    assert all(v <= _CMS_DEPTH * _CMS_WIDTH for v in per_hour.values())
    # Point query for the busiest (hour, user): min over the 4 probed
    # cells >= the exact count (buckets recomputed independently here).
    top = (
        events_batch.groupBy(
            F.window("ts", "1 hour").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
        .first()
    )
    h = hashlib.md5(str(top["user_id"]).encode()).hexdigest()
    w_start = str(top["w"]["start"])
    est = min(
        batch[(w_start, r, int(h[2 * r : 2 * r + 2], 16))]
        for r in range(_CMS_DEPTH)
    )
    assert est >= top["n"]


def test_streaming_value_histogram_equals_batch_and_bounds_state(
    spark, events_batch
):
    """The fixed-bounds per-hour value histogram — the streaming form of
    the quantile sketch — must emit identical cells from stream and
    batch, keep at most VALUE_HIST_BUCKETS cells of state per hour, and
    stay count-total (cells sum to the hour's event count)."""
    batch = {
        (str(r["window_start"]), r["bk"]): r["c"]
        for r in hourly_value_histogram(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q_ = run_stream_to_memory(
        hourly_value_histogram(stream), "vhist_test", mode="complete"
    )
    q_.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["bk"]): r["c"]
        for r in spark.sql("SELECT * FROM vhist_test").collect()
    }
    q_.stop()
    assert got == batch
    assert len(got) > 0
    per_hour: dict[str, int] = {}
    totals: dict[str, int] = {}
    for (w, _bk), c in got.items():
        per_hour[w] = per_hour.get(w, 0) + 1
        totals[w] = totals.get(w, 0) + c
    assert all(v <= VALUE_HIST_BUCKETS for v in per_hour.values())
    n_events = events_batch.count()
    assert sum(totals.values()) == n_events  # clamping keeps counts total


def test_streaming_hourly_bloom_equals_batch_and_bounds_state(
    spark, events_batch
):
    """The per-hour Bloom filter (membership — the third streaming sketch
    family beside CMS frequency and histogram quantiles) must emit the
    identical set-bit rows from stream and batch, keep at most
    _BLOOM_BITS rows of state per hour, and never produce a false
    NEGATIVE: every user active in an hour must pass that hour's filter
    (probes recomputed independently here)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        _BLOOM_BITS,
        _BLOOM_K,
        _bloom_pos_sql,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_bloom,
    )

    batch = {
        (str(r["window_start"]), r["pos"])
        for r in hourly_user_bloom(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_user_bloom(stream), "bloom_hourly_test", mode="complete"
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["pos"])
        for r in spark.sql("SELECT * FROM bloom_hourly_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0
    per_hour: dict[str, int] = {}
    for (w, _pos) in got:
        per_hour[w] = per_hour.get(w, 0) + 1
    assert all(v <= _BLOOM_BITS for v in per_hour.values())
    # No false negatives: every (hour, active user) probes all-k-set.
    probes = events_batch.select(
        F.window("ts", "1 hour").getField("start").alias("w"),
        F.md5(F.col("user_id").cast("string")).alias("h"),
    ).select(
        "w",
        *[F.expr(_bloom_pos_sql("h", s)).alias(f"p{s}") for s in range(_BLOOM_K)],
    )
    for r in probes.distinct().collect():
        for s in range(_BLOOM_K):
            assert (str(r["w"]), r[f"p{s}"]) in got


def test_streaming_hourly_hll_equals_batch_and_bounds_state(spark, events_batch):
    """The per-hour HLL register array (cardinality — the fourth and final
    streaming sketch family) must emit identical registers from stream and
    batch, keep at most 256 rows of state per hour, merge across hours by
    elementwise MAX into exactly the whole-window registers, and its
    readout must estimate within HLL's error band on this data."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        _HLL_M,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_hll,
    )

    batch = {
        (str(r["window_start"]), r["bucket"]): r["m_j"]
        for r in hourly_user_hll(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_user_hll(stream), "hll_hourly_test", mode="complete"
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["bucket"]): r["m_j"]
        for r in spark.sql("SELECT * FROM hll_hourly_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0
    per_hour: dict[str, int] = {}
    for (w, _b) in got:
        per_hour[w] = per_hour.get(w, 0) + 1
    assert all(v <= _HLL_M for v in per_hour.values())
    # Merge law: elementwise max of the per-hour registers == the registers
    # of the SAME sketch built over the whole feed (one "coarser window").
    merged: dict[int, int] = {}
    for (_w, b), m_j in got.items():
        merged[b] = max(merged.get(b, 0), m_j)
    whole = {
        r["bucket"]: r["m_j"]
        for r in hourly_user_hll(
            events_batch.withColumn(
                "ts", F.lit("2024-01-01 00:30:00").cast("timestamp")
            )
        ).collect()
    }
    assert merged == whole


def test_streaming_sliding_hll_equals_batch_and_bounds_state(spark, events_batch):
    """The sliding-window form (24h window / 6h slide — the rolling-actives
    board) must emit identical registers from stream and batch, and state
    stays <= 256 rows PER WINDOW with each event feeding exactly
    window/slide = 4 windows (the only state multiplier)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        _HLL_M,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_hll,
    )

    kw = dict(window="24 hours", slide="6 hours")
    batch = {
        (str(r["window_start"]), r["bucket"]): r["m_j"]
        for r in hourly_user_hll(events_batch, **kw).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_user_hll(stream, **kw), "hll_sliding_test", mode="complete"
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["bucket"]): r["m_j"]
        for r in spark.sql("SELECT * FROM hll_sliding_test").collect()
    }
    q.stop()
    assert got == batch
    per_window: dict[str, int] = {}
    for (w, _b) in got:
        per_window[w] = per_window.get(w, 0) + 1
    assert len(per_window) == 123  # 30 days / 6h slide + 3 edge windows
    assert all(v <= _HLL_M for v in per_window.values())


def test_streaming_hourly_kmv_equals_batch_and_bounds_state(spark, events_batch):
    """The per-hour KMV minimum signature (cardinality with set algebra —
    the fifth and final streaming sketch family) must emit identical
    signatures from stream and batch, keep at most 64 rows of state per
    hour, and merge across hours by elementwise MIN into exactly the
    whole-window signature (the HLL MAX-register argument with the order
    flipped)."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        KMV_BUCKETS,
        hourly_user_kmv,
    )

    batch = {
        (str(r["window_start"]), r["bucket"]): r["min_rest"]
        for r in hourly_user_kmv(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_user_kmv(stream), "kmv_hourly_test", mode="complete"
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["bucket"]): r["min_rest"]
        for r in spark.sql("SELECT * FROM kmv_hourly_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0
    per_hour: dict[str, int] = {}
    for (w, _b) in got:
        per_hour[w] = per_hour.get(w, 0) + 1
    assert all(v <= KMV_BUCKETS for v in per_hour.values())
    # Merge law: elementwise min of the per-hour signatures == the
    # signature of the SAME sketch built over the whole feed.
    merged: dict[int, int] = {}
    for (_w, b), m in got.items():
        merged[b] = min(merged.get(b, m), m)
    whole = {
        r["bucket"]: r["min_rest"]
        for r in hourly_user_kmv(
            events_batch.withColumn(
                "ts", F.lit("2024-01-01 00:30:00").cast("timestamp")
            )
        ).collect()
    }
    assert merged == whole


def test_kmv_estimator_branch_on_dense_synthetic_hour(spark):
    """The sf0.001 feed's 4-28 users/hour always lands in the linear-
    counting branch, so the k(k-1)/sum(min) estimator branch is pinned
    here on a synthetic hour dense enough to fill all 64 buckets: the
    estimate must land within the order-statistics error band
    (~2/sqrt(k) = 25 %) of the true cardinality."""
    import math

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        KMV_BUCKETS,
        KMV_REST_MOD,
        hourly_user_kmv,
    )

    n = 5000
    ev = spark.range(n).select(
        F.lit("2024-01-01 00:30:00").cast("timestamp").alias("ts"),
        F.concat(F.lit("user_"), F.col("id")).alias("user_id"),
    )
    sig = hourly_user_kmv(ev).collect()
    assert len(sig) == KMV_BUCKETS  # n >> k ln k: every bucket occupied
    s_min = sum((r["min_rest"] + 1) / KMV_REST_MOD for r in sig)
    est = KMV_BUCKETS * (KMV_BUCKETS - 1) / s_min
    assert abs(est - n) / n <= 2.0 / math.sqrt(KMV_BUCKETS), (est, n)


def test_sliding_params_on_all_sketch_twins(spark, events_batch):
    """All four sketch twins accept window/slide; in the sliding form each
    event feeds exactly window/slide windows, so per-family totals obey
    the overlap identity vs their tumbling defaults: 4x the cell mass for
    the counting sketches (CMS cells, histogram counts), and per-window
    state stays within each family's fixed bound."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        _CMS_DEPTH,
        _CMS_WIDTH,
        _HLL_M,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        _BLOOM_BITS,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_bloom,
        hourly_user_cms,
        hourly_user_hll,
        hourly_value_histogram,
    )

    kw = dict(window="24 hours", slide="6 hours")
    n_events = events_batch.count()

    cms = hourly_user_cms(events_batch, **kw).collect()
    assert sum(r["c"] for r in cms) == 4 * n_events * _CMS_DEPTH
    per_w: dict = {}
    for r in cms:
        per_w[str(r["window_start"])] = per_w.get(str(r["window_start"]), 0) + 1
    assert all(v <= _CMS_DEPTH * _CMS_WIDTH for v in per_w.values())

    hist = hourly_value_histogram(events_batch, **kw).collect()
    assert sum(r["c"] for r in hist) == 4 * n_events  # counts stay total x4
    per_w = {}
    for r in hist:
        per_w[str(r["window_start"])] = per_w.get(str(r["window_start"]), 0) + 1
    assert all(v <= VALUE_HIST_BUCKETS for v in per_w.values())

    bloom = hourly_user_bloom(events_batch, **kw).collect()
    per_w = {}
    for r in bloom:
        per_w[str(r["window_start"])] = per_w.get(str(r["window_start"]), 0) + 1
    assert all(v <= _BLOOM_BITS for v in per_w.values())

    hll = hourly_user_hll(events_batch, **kw).collect()
    per_w = {}
    for r in hll:
        per_w[str(r["window_start"])] = per_w.get(str(r["window_start"]), 0) + 1
    assert all(v <= _HLL_M for v in per_w.values())

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        KMV_BUCKETS,
        hourly_user_kmv,
    )

    kmv = hourly_user_kmv(events_batch, **kw).collect()
    per_w = {}
    for r in kmv:
        per_w[str(r["window_start"])] = per_w.get(str(r["window_start"]), 0) + 1
    assert all(v <= KMV_BUCKETS for v in per_w.values())
    # every family sees the same sliding window set
    windows = {str(r["window_start"]) for r in hll}
    assert windows == {str(r["window_start"]) for r in bloom}
    assert windows == {str(r["window_start"]) for r in hist}
    assert windows == {str(r["window_start"]) for r in kmv}
    assert len(windows) == 123  # 30 days / 6h slide + 3 edge windows


def test_value_histogram_filters_null_values_keeping_invariants(spark):
    """A stream carrying NULL values must not grow a NULL bucket cell:
    nulls are filtered (quantiles over NULL are meaningless), the state
    bound stays <= VALUE_HIST_BUCKETS, and totality holds over the
    NON-NULL count — the invariant as documented on the operator."""
    rows = [
        ("2024-01-01 10:00:05", 10.0),
        ("2024-01-01 10:10:05", None),
        ("2024-01-01 10:20:05", 499.0),
        ("2024-01-01 10:30:05", None),
        ("2024-01-01 10:40:05", 250.0),
    ]
    df = spark.createDataFrame(rows, "ts_s string, value double").selectExpr(
        "CAST(ts_s AS TIMESTAMP) AS ts", "value"
    )
    cells = hourly_value_histogram(df).collect()
    assert all(r["bk"] is not None for r in cells), cells
    assert len(cells) <= VALUE_HIST_BUCKETS
    assert sum(r["c"] for r in cells) == 3  # the non-null values


def test_session_window_agrees_with_lag_cumsum(spark, events_batch):
    """The native session_window and the lag+cumsum implementation define
    sessions identically except at exact-gap boundaries (measure-zero for
    ns timestamps): same per-user session and event counts."""
    native = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in session_window_agg(events_batch)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("ev_cnt").alias("n_events"))
        .collect()
    }
    lag_based = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in events_sessionization(spark, SF0001).collect()
    }
    assert native == lag_based


def test_streaming_session_window_runs(spark):
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(session_window_agg(stream), "sessions_test", mode="append")
    q.awaitTermination(120)
    rows = spark.sql("SELECT count(*) AS n FROM sessions_test").first()
    q.stop()
    # append mode with watermark only emits *closed* sessions; the single
    # input file means the final watermark still holds the last sessions
    # open, so we assert the pipeline ran and emitted a sane prefix.
    assert rows["n"] >= 0


def test_multimodal_features(spark):
    from walmart_e_commerce_sales_data_pipeline_spark.operators.multimodal import (
        extract_features,
        synthesize_media_table,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    media = synthesize_media_table(spark, docs)
    feats = extract_features(media, fake_decode=True).collect()
    docs_rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert len(feats) == len(docs_rows)
    for r in feats[:20]:
        payload = docs_rows[r["media_id"]].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert r["byte_max"] == max(payload)
        assert abs(r["byte_mean"] - sum(payload) / len(payload)) < 1e-9
    kinds = {r["kind"] for r in feats}
    assert kinds == {"image", "audio", "video"}


def test_decode_stub_raises_without_fake():
    from walmart_e_commerce_sales_data_pipeline_spark.operators.multimodal import decode_stub

    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", "image", fake=False)


def test_rocksdb_state_store_matches_default(spark, events_batch):
    """The streaming suite runs unchanged on the RocksDB state store (the
    multi-TB-state scale path) and produces the identical result."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        rocksdb_state_conf,
    )

    batch = {
        (str(r["window_start"]), r["n"]): r["sum_value"]
        for r in hourly_window_agg(events_batch).collect()
    }
    saved = {k: spark.conf.get(k, None) for k in rocksdb_state_conf()}
    try:
        for k, v in rocksdb_state_conf().items():
            spark.conf.set(k, v)
        stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
        q = run_stream_to_memory(hourly_window_agg(stream), "hourly_rocksdb", mode="complete")
        q.awaitTermination(120)
        got = {
            (str(r["window_start"]), r["n"]): r["sum_value"]
            for r in spark.sql("SELECT * FROM hourly_rocksdb").collect()
        }
        q.stop()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert got == batch and len(got) > 0


def test_streaming_dedup_within_watermark(spark, events_batch):
    """dropDuplicatesWithinWatermark must emit each event_id exactly once
    even when the whole input is re-delivered in a later micro-batch (the
    at-least-once-source scenario the operator exists for): stage the same
    parquet file twice, one file per trigger, and compare against batch
    dropDuplicates."""
    import os
    import tempfile

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        dedup_stream,
    )

    src = f"{SF0001}/events.parquet"
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    os.symlink(src, os.path.join(d, "a.parquet"))
    os.symlink(src, os.path.join(d, "b.parquet"))

    stream = read_events_stream(spark, d)
    q = run_stream_to_memory(dedup_stream(stream), "dedup_test", mode="append")
    q.awaitTermination(120)
    got = sorted(
        r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_test").collect()
    )
    q.stop()
    want = sorted(r["event_id"] for r in dedup_stream(events_batch).collect())
    assert got == want
    assert len(got) == len(set(got)) > 0


def test_stream_starts_on_empty_dir_with_fallback_schema(spark, tmp_path):
    """A stream may legitimately start against an empty staging directory
    (files arrive later); schema inference has nothing to read then, so
    read_events_stream must fall back to RAW_EVENTS_SCHEMA instead of
    failing with UNABLE_TO_INFER_SCHEMA."""
    import shutil

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        RAW_EVENTS_SCHEMA,
        hourly_window_agg,
        run_stream_to_memory,
    )

    staging = tmp_path / "staging"
    staging.mkdir()
    stream = read_events_stream(spark, str(staging))
    assert stream.isStreaming
    # Files land after the stream was defined; the agg drains them.
    shutil.copy(f"{SF0001}/events.parquet", staging / "events.parquet")
    # Complete mode: append would hold back the newest still-open window
    # until the watermark passes it (by design).
    q = run_stream_to_memory(
        hourly_window_agg(stream), "empty_start_hourly", mode="complete"
    )
    q.awaitTermination()
    got = spark.table("empty_start_hourly").count()
    batch = hourly_window_agg(
        read_events_stream.__globals__["with_event_time"](
            spark.read.schema(RAW_EVENTS_SCHEMA).parquet(str(staging))
        )
    ).count()
    assert got == batch > 0


def test_streaming_warc_curation_matches_batch(spark, tmp_path):
    """The incremental twin of warc_curation_by_day: the IDENTICAL
    transformation chain (extract → quality-filter → watermarked
    dropDuplicatesWithinWatermark → 1-day windowed per-source rollup) runs
    as a readStream over WARC segments in APPEND mode and must emit exactly
    the batch query's rows.  Append mode only emits a (day, source) window
    once the watermark passes its end, so the test drops two sentinel
    segments with far-future crawl dates as later waves — the
    incremental-crawl shape that closes the real windows."""
    import os

    from walmart_e_commerce_sales_data_pipeline_spark.queries.corpus import (
        export_corpus_as_warc,
        warc_curation_by_day,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.sources.warc import (
        write_warc,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.curation import (
        curate_warc_docs,
        daily_source_counts,
        extract_warc_docs,
    )

    batch = {
        (str(r["day"]), r["source"]): (r["docs_kept"], r["tokens_kept"])
        for r in warc_curation_by_day(spark, SF0001).collect()
    }
    assert batch  # the corpus produces real windows

    # wave 1: the same exported segments the batch query read
    exp = export_corpus_as_warc(spark, SF0001)
    drop = tmp_path / "drop"
    drop.mkdir()
    for name in os.listdir(exp):
        if name.endswith((".warc", ".warc.gz")):
            os.symlink(os.path.join(exp, name), drop / name)

    stream = spark.readStream.format("warc").load(str(drop))
    counts = daily_source_counts(curate_warc_docs(extract_warc_docs(stream)))
    q = (
        counts.writeStream.format("memory")
        .queryName("warc_curation_stream")
        .outputMode("append")
        .start()
    )

    def sentinel(name: str, date: str, doc_id: int) -> None:
        write_warc(
            str(drop / name),
            [
                {
                    "record_id": f"<urn:doc:{doc_id}>",
                    "warc_type": "response",
                    "target_uri": f"http://zsentinel.corpus.local/xx/{doc_id}",
                    "warc_date": date,
                    "content_type": "text/plain",
                    "payload": b"sentinel doc with enough tokens here",
                }
            ],
        )

    try:
        q.processAllAvailable()
        # waves 2+3: each advances the watermark at the NEXT batch, closing
        # first the day-1 then the day-2 real windows
        sentinel("zz-1.warc", "2026-03-01T00:00:00Z", 999901)
        q.processAllAvailable()
        sentinel("zz-2.warc", "2026-03-02T00:00:00Z", 999902)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (str(r["day"]), r["source"]): (r["docs_kept"], r["tokens_kept"])
        for r in spark.sql("SELECT * FROM warc_curation_stream").collect()
        if r["source"] != "zsentinel"
    }
    assert got == batch


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    """A duplicate of a (source, day, md5) key arriving in a LATER
    micro-batch — up to ~23 h apart in event time, as a day-scoped key
    allows — must still be dropped, because curate_warc_docs' default
    watermark (25 h) covers the full dedup-key scope.  The second half of
    the test documents WHY that default matters: with a 1 h horizon the
    original's state is evicted before the duplicate arrives and the
    duplicate leaks into the rollup (stream != batch)."""
    from walmart_e_commerce_sales_data_pipeline_spark.sources.warc import (
        WarcDataSource,
        write_warc,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.curation import (
        curate_warc_docs,
        daily_source_counts,
        extract_warc_docs,
    )

    spark.dataSource.register(WarcDataSource)

    def rec(doc_id: int, hour: int, text: str, source: str = "alpha") -> dict:
        return {
            "record_id": f"<urn:doc:{doc_id}>",
            "warc_type": "response",
            "target_uri": f"http://{source}.corpus.local/en/{doc_id}",
            "warc_date": f"2026-01-01T{hour:02d}:00:00Z",
            "content_type": "text/plain",
            "payload": text.encode(),
        }

    text_a = "alpha document with plenty of tokens to keep"
    text_b = "beta document with plenty of tokens to keep"

    def run(drop, watermark: str) -> dict:
        stream = spark.readStream.format("warc").load(str(drop))
        counts = daily_source_counts(
            curate_warc_docs(extract_warc_docs(stream), watermark=watermark)
        )
        name = f"mb_dedup_{watermark.replace(' ', '_')}"
        q = (
            counts.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .start()
        )
        try:
            # wave 1: original A at 01:00 plus a late-in-day B at 23:00
            # (B advances the max event time, which is what evicts A's
            # state under a short horizon)
            write_warc(
                str(drop / "w1.warc"), [rec(1, 1, text_a), rec(2, 23, text_b)]
            )
            q.processAllAvailable()
            # wave 2 (separate micro-batch): duplicate of A, 22 h after
            # the original, still inside day 1
            write_warc(str(drop / "w2.warc"), [rec(3, 23, text_a)])
            q.processAllAvailable()
            # waves 3+4: far-future sentinels advance the watermark past
            # day 1's end so the append-mode window emits
            write_warc(
                str(drop / "w3.warc"),
                [rec(999901, 1, "sentinel doc with enough tokens here", "zs")],
            )
            # rewrite the date forward via a fresh record dict
            write_warc(
                str(drop / "w4.warc"),
                [
                    {
                        **rec(
                            999902, 1,
                            "sentinel doc with enough tokens here", "zs",
                        ),
                        "warc_date": "2026-03-05T00:00:00Z",
                    }
                ],
            )
            q.processAllAvailable()
        finally:
            q.stop()
        return {
            (str(r["day"]), r["source"]): (r["docs_kept"], r["tokens_kept"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
            if r["source"] == "alpha"
        }

    d1 = tmp_path / "default_wm"
    d1.mkdir()
    got = run(d1, "25 hours")
    # batch semantics over the same five records: the wave-2 duplicate of
    # text_a is dropped — 2 docs kept on day 1 for source alpha
    toks = len(text_a.split())
    assert got == {("2026-01-01", "alpha"): (2, 2 * toks)}

    d2 = tmp_path / "short_wm"
    d2.mkdir()
    leaked = run(d2, "1 hour")
    # documented failure mode of a sub-day horizon: A's state was evicted
    # (watermark reached 22:00 after wave 1), so the duplicate survives
    # and the stream over-counts vs batch
    assert leaked == {("2026-01-01", "alpha"): (3, 3 * toks)}


def test_keyed_upsert_sink_crash_recovery_exactly_once(spark, tmp_path):
    """Kill the CDC upsert sink mid-batch — AFTER the table swap but
    BEFORE the checkpoint commit, the worst window for duplication —
    then restart from the same checkpoint and assert the net state is
    exactly-once: the replayed batch re-merges idempotently, so the
    table equals batch latest-per-key with one row per key and no
    staging debris.

    Structured Streaming's contract here is at-least-once delivery to
    ``foreachBatch`` (offsets WAL'd before processing, commit written
    after); exactly-once NET state is the sink's job, and it holds
    because merge_batch reduces (current ∪ batch) to newest-per-key —
    re-applying the same batch is a fixed point."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators import maintenance
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.incremental import (
        keyed_upsert_sink,
    )

    src = tmp_path / "changes"
    src.mkdir()
    table = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts long, state string"

    def wave(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    def start():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        return keyed_upsert_sink(stream, table, "user_id", "ts").option(
            "checkpointLocation", ckpt
        ).start()

    # Wave 1 lands cleanly.
    wave("w1", [(1, 100, "a"), (2, 100, "a")])
    q = start()
    q.awaitTermination()

    # Wave 2: crash AFTER merge_upsert fully applied (swap done, commit
    # not yet written).  keyed_upsert_sink resolves merge_upsert from the
    # maintenance module at construction time, so patch before start().
    wave("w2", [(1, 200, "b"), (3, 150, "a"), (2, 50, "stale")])
    real_merge = maintenance.merge_upsert
    applied = []

    def crash_after_apply(spark_, target_path, updates, key):
        real_merge(spark_, target_path, updates, key)
        applied.append(target_path)
        raise RuntimeError("injected crash after swap, before commit")

    maintenance.merge_upsert = crash_after_apply
    try:
        q = start()
        with pytest.raises(Exception) as exc_info:
            q.awaitTermination()
        assert "injected crash" in str(exc_info.value)
        assert applied, "crash was injected before the merge applied"
    finally:
        maintenance.merge_upsert = real_merge

    # The crashed run DID apply the merge — the table already holds wave-2
    # state, and the checkpoint holds no commit for that batch.
    crashed = {
        r["user_id"]: (r["ts"], r["state"])
        for r in spark.read.parquet(table).collect()
    }
    assert crashed[1] == (200, "b") and 3 in crashed

    # Restart from the same checkpoint: the uncommitted batch replays,
    # re-merging the same rows.  Exactly-once net state = batch
    # latest-per-key, one row per key, no duplication from the replay.
    q = start()
    q.awaitTermination()

    final = spark.read.parquet(table)
    rows = final.collect()
    got = {r["user_id"]: (r["ts"], r["state"]) for r in rows}
    assert got == {1: (200, "b"), 2: (100, "a"), 3: (150, "a")}
    assert len(rows) == len(got), "replay duplicated rows for a key"
    # No staging/.old debris: merge_upsert completed on both the crashed
    # and the replayed application.
    leftovers = [p.name for p in tmp_path.iterdir() if p.name.startswith(".state.")]
    assert leftovers == []

    # A post-recovery wave keeps advancing normally (checkpoint healthy).
    wave("w3", [(2, 300, "c")])
    q = start()
    q.awaitTermination()
    got = {
        r["user_id"]: (r["ts"], r["state"])
        for r in spark.read.parquet(table).collect()
    }
    assert got[2] == (300, "c")


def test_streaming_forward_decay_equals_batch_merges_and_matches_backward(
    spark, events_batch
):
    """The forward-decay accumulator (Cormode ICDE'09) must emit identical
    hourly cells from stream and batch, bound per-hour state by the active
    user dimension, merge across hours by plain ADDITION into the per-user
    total, and — the algebraic heart — relate to the backward/landmark
    accumulator of time_decayed_engagement by the EXACT BIGINT identity
    acc_fw << (SHIFT - days(anchor - L)) == acc_bw, because
    cents << (d - L) << (SHIFT - (anchor - L)) == cents << (SHIFT - (anchor - d))
    term by term (all integers; no float enters either side)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.events import (
        _DECAY_SHIFT,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        FWD_DECAY_LANDMARK,
        hourly_user_forward_decay,
    )

    batch = {
        (str(r["window_start"]), r["user_id"]): (r["n_events"], r["acc_fw"])
        for r in hourly_user_forward_decay(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_user_forward_decay(stream), "fwd_decay_test", mode="complete"
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["user_id"]): (r["n_events"], r["acc_fw"])
        for r in spark.sql("SELECT * FROM fwd_decay_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0
    # State bound: per hour, at most one row per active user (15 at sf0.001).
    n_users = events_batch.select("user_id").distinct().count()
    per_hour: dict[str, int] = {}
    for (w, _u) in got:
        per_hour[w] = per_hour.get(w, 0) + 1
    assert all(v <= n_users for v in per_hour.values())
    # Additive merge law + the forward<->backward shift identity against an
    # independent per-user recomputation of the BACKWARD accumulator.
    merged: dict[int, int] = {}
    for (_w, u), (_n, acc) in got.items():
        merged[u] = merged.get(u, 0) + acc
    row = events_batch.agg(
        F.max(F.to_date("ts")).alias("d"),
        F.datediff(
            F.max(F.to_date("ts")), F.lit(FWD_DECAY_LANDMARK).cast("date")
        ).alias("a"),
    ).collect()[0]
    anchor_days, anchor_date = row["a"], row["d"]
    backward = {
        r["user_id"]: r["acc_bw"]
        for r in events_batch.select(
            "user_id",
            (
                F.round(F.col("value") * F.lit(100.0), 0).cast("long")
                * F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {_DECAY_SHIFT} "
                    f"- datediff(DATE'{anchor_date}', CAST(ts AS DATE)))"
                )
            ).alias("term"),
        )
        .groupBy("user_id")
        .agg(F.sum("term").cast("long").alias("acc_bw"))
        .collect()
    }
    assert set(merged) == set(backward)
    shift = _DECAY_SHIFT - anchor_days
    assert shift >= 0
    for u, acc in merged.items():
        assert acc << shift == backward[u], u


def test_streaming_hourly_mg_equals_batch_single_microbatch(spark, events_batch):
    """The SIXTH streaming sketch family (Misra-Gries heavy hitters via
    applyInPandasWithState — bounded at k counters per hour, never a row
    per user).  When each hour arrives within one micro-batch the
    streamed summary is the canonical one-compress form bit-exactly, so
    stream == batch on the single-file staging."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        MG_STREAM_K,
        hourly_user_mg,
    )

    batch = {
        (str(r["window_start"]), r["user_id"]): (
            r["mg_count"],
            r["deficit"],
            r["n_window"],
        )
        for r in hourly_user_mg(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(hourly_user_mg(stream), "mg_hourly_test", mode="update")
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["user_id"]): (
            r["mg_count"],
            r["deficit"],
            r["n_window"],
        )
        for r in spark.sql("SELECT * FROM mg_hourly_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0
    per_hour: dict[str, int] = {}
    for (w, _u) in got:
        per_hour[w] = per_hour.get(w, 0) + 1
    assert all(v <= MG_STREAM_K for v in per_hour.values())


def test_streaming_mg_guarantees_under_multibatch_split(spark, tmp_path):
    """Under an arbitrary micro-batch split the MG counters are order-
    dependent (unlike the five register families) but the PODS'12 laws
    are not: <= k counters per hour, no overcount, undercount <= the
    accumulated decrement <= n/(k+1), and every user with true count
    above n/(k+1) survives.  Three micro-batches, one hour, 3k users."""
    import datetime as dt

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        MG_STREAM_K,
        hourly_user_mg,
        read_events_stream,
        run_stream_to_memory,
        stage_stream_dir,
    )

    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = []
    eid = 0
    # heavy users 0..2 (60/40/20 events), light users 100..123 (2 each):
    # n = 168, k = 8 -> guarantee threshold n/(k+1) ~ 18.7
    for u, n in [(0, 60), (1, 40), (2, 20)] + [(100 + i, 2) for i in range(24)]:
        for j in range(n):
            rows.append(
                (eid, base + dt.timedelta(seconds=(eid * 7) % 3500), u, "view", 1.0, "{}")
            )
            eid += 1
    import random

    random.Random(42).shuffle(rows)
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    third = len(rows) // 3
    files = []
    for i in range(3):
        part = rows[i * third : (i + 1) * third] if i < 2 else rows[2 * third :]
        pth = f"{tmp_path}/mg_batch_{i}.parquet"
        spark.createDataFrame(part, df.schema).coalesce(1).write.parquet(pth)
        import glob

        files.extend(glob.glob(f"{pth}/part-*.parquet"))
    stream = read_events_stream(spark, stage_stream_dir(*files))
    q = run_stream_to_memory(hourly_user_mg(stream), "mg_split_test", mode="update")
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM mg_split_test").collect()
    q.stop()
    assert emitted
    # final emission per hour = rows carrying the max n_window
    n_final = max(r["n_window"] for r in emitted)
    final = [r for r in emitted if r["n_window"] == n_final]
    assert n_final == len(rows)
    assert len(final) <= MG_STREAM_K
    true = {}
    for _e, _t, u, *_ in rows:
        true[u] = true.get(u, 0) + 1
    dec = final[0]["deficit"]
    assert dec * (MG_STREAM_K + 1) <= n_final
    for r in final:
        t_cnt = true[r["user_id"]]
        assert r["mg_count"] <= t_cnt  # never overcounts
        assert t_cnt - r["mg_count"] <= dec  # undercount bounded by dec
    surviving = {r["user_id"] for r in final}
    for u, c in true.items():
        if c * (MG_STREAM_K + 1) > n_final:
            assert u in surviving  # heavy users guaranteed to survive


def test_sliding_mg_stream_equals_batch_and_overlap_bound(spark, events_batch):
    """Sliding-window parity for the SIXTH family: with window=2h,
    slide=1h the MG twin assigns each event to exactly window/slide
    overlapping windows via the explicit start expansion (the
    arbitrary-state API groups by a real column), per-window state
    stays <= k counters, and stream == batch bit-exactly on the
    single-file staging — the same sliding pin the five register
    families carry."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        MG_STREAM_K,
        hourly_user_mg,
    )

    kw = {"window": "2 hours", "slide": "1 hour"}
    batch_rows = hourly_user_mg(events_batch, **kw).collect()
    batch = {
        (str(r["window_start"]), r["user_id"]): (
            r["mg_count"],
            r["deficit"],
            r["n_window"],
        )
        for r in batch_rows
    }
    # overlap sanity: sliding windows ~= tumbling hours + 1, and every
    # event lands in exactly 2 windows so total n_window doubles
    tumbling = hourly_user_mg(events_batch).collect()
    n_events = sum(
        {str(r["window_start"]): r["n_window"] for r in tumbling}.values()
    )
    slid_total = sum(
        {str(r["window_start"]): r["n_window"] for r in batch_rows}.values()
    )
    assert slid_total == 2 * n_events
    per_win: dict[str, int] = {}
    for (w, _u) in batch:
        per_win[w] = per_win.get(w, 0) + 1
    assert all(v <= MG_STREAM_K for v in per_win.values())
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_user_mg(stream, **kw), "mg_sliding_test", mode="update"
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["user_id"]): (
            r["mg_count"],
            r["deficit"],
            r["n_window"],
        )
        for r in spark.sql("SELECT * FROM mg_sliding_test").collect()
    }
    q.stop()
    assert got == batch and len(got) > 0


@pytest.mark.parametrize(
    "mg_k,mg_window,mg_slide",
    [
        (4, "1 hour", None),
        (16, "1 hour", None),
        (4, "2 hours", "1 hour"),
        (16, "2 hours", "1 hour"),
    ],
)
def test_streaming_mg_parameterized_k_equals_batch(
    spark, events_batch, mg_k, mg_window, mg_slide
):
    """The streaming MG twin accepts ANY k, tumbling or sliding: the
    state-update function is generated per call with k and the window
    length baked into its closure (``_make_mg_update``), so the
    streamed summary matches the batch canonical compress bit-exactly
    at k in {4, 16} just as the long-standing k=8 pins do — and the
    eviction horizon is computed from the actual window length, so a
    2 h sliding window is never evicted an hour early."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_mg,
    )

    kw = {"k": mg_k, "window": mg_window, "slide": mg_slide}
    batch = {
        (str(r["window_start"]), r["user_id"]): (
            r["mg_count"],
            r["deficit"],
            r["n_window"],
        )
        for r in hourly_user_mg(events_batch, **kw).collect()
    }
    per_win: dict[str, int] = {}
    for (w, _u) in batch:
        per_win[w] = per_win.get(w, 0) + 1
    assert all(v <= mg_k for v in per_win.values())
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    sink = f"mg_k{mg_k}_{'slide' if mg_slide else 'tumble'}_test"
    q = run_stream_to_memory(hourly_user_mg(stream, **kw), sink, mode="update")
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["user_id"]): (
            r["mg_count"],
            r["deficit"],
            r["n_window"],
        )
        for r in spark.sql(f"SELECT * FROM {sink}").collect()
    }
    q.stop()
    assert got == batch and len(got) > 0


# --- A-ES weighted sample: the SEVENTH streaming sketch family ----------------


def _aes_rows(rows):
    return {
        (str(r["window_start"]), r["rk"]): (
            r["event_id"],
            r["user_id"],
            r["value"],
            r["aes_key"],
            r["n_seen"],
        )
        for r in rows
    }


def test_streaming_aes_sample_equals_batch_single_microbatch(spark, events_batch):
    """Single-file staging: stream == batch bit-exactly, per-window
    sample bounded at k rows."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        AES_SAMPLE_K,
        hourly_sample_aes,
    )

    batch = _aes_rows(hourly_sample_aes(events_batch).collect())
    per_win: dict[str, int] = {}
    for (w, _rk) in batch:
        per_win[w] = per_win.get(w, 0) + 1
    assert all(v <= AES_SAMPLE_K for v in per_win.values())
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(hourly_sample_aes(stream), "aes_hourly_test", mode="update")
    q.awaitTermination(120)
    got = _aes_rows(spark.sql("SELECT * FROM aes_hourly_test").collect())
    q.stop()
    assert got == batch and len(got) > 0


def test_streaming_aes_sample_split_independent(spark, events_batch, tmp_path):
    """The stronger-than-MG law: the A-ES top-k summary is a pure order
    statistic, so the FINAL per-window sample is bit-identical to the
    batch form under ANY micro-batch split — here the corpus arrives in
    three arbitrary files.  Final emission per window = rows carrying
    that window's maximum n_seen."""
    import glob

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_sample_aes,
    )

    batch = _aes_rows(hourly_sample_aes(events_batch).collect())
    rows = events_batch.orderBy("event_id").collect()
    third = len(rows) // 3
    files = []
    src_cols = events_batch.select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    for i in range(3):
        part = rows[i * third : (i + 1) * third] if i < 2 else rows[2 * third :]
        pth = f"{tmp_path}/aes_batch_{i}.parquet"
        spark.createDataFrame(
            [(r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"], r["props"]) for r in part],
            src_cols.schema,
        ).coalesce(1).write.parquet(pth)
        files.extend(glob.glob(f"{pth}/part-*.parquet"))
    stream = read_events_stream(spark, stage_stream_dir(*files))
    q = run_stream_to_memory(hourly_sample_aes(stream), "aes_split_test", mode="update")
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM aes_split_test").collect()
    q.stop()
    assert emitted
    final_n: dict[str, int] = {}
    for r in emitted:
        w = str(r["window_start"])
        final_n[w] = max(final_n.get(w, 0), r["n_seen"])
    final = _aes_rows(
        r for r in emitted if r["n_seen"] == final_n[str(r["window_start"])]
    )
    assert final == batch


@pytest.mark.parametrize("aes_k,aes_window,aes_slide", [(5, "1 hour", None), (2, "2 hours", "1 hour")])
def test_streaming_aes_sample_parameterized(spark, events_batch, aes_k, aes_window, aes_slide):
    """k and window/slide bake into the state-update closure like the MG
    twin: stream == batch at non-default k, tumbling and sliding, and
    every event lands in exactly window/slide windows (n_seen doubles)."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_sample_aes,
    )

    kw = {"k": aes_k, "window": aes_window, "slide": aes_slide}
    batch_rows = hourly_sample_aes(events_batch, **kw).collect()
    batch = _aes_rows(batch_rows)
    if aes_slide:
        tumbling = hourly_sample_aes(events_batch).collect()
        n_events = sum(
            {str(r["window_start"]): r["n_seen"] for r in tumbling}.values()
        )
        slid_total = sum(
            {str(r["window_start"]): r["n_seen"] for r in batch_rows}.values()
        )
        assert slid_total == 2 * n_events
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    sink = f"aes_k{aes_k}_{'slide' if aes_slide else 'tumble'}_test"
    q = run_stream_to_memory(hourly_sample_aes(stream, **kw), sink, mode="update")
    q.awaitTermination(120)
    got = _aes_rows(spark.sql(f"SELECT * FROM {sink}").collect())
    q.stop()
    assert got == batch and len(got) > 0


def test_aes_sample_zero_weight_excluded_negative_raises(spark):
    """value == 0 means zero selection probability — the event is
    EXCLUDED (the exact w -> 0 limit; such events exist at sf0.1), and
    n_seen counts only sampleable events; a NEGATIVE value raises
    loudly instead of silently inverting the ranking (ln(u) <= 0)."""
    import datetime as dt

    import pytest as _pytest

    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_sample_aes,
    )

    t = dt.datetime(2024, 1, 1, 10, 0)
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string"
    )
    ev = spark.createDataFrame(
        [(1, t, 7, "view", 0.0, "{}"), (2, t, 8, "view", 2.0, "{}")], schema
    )
    rows = hourly_sample_aes(ev).collect()
    assert [r["event_id"] for r in rows] == [2]
    assert rows[0]["n_seen"] == 1  # the zero-weight event is not sampleable
    neg = spark.createDataFrame([(3, t, 9, "view", -1.0, "{}")], schema)
    with _pytest.raises(Exception, match="aes sample"):
        hourly_sample_aes(neg).collect()


def test_streaming_aes_sample_sliding_24h_6h_bounds_state(spark, events_batch):
    """r17 VERDICT item 6 — the A-ES sliding form at the rolling-actives
    shape (24h window / 6h slide, the events_sliding_hll protocol):
    stream == batch bit-exact, per-window state stays <= k rows however
    many events arrive, each event feeds exactly window/slide = 4
    windows (the ONLY state multiplier — n_seen totals prove it against
    the tumbling form), and the window count is the calendar's slide
    grid, nothing more."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_sample_aes,
    )

    k = 3
    kw = dict(k=k, window="24 hours", slide="6 hours")
    batch_rows = hourly_sample_aes(events_batch, **kw).collect()
    batch = _aes_rows(batch_rows)
    # overlap factor: every positive-weight event lands in exactly 4
    # sliding windows, so the summed per-window n_seen is 4x the
    # tumbling total — state grows by the overlap factor and nothing else
    tumbling = hourly_sample_aes(events_batch).collect()
    n_events = sum(
        {str(r["window_start"]): r["n_seen"] for r in tumbling}.values()
    )
    slid_total = sum(
        {str(r["window_start"]): r["n_seen"] for r in batch_rows}.values()
    )
    assert slid_total == 4 * n_events
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_sample_aes(stream, **kw), "aes_sliding_24h_test", mode="update"
    )
    q.awaitTermination(120)
    got = _aes_rows(spark.sql("SELECT * FROM aes_sliding_24h_test").collect())
    q.stop()
    assert got == batch and len(got) > 0
    per_window: dict[str, int] = {}
    for (w, _rk) in got:
        per_window[w] = per_window.get(w, 0) + 1
    # 30-day corpus / 6h slide + 3 edge windows (the sliding-HLL grid)
    assert len(per_window) == 123
    assert all(v <= k for v in per_window.values())


def test_streaming_hourly_countsketch_equals_batch_and_bounds_state(
    spark, events_batch
):
    """The EIGHTH streaming sketch family: the per-hour Count-Sketch must
    emit identical SIGNED counter cells from the stream and the batch
    plan, keep at most depth*width cells of state per hour (user
    cardinality never enters the key domain), reproduce the busiest
    user's count through an independently recomputed median-of-5 signed
    probe, and merge by plain cell addition (sub-stream sketches sum to
    the whole — the split-independence that makes the windowed signed
    SUM correct under any micro-batch boundary)."""
    import hashlib
    import statistics

    from walmart_e_commerce_sales_data_pipeline_spark.queries.sketches import (
        _CS_DEPTH,
        _CS_WIDTH,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_countsketch,
    )

    batch = {
        (str(r["window_start"]), r["r"], r["b"]): r["c"]
        for r in hourly_user_countsketch(events_batch).collect()
    }
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = run_stream_to_memory(
        hourly_user_countsketch(stream), "cs_hourly_test", mode="complete"
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["r"], r["b"]): r["c"]
        for r in spark.sql("SELECT * FROM cs_hourly_test").collect()
    }
    q.stop()
    assert got == batch
    assert len(got) > 0
    per_hour: dict[str, int] = {}
    for (w, _r, _b) in got:
        per_hour[w] = per_hour.get(w, 0) + 1
    assert all(v <= _CS_DEPTH * _CS_WIDTH for v in per_hour.values())

    # Median-of-5 signed point query for the busiest (hour, user),
    # buckets AND signs recomputed independently from the md5 hex.
    hexd = "0123456789abcdef"
    top = (
        events_batch.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "user_id")
        .first()
    )
    h = hashlib.md5(str(top["user_id"]).encode()).hexdigest()
    w_start = str(top["w"]["start"])
    ests = []
    for r in range(_CS_DEPTH):
        b = hexd.index(h[2 * r]) * 16 + hexd.index(h[2 * r + 1])
        s = 1 - 2 * (hexd.index(h[10 + r]) % 2)
        ests.append(s * batch[(w_start, r, b)])
    # At this corpus's per-hour cardinality the busiest user's five
    # cells are collision-free (the oracle-checked readout shows err=0
    # for every hour at sf0.001), so the signed median is EXACT.
    assert statistics.median(ests) == top["n"]

    # Merge law: per-hour sketches from two event-id sub-streams ADD to
    # the whole-stream sketch, cell for cell.
    lo = hourly_user_countsketch(events_batch.filter(F.col("event_id") % 2 == 0))
    hi = hourly_user_countsketch(events_batch.filter(F.col("event_id") % 2 == 1))
    merged: dict[tuple, int] = {}
    for part in (lo, hi):
        for r in part.collect():
            k = (str(r["window_start"]), r["r"], r["b"])
            merged[k] = merged.get(k, 0) + r["c"]
    merged = {k: v for k, v in merged.items() if v != 0}
    assert merged == {k: v for k, v in batch.items() if v != 0}
