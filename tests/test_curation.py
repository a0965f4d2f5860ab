"""Semantic property tests for the corpus-curation queries
(queries/curation.py) — invariants the DuckDB mirror can't express:
mathematical bounds, internal consistency, and cross-query agreement.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF001
from walmart_e_commerce_sales_data_pipeline_spark import queries as q


def test_jsd_within_bounds(spark):
    """Jensen-Shannon divergence (natural log) is bounded by [0, ln 2]."""
    rows = q.REGISTRY["source_unigram_divergence"].fn(spark, SF001).collect()
    assert rows, "every source must get a row"
    for r in rows:
        assert 0.0 <= r["jsd"] <= math.log(2) + 1e-9, r


def test_bm25_ranking_is_consistent(spark):
    """Ranks are 1..10 and ordered by (score desc, doc_id asc); every
    returned document actually contains at least one probe term."""
    rows = q.REGISTRY["bm25_doc_retrieval"].fn(spark, SF001).collect()
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a["bm25"] > b["bm25"] or (
            a["bm25"] == b["bm25"] and a["doc_id"] < b["doc_id"]
        )
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    hit_ids = {
        r["doc_id"]
        for r in docs.filter(
            F.col("text").rlike(r"\b(spark|join|window)\b")
        ).collect()
    }
    assert {r["doc_id"] for r in rows} <= hit_ids


def test_anomaly_zscores_exceed_threshold_and_reconstruct(spark):
    """Every flagged hour has |z| >= 2, and re-deriving the z-score from
    the full hourly series (computed independently here) matches."""
    rows = q.REGISTRY["events_hourly_anomaly"].fn(spark, SF001).collect()
    assert rows, "the synthetic stream has burst hours"
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

    hourly = (
        events(spark, SF001)
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("c"))
        .collect()
    )
    series: dict[str, list[int]] = {}
    counts: dict[tuple, int] = {}
    for r in hourly:
        series.setdefault(r["event_type"], []).append(r["c"])
        counts[(r["event_type"], r["h"])] = r["c"]
    for r in rows:
        assert abs(r["z"]) >= 2.0
        cs = series[r["event_type"]]
        mean = sum(cs) / len(cs)
        var = sum(c * c for c in cs) / len(cs) - mean * mean
        want = (counts[(r["event_type"], r["hour"])] - mean) / math.sqrt(var)
        assert abs(r["z"] - round(want, 4)) < 1e-9, (r, want)


def test_rolling_engagement_invariants(spark):
    """WAU >= DAU always (the 7-day window contains the day); stickiness
    in (0, 1]; the first observed day has WAU == DAU (no history)."""
    rows = q.REGISTRY["events_rolling_engagement"].fn(spark, SF001).collect()
    assert rows
    assert rows == sorted(rows, key=lambda r: r["day"])
    for r in rows:
        assert r["wau"] >= r["dau"] > 0
        assert 0.0 < r["stickiness"] <= 1.0
    assert rows[0]["wau"] == rows[0]["dau"]
    assert rows[0]["stickiness"] == 1.0
