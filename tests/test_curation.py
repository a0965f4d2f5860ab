"""Semantic property tests for the corpus-curation queries
(queries/curation.py) — invariants the DuckDB mirror can't express:
mathematical bounds, internal consistency, and cross-query agreement.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF001, SF0001
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


def test_common_shingle_fraction_invariants(spark):
    """n_common never exceeds n_sh, the fraction is their exact quotient
    in [0, 1], and every document with at least 3 tokens gets a row."""
    rows = q.REGISTRY["common_shingle_fraction"].fn(spark, SF001).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_common"] <= r["n_sh"], r
        assert r["common_frac"] == r["n_common"] / r["n_sh"], r
    n_docs = (
        spark.read.parquet(f"{SF001}/documents.parquet")
        .filter(F.size(F.split(F.lower("text"), " ")) >= 3)
        .count()
    )
    assert len(rows) == n_docs


def test_vocab_oov_rate_invariants(spark):
    """Every source gets a row; rates are exact quotients in [0, 1]; the
    corpus-wide OOV mass must be positive (top-10 of a 31-token vocab
    cannot cover everything) yet below 1 (the vocab covers something)."""
    rows = q.REGISTRY["vocab_oov_rate"].fn(spark, SF001).collect()
    assert len(rows) == 20  # sources src0..src19
    total = sum(r["n_tokens"] for r in rows)
    oov = sum(r["n_oov"] for r in rows)
    assert 0 < oov < total
    for r in rows:
        assert r["oov_rate"] == r["n_oov"] / r["n_tokens"], r


def test_prefix_dup_groups_invariants(spark):
    """Every group has >= 2 docs and a strictly ordered id range, and
    group member counts reconcile against a direct prefix histogram."""
    rows = q.REGISTRY["prefix_dup_groups"].fn(spark, SF001).collect()
    assert rows
    for r in rows:
        assert r["n_docs"] >= 2
        assert r["min_doc_id"] < r["max_doc_id"]
        assert len(r["prefix"].split(" ")) == 8


def test_dormant_customer_balance_invariants(spark):
    """Dormant customers all hold above-average balances (so every
    per-nation total exceeds its count times the global average) and
    none of them appears among recent orderers."""
    rows = q.REGISTRY["dormant_customer_balance"].fn(spark, SF001).collect()
    assert rows
    cust = spark.read.parquet(f"{SF001}/customer.parquet")
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(
        (F.round(F.sum(F.col("c_acctbal") * 100.0), 0) / 100.0 / F.count(F.lit(1)))
    ).first()[0]
    for r in rows:
        assert r["total_bal"] > r["n_cust"] * avg_bal - 1e-6, r


def test_kmv_sketch_estimator_branch_and_plan(spark):
    """The registered sketch must actually exercise the (k−1)/F(h_k)
    estimator (per-source shingle cardinality ≫ k), keep its error inside
    sane KMV bounds (stderr ≈ 1/√(k−2) ≈ 13% at k=64), and plan the
    rank filter as a per-partition group limit rather than a full
    per-group sort."""
    df = q.REGISTRY["kmv_distinct_sketch"].fn(spark, SF001)
    rows = df.collect()
    assert rows
    for r in rows:
        # estimator branch, not the m < k exact fallback
        assert r["n_exact"] > 64, r
        assert r["kmv_estimate"] != float(r["n_exact"]) or r["rel_err"] > 0
        assert 0 <= r["rel_err"] < 0.6, r
    errs = sorted(r["rel_err"] for r in rows)
    assert errs[len(errs) // 2] < 0.2, errs  # median within ~1.5 stderr
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_hll_sketch_raw_branch_and_error(spark):
    """At sf0.01 every source's shingle cardinality (~1.1-1.5k) exceeds
    the 2.5m = 640 small-range threshold, so the registered query must
    take the raw harmonic-mean branch and stay inside sane HLL bounds
    (stderr = 1.04/sqrt(256) ~ 6.5% at m=256)."""
    rows = q.REGISTRY["hll_distinct_sketch"].fn(spark, SF001).collect()
    assert rows
    for r in rows:
        assert r["n_exact"] > 640, r
        # raw branch: estimate must NOT equal the linear-counting formula
        if r["empty_registers"] > 0:
            lc = round(256.0 * math.log(256.0 / r["empty_registers"]), 4)
            assert r["hll_estimate"] != lc, r
        assert 0 <= r["rel_err"] < 0.3, r
    errs = sorted(r["rel_err"] for r in rows)
    assert errs[len(errs) // 2] < 0.15, errs  # median within ~2 stderr


def test_hll_small_range_branch(spark, tmp_path):
    """A tiny corpus (distinct shingles << 640) must drop to the
    linear-counting correction: estimate == m * ln(m / V) exactly."""
    import os

    words = [f"w{i}" for i in range(12)]
    text = " ".join(words)  # 10 distinct 3-gram shingles
    df = spark.createDataFrame(
        [("d1", "tiny", text), ("d2", "tiny", text)],
        "doc_id string, source string, text string",
    )
    sf_dir = str(tmp_path / "sf_tiny")
    os.makedirs(sf_dir, exist_ok=True)
    df.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")
    rows = q.REGISTRY["hll_distinct_sketch"].fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_exact"] == 10
    v = r["empty_registers"]
    assert 246 <= v < 256  # at most 10 registers occupied
    assert r["hll_estimate"] == round(256.0 * math.log(256.0 / v), 4), r


def test_hll_registers_merge_by_max(spark):
    """The (source, bucket) -> max(rho) registers computed on two disjoint
    document halves, merged by MAX, equal the whole-corpus registers —
    the mergeability contract that lets shards ship 256-byte sketches
    instead of distinct sets."""
    from pyspark.sql import functions as F

    from walmart_e_commerce_sales_data_pipeline_spark.functions.text import (
        tokenize,
        word_shingles,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        _HLL_MAX_RHO,
        _HLL_REST_MOD,
        _kmv_hash_sql,
    )

    docs = spark.read.parquet(f"{SF001}/documents.parquet")

    def registers(d):
        sh = (
            d.select("source", tokenize("text").alias("_t"))
            .select(
                "source",
                F.explode(word_shingles(F.col("_t"), 3)).alias("shingle"),
            )
            .distinct()
        )
        br = sh.select(
            "source", F.expr(_kmv_hash_sql("STRING")).alias("hv")
        ).select(
            "source",
            F.expr(f"hv DIV {_HLL_REST_MOD}").alias("bucket"),
            (F.col("hv") % _HLL_REST_MOD).alias("rest"),
        )
        rho = F.when(F.col("rest") == 0, F.lit(_HLL_MAX_RHO)).otherwise(
            F.lit(_HLL_MAX_RHO) - F.length(F.expr("bin(rest)"))
        )
        return (
            br.withColumn("rho", rho)
            .groupBy("source", "bucket")
            .agg(F.max("rho").alias("m_j"))
        )

    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    assert half_a.count() > 0 and half_b.count() > 0
    merged = (
        registers(half_a)
        .unionByName(registers(half_b))
        .groupBy("source", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    whole = {
        (r["source"], r["bucket"]): r["m_j"]
        for r in registers(docs).collect()
    }
    got = {(r["source"], r["bucket"]): r["m_j"] for r in merged.collect()}
    assert got == whole


def test_cms_guarantee_and_mergeability(spark):
    """The two count-min invariants that make it a production sketch:
    (a) the min-estimate NEVER under-counts (est >= exact for every probed
    item), and (b) sketches of disjoint shards merge by elementwise cell
    addition into exactly the whole-stream sketch."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries import REGISTRY
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        cms_cells,
    )

    rows = REGISTRY["cms_heavy_hitters"].fn(spark, SF0001).collect()
    assert len(rows) == 10
    assert all(r["overest"] >= 0 for r in rows)
    assert all(r["cms_est"] == r["n_exact"] + r["overest"] for r in rows)

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    occ = docs.select(
        F.explode(F.split(F.lower("text"), " ")).alias("shingle")
    )
    whole = {
        (r["r"], r["b"]): r["c"] for r in cms_cells(occ).collect()
    }
    merged: dict = {}
    for part in (
        occ.filter(F.crc32(F.col("shingle")) % 2 == 0),
        occ.filter(F.crc32(F.col("shingle")) % 2 == 1),
    ):
        for r in cms_cells(part).collect():
            k = (r["r"], r["b"])
            merged[k] = merged.get(k, 0) + r["c"]
    assert merged == whole
