"""Semantic property tests for the round-8 corpus-analysis queries
(queries/analysis.py) — invariants the DuckDB mirror can't express:
estimator bounds, coverage/overlap accounting, and cross-query agreement.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF001
from walmart_e_commerce_sales_data_pipeline_spark import queries as q
from walmart_e_commerce_sales_data_pipeline_spark.queries.analysis import (
    _CHUNK_S,
    _CHUNK_W,
    _K,
    _PMI_MIN_COUNT,
    _PMI_TOP,
)


def test_kmv_union_estimator_bounds_and_inclusion_exclusion(spark):
    """Exact counts obey inclusion–exclusion, and every KMV estimate is
    within the standard ~1/sqrt(k) relative-error envelope (3 sigma)."""
    (r,) = q.REGISTRY["kmv_sketch_union"].fn(spark, SF001).collect()
    assert r["n_a"] + r["n_b"] - r["n_inter"] == r["n_union"]
    tol = 3.0 / math.sqrt(_K)
    for est, exact in (
        (r["est_a"], r["n_a"]),
        (r["est_b"], r["n_b"]),
        (r["est_union"], r["n_union"]),
    ):
        assert abs(est - exact) / exact <= tol, (est, exact)
    # intersection is the noisiest (estimator product); allow double slack
    assert abs(r["est_inter"] - r["n_inter"]) / max(r["n_inter"], 1) <= 2 * tol
    # union estimate can never fall below either input's estimate by more
    # than rounding (the merged sketch dominates both inputs)
    assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-6


def test_chunk_windows_cover_every_token_exactly(spark):
    """Per document: chunks tile the token sequence — total chunk tokens
    minus claimed overlaps equals the token count; boundaries are
    monotone; interior non-truncated overlaps equal W−S."""
    rows = q.REGISTRY["sliding_chunk_windows"].fn(spark, SF001).collect()
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tokens), "every document chunks"
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_idx"])
        n = n_tokens[doc_id]
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        assert chunks[0]["start_tok"] == 1
        assert chunks[-1]["end_tok"] == n
        covered = sum(c["n_chunk_tokens"] for c in chunks) - sum(
            c["overlap_prev"] for c in chunks
        )
        assert covered == n, (doc_id, covered, n)
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur["start_tok"] == prev["start_tok"] + _CHUNK_S
            assert cur["start_tok"] <= prev["end_tok"] + 1, "no gaps"
            if cur["end_tok"] - cur["start_tok"] + 1 == _CHUNK_W:
                assert cur["overlap_prev"] == _CHUNK_W - _CHUNK_S


def test_bigram_pmi_recomputes_from_raw_counts(spark):
    """Every returned bigram meets the min count, ranks are correctly
    ordered, and the PMI value re-derives from independently computed
    corpus counts."""
    rows = q.REGISTRY["bigram_pmi"].fn(spark, SF001).collect()
    assert 0 < len(rows) <= _PMI_TOP
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    toks = docs.select(F.split(F.lower("text"), " ").alias("t"))
    n_u = toks.select(F.explode("t")).count()
    n_b = toks.select(
        F.greatest(F.lit(0), F.size("t") - 1).alias("nb")
    ).agg(F.sum("nb")).collect()[0][0]
    for r in rows:
        assert r["c_xy"] >= _PMI_MIN_COUNT
        expect = math.log(
            (r["c_xy"] * float(n_u) * n_u) / (float(n_b) * r["c_x"] * r["c_y"])
        )
        assert abs(r["pmi"] - expect) < 1e-5, (r["bigram"], r["pmi"], expect)
    for a, b in zip(rows, rows[1:]):
        assert a["pmi"] > b["pmi"] or (
            a["pmi"] == b["pmi"] and a["bigram"] < b["bigram"]
        )


def test_degree_hist_mass_matches_pair_count(spark):
    """Sum(degree · n_nodes) = 2 · |pairs| (handshake lemma), and the
    node total matches the distinct endpoints of the exact pair set."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
        jaccard_pairs_from_docs,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.dedup import (
        JACCARD_THRESHOLD,
    )

    hist = q.REGISTRY["dup_graph_degree_hist"].fn(spark, SF001).collect()
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    pairs = jaccard_pairs_from_docs(docs, JACCARD_THRESHOLD).collect()
    assert sum(r["degree"] * r["n_nodes"] for r in hist) == 2 * len(pairs)
    endpoints = {p["x"] for p in pairs} | {p["y"] for p in pairs}
    assert sum(r["n_nodes"] for r in hist) == len(endpoints)


def test_winsorized_stats_bounds(spark):
    """Fences bracket the winsorized mean, the clamped spread never
    exceeds the raw spread, and clamp counts stay below the ~10% the
    5/95 fences imply (strictly below n)."""
    rows = q.REGISTRY["winsorized_price_stats"].fn(spark, SF001).collect()
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    raw = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.stddev_samp("l_extendedprice").alias("sd"),
        )
        .collect()
    }
    assert {r["l_returnflag"] for r in rows} == set(raw)
    for r in rows:
        assert r["p05"] < r["mean_winsorized"] < r["p95"]
        assert r["n"] == raw[r["l_returnflag"]]["n"]
        assert r["std_winsorized"] <= raw[r["l_returnflag"]]["sd"] + 1e-9
        # at most ~10% of rows sit outside exact 5th/95th percentile fences
        assert r["n_clamped"] <= 0.11 * r["n"] + 2


def test_ngram_profile_bounds_and_totals(spark):
    """Gini lies in [0, 1), the Zipf slope is non-positive (frequency is
    non-increasing in rank by construction), and the totals re-derive
    from an independent shingle count."""
    from walmart_e_commerce_sales_data_pipeline_spark.functions.text import (
        word_shingles,
    )

    (r,) = q.REGISTRY["ngram_distribution_profile"].fn(spark, SF001).collect()
    assert 0.0 <= r["gini"] < 1.0
    assert r["zipf_slope"] <= 0.0
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    sh = docs.select(
        F.explode(
            word_shingles(F.split(F.lower("text"), " "), 3)
        ).alias("g")
    )
    assert r["n_total"] == sh.count()
    assert r["n_vocab"] == sh.distinct().count()


def test_cross_source_matrix_partitions_the_pair_set(spark):
    """Matrix cells partition the exact pair set: n_pairs sums to |pairs|,
    cells are unordered (src_a <= src_b), and each cell's average Jaccard
    re-derives from the raw pairs."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
        jaccard_pairs_from_docs,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.dedup import (
        JACCARD_THRESHOLD,
    )

    rows = q.REGISTRY["cross_source_dup_matrix"].fn(spark, SF001).collect()
    assert rows
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    pairs = jaccard_pairs_from_docs(docs, JACCARD_THRESHOLD).collect()
    assert sum(r["n_pairs"] for r in rows) == len(pairs)
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    by_cell: dict[tuple, list] = {}
    for p in pairs:
        a, b = sorted((src[p["x"]], src[p["y"]]))
        by_cell.setdefault((a, b), []).append(p["jaccard"])
    assert {(r["src_a"], r["src_b"]) for r in rows} == set(by_cell)
    for r in rows:
        assert r["src_a"] <= r["src_b"]
        js = by_cell[(r["src_a"], r["src_b"])]
        assert abs(r["avg_jaccard"] - sum(js) / len(js)) < 1e-5


def test_scd2_intervals_partition_each_users_timeline(spark):
    """Version intervals chain exactly (valid_to == next valid_from),
    exactly one current version per user, versions are 1..k, adjacent
    versions change state, and the per-user event counts re-add to the
    raw stream."""
    rows = q.REGISTRY["scd2_user_state_history"].fn(spark, SF001).collect()
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    per_user = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert set(by_user) == set(per_user)
    for uid, vers in by_user.items():
        vers.sort(key=lambda r: r["version"])
        assert [v["version"] for v in vers] == list(range(1, len(vers) + 1))
        assert sum(v["n_events"] for v in vers) == per_user[uid]
        assert sum(v["is_current"] for v in vers) == 1
        assert vers[-1]["is_current"] and vers[-1]["valid_to"] is None
        for a, b in zip(vers, vers[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] < b["valid_from"]
            assert a["state"] != b["state"], "adjacent versions must differ"


def test_point_in_time_join_matches_each_label_exactly_once(spark):
    """Every sampled label matches exactly one SCD-2 version (intervals
    partition the timeline), the matched version's interval genuinely
    contains the label timestamp, and no future state leaks backwards
    (the matched state equals the label event's own recent history)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.analysis import (
        _PIT_SAMPLE_MOD,
    )

    rows = q.REGISTRY["state_as_of_label_time"].fn(spark, SF001).collect()
    ev = spark.read.parquet(f"{SF001}/events.parquet")
    n_labels = ev.filter(F.col("event_id") % _PIT_SAMPLE_MOD == 0).count()
    assert len(rows) == n_labels
    assert len({r["label_id"] for r in rows}) == n_labels
    hist = {
        (r["user_id"], r["version"]): r
        for r in q.REGISTRY["scd2_user_state_history"].fn(spark, SF001).collect()
    }
    for r in rows:
        h = hist[(r["user_id"], r["version"])]
        assert h["valid_from"] <= r["label_tsn"]
        assert h["valid_to"] is None or r["label_tsn"] < h["valid_to"]
        assert h["state"] == r["state_at_label"]


def test_mad_is_robust_where_mean_is_not(spark):
    """The property the MAD query exists for: injecting a handful of
    extreme outliers barely moves median/MAD (bounded by the quantile
    shift of a small contamination) while it blows up mean/stddev — and
    every injected point lands beyond the 3·MAD fence."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.percentiles import (
        exact_group_percentiles,
    )

    base = spark.range(1, 1001).select(
        F.lit("g").alias("grp"), (F.col("id") % 100 + 1.0).alias("v")
    )
    spiked = base.unionByName(
        spark.range(10).select(
            F.lit("g").alias("grp"), F.lit(1.0e6).alias("v")
        )
    )

    def stats(df):
        med = exact_group_percentiles(df, ["grp"], "v", [0.5]).first()["p_0"]
        dev = df.select(
            "grp", F.abs(F.col("v") - F.lit(med)).alias("ad"), "v"
        )
        mad = exact_group_percentiles(dev, ["grp"], "ad", [0.5]).first()["p_0"]
        row = df.agg(
            F.avg("v").alias("mean"), F.stddev("v").alias("sd")
        ).first()
        return med, mad, row["mean"], row["sd"]

    med0, mad0, mean0, sd0 = stats(base)
    med1, mad1, mean1, sd1 = stats(spiked)
    # 1% contamination: robust stats shift by at most a couple of rank
    # positions; the moments explode by orders of magnitude
    assert abs(med1 - med0) <= 2.0 and abs(mad1 - mad0) <= 2.0
    assert mean1 > 100 * mean0 and sd1 > 100 * sd0
    # every injected outlier is beyond the 3-MAD fence of the spiked frame
    n_beyond = spiked.filter(
        F.abs(F.col("v") - F.lit(med1)) > 3 * mad1
    ).count()
    assert n_beyond >= 10
