"""Operator-level tests for dedup and similarity-search on the driver
testdata (sf0.001 for speed) plus handcrafted near-duplicate fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_dedup_pairs,
    shingle_sets,
    simhash_pairs,
    simhash_signatures,
)
from walmart_e_commerce_sales_data_pipeline_spark.operators.similarity import (
    cosine_pairs,
    lsh_bucketed_pairs,
    topk_neighbors,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet")


def test_exact_dedup_on_synthetic(spark):
    df = spark.createDataFrame(
        [(1, "Hello World"), (2, "hello   world"), (3, "hello world"), (4, "other")],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r["dup_count"] for r in exact_dedup(df).collect()}
    # 1 and 3 normalize identically ("hello world"); 2 has empty tokens from
    # multi-space split, so it normalizes differently under the single-space
    # contract; representative is min(doc_id).
    assert out[1] == 2
    assert 4 in out


def test_minhash_recall_matches_exact(docs):
    exact = {
        (r["x"], r["y"]) for r in jaccard_pairs(shingle_sets(docs), 0.5).collect()
    }
    lsh = {(r["x"], r["y"]) for r in minhash_dedup_pairs(docs, threshold=0.5).collect()}
    assert exact, "testdata should contain planted near-duplicates"
    assert lsh == exact  # LSH candidates + exact verification ⇒ identical set


def test_simhash_finds_planted_near_dups(docs):
    sigs = simhash_signatures(docs)
    pairs = {(r["x"], r["y"]) for r in simhash_pairs(sigs, max_hamming=8).collect()}
    exact = {
        (r["x"], r["y"]) for r in jaccard_pairs(shingle_sets(docs), 0.9).collect()
    }
    # SimHash at generous hamming should recover most J≥0.9 planted dups.
    assert exact
    recall = len(pairs & exact) / len(exact)
    assert recall >= 0.8, f"simhash recall {recall} over {len(exact)} planted pairs"


def test_similarity_lsh_matches_bruteforce(emb):
    brute = {(r["x"], r["y"]) for r in cosine_pairs(emb, threshold=0.45).collect()}
    lsh = {(r["x"], r["y"]) for r in lsh_bucketed_pairs(emb, threshold=0.45).collect()}
    assert lsh == brute


def test_topk_neighbors_shape(emb):
    queries = emb.filter(F.col("vec_id") < 5)
    rows = topk_neighbors(emb, queries, k=3).collect()
    assert len(rows) == 15  # 5 queries × 3 neighbors
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == [1, 2, 3]
        sims = [r["sim"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)
