"""RRF fusion invariants (queries/retrieval.py): list membership, score
monotonicity, and the both-lists-beats-one property.  Cross-engine value
equality is covered by the registry mirror.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from walmart_e_commerce_sales_data_pipeline_spark import queries as q
from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
    bm25_scores,
)
from walmart_e_commerce_sales_data_pipeline_spark.queries.retrieval import (
    _RRF_K,
    _RRF_POOL,
    _RRF_QUERY_ID,
)
from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import table

from tests.conftest import SF001


def test_rrf_fusion_invariants(spark):
    rows = q.REGISTRY["rrf_hybrid_retrieval"].fn(spark, SF001).collect()
    assert len(rows) == 10
    # Ranks are the 1..10 prefix in fused-score order; scores non-increasing.
    assert [r["rk"] for r in rows] == list(range(1, 11))
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # Every fused doc came from at least one pool, and the score is
        # exactly the reciprocal-rank sum of its list memberships.
        assert r["lex_rank"] is not None or r["dense_rank"] is not None
        expect = 0.0
        if r["lex_rank"] is not None:
            assert 1 <= r["lex_rank"] <= _RRF_POOL
            expect += 1.0 / (_RRF_K + r["lex_rank"])
        if r["dense_rank"] is not None:
            assert 1 <= r["dense_rank"] <= _RRF_POOL
            expect += 1.0 / (_RRF_K + r["dense_rank"])
        assert abs(r["rrf_score"] - round(expect, 6)) < 1e-12, r
    # A doc present in BOTH lists outranks a doc whose single-list rank is
    # no better than either of its ranks.
    both = [r for r in rows if r["lex_rank"] and r["dense_rank"]]
    single = [
        r for r in rows if (r["lex_rank"] is None) != (r["dense_rank"] is None)
    ]
    if both and single:
        worst_both = min(both, key=lambda r: r["rrf_score"])
        for s in single:
            sr = s["lex_rank"] or s["dense_rank"]
            if sr >= max(worst_both["lex_rank"], worst_both["dense_rank"]):
                assert s["rrf_score"] < worst_both["rrf_score"]


def test_rrf_pools_rank_expected_members(spark):
    """The lexical pool must equal the standalone BM25 ranking's head, so
    fusion demonstrably reuses the registered scorer's semantics."""
    docs = table(spark, SF001, "documents")
    bm = (
        bm25_scores(docs)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_POOL)
        .collect()
    )
    lex_ids = [r["doc_id"] for r in bm]
    rows = q.REGISTRY["rrf_hybrid_retrieval"].fn(spark, SF001).collect()
    for r in rows:
        if r["lex_rank"] is not None:
            assert lex_ids[r["lex_rank"] - 1] == r["id"]
        assert r["id"] != _RRF_QUERY_ID  # the probe never retrieves itself
