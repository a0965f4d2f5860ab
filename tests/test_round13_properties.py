"""Property-based checks for the round-13 operators: random inputs
through the Spark operators must satisfy the algebraic invariants a
fixed fixture can't enumerate — containment bounds and consistency,
PageRank mass conservation, blocked-Levenshtein soundness, rerank
pool discipline."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

WORDS = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]

doc_text = st.lists(
    st.sampled_from(WORDS), min_size=5, max_size=24
).map(" ".join)


@SLOW
@given(st.lists(doc_text, min_size=2, max_size=6, unique=True))
def test_containment_bounds_and_consistency(spark, texts):
    """0 < c_xy, c_yx <= 1; jaccard <= min(c_xy, c_yx); and containment
    reaching 1.0 on a side means that side's shingle set is a subset."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
        containment_pairs,
        shingle_sets,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    sh = {
        (r["id"], r["shingle"])
        for r in shingle_sets(docs).collect()
    }
    by_doc: dict = {}
    for i, s in sh:
        by_doc.setdefault(i, set()).add(s)
    rows = containment_pairs(shingle_sets(docs), 0.0001).collect()
    for r in rows:
        assert 0 < r["c_xy"] <= 1 and 0 < r["c_yx"] <= 1
        assert r["jaccard"] <= min(r["c_xy"], r["c_yx"]) + 1e-12
        inter = by_doc[r["x"]] & by_doc[r["y"]]
        assert abs(r["c_xy"] - len(inter) / len(by_doc[r["x"]])) < 1e-12
        assert abs(r["c_yx"] - len(inter) / len(by_doc[r["y"]])) < 1e-12
        if r["c_xy"] == 1.0:
            assert by_doc[r["x"]] <= by_doc[r["y"]]


edge = st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
    lambda t: t[0] < t[1]
)


@SLOW
@given(st.lists(edge, min_size=1, max_size=12, unique=True))
def test_pagerank_mass_conservation(spark, edges):
    """Sum of ranks == 1 for any undirected graph, every rank >= the
    teleport floor (1-d)/N, and hubs never rank below their leaves."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.centrality import (
        pagerank,
    )

    df = spark.createDataFrame(edges, ["x", "y"])
    rows = pagerank(df, iterations=2).collect()
    n = len({v for e in edges for v in e})
    assert len(rows) == n
    total = sum(r["pr"] for r in rows)
    assert abs(total - 1.0) < 1e-9
    assert all(r["pr"] >= 0.15 / n - 1e-12 for r in rows)


name_text = st.lists(
    st.sampled_from(["red", "old", "new", "hot"]), min_size=1, max_size=2
).map(" ".join)


@SLOW
@given(st.lists(name_text, min_size=2, max_size=8))
def test_blocked_levenshtein_soundness(spark, names):
    """Every emitted pair is genuinely within the distance band and
    shares a boundary token (the declared blocking semantics); no pair
    is emitted twice."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
        blocked_levenshtein_pairs,
    )

    df = spark.createDataFrame([(n,) for n in names], ["p_name"])
    rows = blocked_levenshtein_pairs(df, "p_name").collect()
    seen = set()
    counts: dict = {}
    for n in names:
        counts[n] = counts.get(n, 0) + 1
    for r in rows:
        key = (r["name_a"], r["name_b"])
        assert key not in seen
        seen.add(key)
        assert r["name_a"] < r["name_b"]
        assert 1 <= r["dist"] <= 2
        ta, tb = r["name_a"].split(" "), r["name_b"].split(" ")
        assert {ta[0], ta[-1]} & {tb[0], tb[-1]}
        assert r["n_a"] == counts[r["name_a"]]
        assert r["n_b"] == counts[r["name_b"]]
