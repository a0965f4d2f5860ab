"""Property-based tests for the temporal join operators: randomized
(key, time, id) tables against brute-force Python models.  Complements
the fixed-edge-case tests in test_temporal.py — hypothesis explores bin
boundaries, duplicate timestamps, and negative/huge time values the
hand-written cases might miss.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from walmart_e_commerce_sales_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join_pairs,
)

TOL = 50

# Times cluster near bin edges (multiples of TOL +/- 2) plus extremes, so
# every draw exercises the boundary arithmetic rather than random interior
# points.
edge_times = st.one_of(
    st.integers(min_value=-4, max_value=4).map(lambda d: d * TOL),
    st.builds(
        lambda b, d: b * TOL + d,
        st.integers(min_value=-4, max_value=4),
        st.integers(min_value=-2, max_value=2),
    ),
    st.sampled_from(
        [1_700_000_000_000_000_000, 1_700_000_000_000_000_050, -1_700_000_000_000_000_000]
    ),
)

range_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), edge_times),
    min_size=0,
    max_size=14,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(range_rows)
def test_range_join_matches_brute_force(spark, pairs):
    rows = [(k, t, i) for i, (k, t) in enumerate(pairs)]
    want = {
        (k1, i1, i2)
        for k1, t1, i1 in rows
        for k2, t2, i2 in rows
        if k1 == k2 and i1 < i2 and abs(t1 - t2) <= TOL
    }
    df = spark.createDataFrame(rows, ["k", "t", "id"]) if rows else None
    if df is None:
        return
    got = {
        (r["k"], r["ida"], r["idb"])
        for r in range_join_pairs(df, "k", "t", "id", TOL).collect()
    }
    assert got == want, f"rows={rows}"


asof_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]), st.integers(min_value=-100, max_value=100)),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(asof_rows, asof_rows)
def test_asof_join_matches_model(spark, lrows, rrows):
    left = [(k, t, f"L{i}") for i, (k, t) in enumerate(lrows)]
    # Right side must be unique per (key, time) — the operator's contract.
    seen: dict[tuple[str, int], float] = {}
    for i, (k, t) in enumerate(rrows):
        seen[(k, t)] = float(i)
    right = [(k, t, v) for (k, t), v in seen.items()]

    def model(k, t):
        cands = [(rt, v) for rk, rt, v in right if rk == k and rt <= t]
        return max(cands)[1] if cands else None

    want = {(k, tag, model(k, t)) for k, t, tag in left}

    ldf = spark.createDataFrame(left, ["k", "t", "tag"])
    rdf = spark.createDataFrame(right, ["k", "rt", "v"])
    got = {
        (r["k"], r["tag"], r["asof_v"])
        for r in asof_join(ldf, rdf, "k", "t", "rt", "v").collect()
    }
    assert got == want, f"left={left} right={right}"
