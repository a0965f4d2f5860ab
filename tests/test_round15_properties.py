"""Property-based checks for the round-15 primitives: the Misra-Gries
mergeable-summary laws (Agarwal et al., PODS'12) for ANY input stream
(pure-python, milliseconds per example), plus the Spark-side merge law on
the real corpus — per-shard summaries built by the registered query's own
construction, merged by counter addition + compress, checked against the
exact counts."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from walmart_e_commerce_sales_data_pipeline_spark.queries.sketches import _MG_K

FAST = settings(
    max_examples=50,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mg_compress(counts: dict[str, int], k: int) -> tuple[dict[str, int], int]:
    """The order-independent Misra-Gries compress the query ships: subtract
    the (k+1)-th largest counter from every counter, keep the positive
    ones.  Returns (summary, decrement)."""
    if len(counts) <= k:
        return dict(counts), 0
    t = sorted(counts.values(), reverse=True)[k]
    return {x: c - t for x, c in counts.items() if c > t}, t


@FAST
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=300),
    st.integers(1, 8),
)
def test_mg_summary_laws_for_any_stream(stream, k):
    """For ANY stream and summary size: the compress never OVERcounts,
    undercounts every item by the same decrement t <= N/(k+1), keeps at
    most k items, and every item with true frequency > N/(k+1) survives
    — the Misra-Gries guarantee the registered query's apriori_bound and
    guaranteed columns claim."""
    counts = Counter(str(x) for x in stream)
    n = len(stream)
    summary, t = _mg_compress(counts, k)
    assert len(summary) <= k
    assert (k + 1) * t <= n
    for x, c in summary.items():
        assert c == counts[x] - t and c > 0
    for x, c in counts.items():
        if c * (k + 1) > n:
            assert x in summary, (x, c, n, k, t)


@FAST
@given(
    st.lists(st.integers(0, 30), min_size=1, max_size=200),
    st.lists(st.integers(0, 30), min_size=1, max_size=200),
    st.integers(1, 8),
)
def test_mg_merge_law_for_any_split(s1, s2, k):
    """Mergeability (PODS'12): merge two per-shard summaries by counter
    ADDITION, then compress to k.  The decrements telescope — each
    removes >= (k+1)x its value of remaining mass — so the total error
    stays <= N/(k+1) for the COMBINED stream, exactly as if one summary
    had seen everything.  Checked for ANY split of any stream."""
    c1, c2 = Counter(str(x) for x in s1), Counter(str(x) for x in s2)
    m1, t1 = _mg_compress(c1, k)
    m2, t2 = _mg_compress(c2, k)
    added = Counter(m1)
    added.update(m2)
    merged, t3 = _mg_compress(added, k)
    n = len(s1) + len(s2)
    truth = c1 + c2
    assert (k + 1) * (t1 + t2 + t3) <= n, (t1, t2, t3, n, k)
    for x, c in merged.items():
        assert 0 < c <= truth[x]
        assert truth[x] - c <= t1 + t2 + t3
    for x, c in truth.items():
        if c * (k + 1) > n:
            assert x in merged, (x, c, n, k)


def test_mg_spark_merge_matches_per_shard_compress(spark):
    """Spark-side merge law on the real corpus: per-shard summaries built
    by the registered construction over the two doc_id-parity shards,
    merged by counter addition + compress — every merged counter
    undercounts its exact corpus count by <= the telescoped decrement
    sum, which itself respects the a-priori N/(k+1) bound."""
    from pyspark.sql import functions as F

    from tests.conftest import SF001
    from walmart_e_commerce_sales_data_pipeline_spark.functions.text import (
        tokenize,
        word_shingles,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import (
        table,
    )

    docs = table(spark, SF001, "documents")
    occ = docs.select(
        (F.col("doc_id") % 2).alias("shard"),
        F.explode(word_shingles(tokenize("text"), 3)).alias("shingle"),
    )
    per_shard = {
        shard: Counter(
            {
                r["shingle"]: r["n"]
                for r in occ.filter(F.col("shard") == shard)
                .groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
        )
        for shard in (0, 1)
    }
    from tests.test_round15_properties import _mg_compress  # self, for clarity

    m0, t0 = _mg_compress(per_shard[0], _MG_K)
    m1, t1 = _mg_compress(per_shard[1], _MG_K)
    added = Counter(m0)
    added.update(m1)
    merged, t2 = _mg_compress(added, _MG_K)
    truth = per_shard[0] + per_shard[1]
    n = sum(truth.values())
    t_total = t0 + t1 + t2
    assert (_MG_K + 1) * t_total <= n
    assert 0 < len(merged) <= _MG_K
    for x, c in merged.items():
        assert 0 < c <= truth[x]
        assert truth[x] - c <= t_total
    for x, c in truth.items():
        if c * (_MG_K + 1) > n:
            assert x in merged
