"""Full-registry plan sweep: the scale-killer guard.

SCALE.md §1 audited every registered query's physical plan for
nested-loop shapes by hand (rounds 6-8).  This test mechanizes that
audit so it re-runs on every suite run: building the physical plan of
ALL registered queries (driver-side only, nothing executes) and failing
if a BroadcastNestedLoopJoin or CartesianProduct appears outside the
whitelisted sites — i.e., a future edit that silently degrades an
equi-join into an all-pairs scan can no longer land green.
"""

from __future__ import annotations

from tests.conftest import SF001
from walmart_e_commerce_sales_data_pipeline_spark import queries as q
from walmart_e_commerce_sales_data_pipeline_spark.plans import formatted_plan

# Every allowed nested-loop site, with why it cannot blow up at scale.
# A BNLJ is only acceptable when one side is KNOWN bounded: a 1-row
# aggregate, a fixed dimension grid, or a deliberately-brute baseline
# whose production path is the LSH/IVF variant.
BNLJ_WHITELIST = {
    # 1-row global-aggregate broadcasts (scalar-subquery shape): the
    # build side is a single row of corpus/group statistics.
    "bigram_pmi",
    "bm25_doc_retrieval",
    "doc_unigram_logprob",
    "dormant_customer_balance",
    "important_supplier_share",
    "key_skew_profile",
    "kmv_sketch_union",
    "ngram_distribution_profile",
    "orders_rfm_segments",
    "source_unigram_divergence",
    "time_series_gap_fill",
    # deliberate CROSS JOIN semantics over two bounded dimensions.
    "join_cross",
    # brute-force exact baselines, kept as the oracle-shaped reference
    # implementations; the production paths are similarity_lsh /
    # similarity_topk_ivf (bucketed / cell-joined, plan-asserted in
    # test_plans.py).
    "similarity_pairs",
    "similarity_topk",
}


def test_no_unbounded_nested_loop_joins_anywhere(spark):
    offenders: dict[str, str] = {}
    unused_whitelist = set(BNLJ_WHITELIST)
    for name, entry in q.REGISTRY.items():
        plan = formatted_plan(entry.fn(spark, SF001))
        has_nlj = "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
        if has_nlj:
            if name in BNLJ_WHITELIST:
                unused_whitelist.discard(name)
            else:
                offenders[name] = "nested-loop join outside the whitelist"
    assert not offenders, offenders
    # keep the whitelist honest: entries whose queries no longer plan a
    # BNLJ should be removed, not accumulate.
    assert not unused_whitelist, (
        f"stale whitelist entries (no BNLJ in plan anymore): {unused_whitelist}"
    )
