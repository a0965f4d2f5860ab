"""Named query registry — the driver contract surface.

Importing this package populates ``REGISTRY`` with every implemented query
(core relational, event-time, dedup, similarity, text analysis).
"""

from . import events, relational  # noqa: F401  (registration side effects)
from .registry import REGISTRY, Query, oracle_map, register, spark_queries  # noqa: F401

from . import (  # noqa: F401
    analysis,
    clusters,
    corpus,
    curation,
    dedup,
    diagnostics,
    grouped_pandas,
    lakehouse,
    product_analytics,
    profiling,
    relational2,
    relational3,
    relational4,
    relational5,
    retrieval,
    similarity,
    sketches,
    skyline,
    streaming_media,
    text,
)

# ---------------------------------------------------------------------------
# Curated registration order — ROTATED each round.
#
# The external correctness harness checks a *prefix* of the registry in
# registration order, so import order alone decides which operators get a
# hard oracle-checked signal this round.  Rotation policy (standing since
# round 6): the checked prefix is the 50 queries with the OLDEST external
# evidence, computed mechanically by ``tools/rotate_window.py`` from the
# committed CORRECTNESS_r*.json files (the tool also asserts a staleness
# horizon: no query may project past 5 rounds without external evidence
# under the proposed window).
#
# Round-16 staleness histogram (registry at 202 after this round's seven
# additions — ``survival_km_logrank``, the per-cohort Kaplan-Meier
# curves with the Mantel log-rank A/B test; ``zipf_slope_fit`` and
# ``heaps_law_fit``, the classic corpus-profiling pair (rank-frequency
# slope over the counts-of-counts table; vocabulary-growth exponent
# over per-source shards); ``events_hourly_mg``, the batch readout of
# the SIXTH streaming sketch family, the applyInPandasWithState
# Misra-Gries heavy-hitter twin; ``revenue_mann_kendall``, the
# nonparametric trend-significance test beside Theil-Sen's magnitude;
# ``source_token_diversity``, the Shannon/Pielou/Simpson per-source
# mixture screen; and ``survival_logrank_stratified``, the
# enrollment-week-stratified A/B log-rank): 7 never-green, 45 last
# green externally in r12, 50 in r13, 50 in r14, 50 in r15.  The
# window, computed and staleness-asserted by tools/rotate_window.py,
# is the r15 VERDICT item 1 prescription: the seven never-green
# round-16 queries, then 43 of the 45 r12-stale queries
# (``set_operations``, ``distinct_counts``, ``rollup_customer_geo``,
# ``cube_order_status``, ``string_functions``, ``kmv_sketch_union``,
# ``sliding_chunk_windows``, ``bigram_pmi``, ... in prior registry
# order; ``similarity_topk_ivf`` and ``multimodal_features`` carry to
# r17 at projected staleness 4, inside the 5-round limit the tool
# asserts).
# Every tail query is re-proven by the local DuckDB mirror
# (tests/test_queries_vs_duckdb.py, driver-equivalent strictness) on
# every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "survival_km_logrank",
    "zipf_slope_fit",
    "events_hourly_mg",
    "heaps_law_fit",
    "revenue_mann_kendall",
    "source_token_diversity",
    "survival_logrank_stratified",
    "window_topk_orders",
    "window_running_total",
    "top10_expensive_items",
    "set_operations",
    "distinct_counts",
    "rollup_customer_geo",
    "cube_order_status",
    "string_functions",
    "kmv_sketch_union",
    "sliding_chunk_windows",
    "bigram_pmi",
    "dup_graph_degree_hist",
    "winsorized_price_stats",
    "ngram_distribution_profile",
    "cross_source_dup_matrix",
    "scd2_user_state_history",
    "state_as_of_label_time",
    "mad_outlier_rate",
    "pii_redaction_stats",
    "dup_cluster_size_dist_star",
    "dedup_cluster_density",
    "text_token_entropy",
    "doc_unigram_logprob",
    "kmv_distinct_sketch",
    "hll_distinct_sketch",
    "merge_upsert_orders",
    "weighted_sample_aes",
    "promo_revenue_share",
    "trailing_spend_range_frame",
    "market_share_by_year",
    "bilateral_trade_volume",
    "product_profit_by_nation_year",
    "returned_item_customers",
    "priority_shipping_split",
    "brand_supplier_counts",
    "order_priority_checking",
    "important_supplier_share",
    "small_quantity_order_revenue",
    "excess_shipping_suppliers",
    "similarity_pairs",
    "similarity_topk",
    "similarity_pairs_blocked",
    "similarity_lsh",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
