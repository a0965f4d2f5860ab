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
    grouped_pandas,
    lakehouse,
    product_analytics,
    profiling,
    relational2,
    relational3,
    relational4,
    relational5,
    similarity,
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
# committed CORRECTNESS_r*.json files.  Round-11 staleness histogram:
# 7 never-green (the new ``dup_cluster_size_dist_star``,
# ``merge_upsert_orders``, ``mad_outlier_rate``,
# ``concurrent_sessions_profile``, ``pii_redaction_stats``,
# ``hll_distinct_sketch`` and ``weighted_sample_aes``),
# 35 queries last green externally in r8, 50 in r9, 50 in r10.  The
# window is therefore the 7 never-green + all 35 r8-green + the 8
# stalest r9-green queries in prior registry order; after this round no
# query's newest external evidence will be older than r9.  Every tail query is re-proven by the
# local DuckDB mirror (tests/test_queries_vs_duckdb.py,
# driver-equivalent strictness) on every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "dup_cluster_size_dist_star",
    "merge_upsert_orders",
    "concurrent_sessions_profile",
    "mad_outlier_rate",
    "pii_redaction_stats",
    "hll_distinct_sketch",
    "weighted_sample_aes",
    "join_anti",
    "join_full_outer",
    "window_topk_orders",
    "window_running_total",
    "kmv_sketch_union",
    "sliding_chunk_windows",
    "bigram_pmi",
    "dup_graph_degree_hist",
    "winsorized_price_stats",
    "ngram_distribution_profile",
    "cross_source_dup_matrix",
    "scd2_user_state_history",
    "state_as_of_label_time",
    "dedup_cluster_density",
    "text_token_entropy",
    "doc_unigram_logprob",
    "kmv_distinct_sketch",
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
    "similarity_topk_ivf",
    "multimodal_features",
    "pricing_summary",
    "regional_revenue",
    "top10_expensive_items",
    "set_operations",
    "distinct_counts",
    "rollup_customer_geo",
    "cube_order_status",
    "string_functions",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
