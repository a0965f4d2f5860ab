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
# committed CORRECTNESS_r*.json files (the tool now also asserts a
# staleness horizon: no query may project past 5 rounds without external
# evidence under the proposed window).
#
# Round-14 staleness histogram (registry at 176 after this round's
# seventeen additions — seven wave-1, five wave-2, three wave-3, two
# wave-4): 17 never-green
# (wave-1: ``events_hourly_bloom_returns``, ``kmv_set_difference``,
# ``events_hourly_hll``, ``cms_selfjoin_size``,
# ``events_daily_hll_rollup``, ``events_sliding_hll``,
# ``cms_join_size_estimate``; wave-2: ``multi_touch_attribution`` —
# exact penny-allocation attribution, ``revenue_theilsen_slope`` —
# robust median-of-slopes trend, ``similarity_inverted_index`` —
# sparse postings-join ANN, ``cube_distinct_hll`` — sketch-merged OLAP
# margins, ``pareto_frontier_parts`` — linear skyline; wave-3:
# ``bootstrap_ci_revenue`` — Poisson-bootstrap confidence bands,
# ``incremental_rollup_maintenance`` — retraction-stream IVM,
# ``jaccard_prefix_filter`` — exact PPJoin-style set-similarity join;
# wave-4: ``revenue_seasonality_regression`` — two-regressor OLS by
# Cramer's rule, ``corr_matrix_lineitem`` — one-pass Pearson matrix), 9
# queries last green externally in r9, 50 in r10, 50 in r12, 50 in
# r13.
# The window is the seventeen never-green queries, the nine r9-stale ones
# (``common_shingle_fraction``, ``grouped_zscore_histogram``,
# ``events_funnel``, ``events_cohort_retention``,
# ``mixture_sampling_plan``, ``from_json_map``,
# ``asof_join_latest_order``, ``range_join_close_events``,
# ``events_session_window``), then the 24 stalest r10-green queries in
# prior registry order; twenty-six r10-green queries
# (``shipping_priority_top10``, ``large_quantity_orders``,
# ``above_average_orders``, ``pivot_status_by_year``, ``price_percentiles``,
# ``regex_math_functions``, ``ship_delay_buckets``,
# ``map_array_functions``, ``join_right_outer``, ``join_cross``,
# ``exists_not_exists_combo`` ... ``min_price_per_type``,
# ``correlated_subquery_orders``, ``grouping_sets_explicit``,
# ``window_frames_suite``, ``null_ordering``) no longer fit and head
# the r15 window (projected staleness horizon after r14: worst 4
# rounds, inside the 5-round limit asserted by tools/rotate_window.py).
# Every tail query is re-proven by
# the local DuckDB mirror (tests/test_queries_vs_duckdb.py,
# driver-equivalent strictness) on every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "events_hourly_bloom_returns",
    "kmv_set_difference",
    "events_hourly_hll",
    "cms_selfjoin_size",
    "events_daily_hll_rollup",
    "events_sliding_hll",
    "cms_join_size_estimate",
    "multi_touch_attribution",
    "revenue_theilsen_slope",
    "similarity_inverted_index",
    "cube_distinct_hll",
    "pareto_frontier_parts",
    "bootstrap_ci_revenue",
    "incremental_rollup_maintenance",
    "jaccard_prefix_filter",
    "revenue_seasonality_regression",
    "corr_matrix_lineitem",
    "common_shingle_fraction",
    "grouped_zscore_histogram",
    "events_funnel",
    "events_cohort_retention",
    "mixture_sampling_plan",
    "from_json_map",
    "asof_join_latest_order",
    "range_join_close_events",
    "events_session_window",
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
    "event_interarrival_profile",
    "scalar_means",
    "impute_group_avg",
    "join_customer_orders",
    "join_left_outer",
    "join_semi",
    "warc_curation_by_day",
    "vocab_oov_rate",
    "prefix_dup_groups",
    "profile_documents",
    "stratified_sample_stats",
    "train_val_test_split",
    "embedding_dim_profile",
    "forecast_revenue",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
