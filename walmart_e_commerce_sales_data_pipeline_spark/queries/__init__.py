"""Named query registry — the driver contract surface.

Importing this package populates ``REGISTRY`` with every implemented query
(core relational, event-time, dedup, similarity, text analysis).
"""

from . import events, relational  # noqa: F401  (registration side effects)
from .registry import REGISTRY, Query, oracle_map, register, spark_queries  # noqa: F401

from . import (  # noqa: F401
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
    similarity,
    streaming_media,
    text,
)

# ---------------------------------------------------------------------------
# Curated registration order — ROTATED each round.
#
# The external correctness harness checks a *prefix* of the registry in
# registration order, so import order alone decides which operators get a
# hard oracle-checked signal this round.  Round-6 rotation policy (per the
# round-5 verdict, task #4): the checked prefix is the 50 queries with the
# OLDEST external evidence, computed mechanically by
# ``tools/rotate_window.py`` from the committed CORRECTNESS_r*.json files —
#   (1) the six queries with NO green external row ever:
#       ``events_dow_hour_heatmap`` (its only external row is the r5 ERR)
#       plus the five round-6 additions (queries/curation.py);
#   (2) the 11 queries that ERR'd in r5 under the events-loader /
#       testdata-drift break (fixed this round, queries/tables.py) — their
#       last green rows date from r1/r2;
#   (3) r4-green queries oldest-first in prior registry order, leading with
#       the 8 events-dependent ones (their evidence predates the loader
#       fix).
# The 38 r5-green queries rotate wholesale to the tail (evidence one round
# old), followed by the r4-green relational stragglers (two rounds old —
# the window can't cover every stale query at width 50).  Every tail query
# is re-proven by the local DuckDB mirror (tests/test_queries_vs_duckdb.py,
# driver-equivalent strictness) on every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "events_dow_hour_heatmap",
    "bm25_doc_retrieval",
    "source_unigram_divergence",
    "disjunctive_predicate_revenue",
    "events_rolling_engagement",
    "events_hourly_anomaly",
    "monthly_avg_value",
    "events_hourly_window",
    "events_sessionization",
    "events_sliding_window",
    "impute_group_avg",
    "event_transition_matrix",
    "events_funnel",
    "events_cohort_retention",
    "asof_join_latest_order",
    "range_join_close_events",
    "events_session_window",
    "events_json_extract",
    "user_event_paths",
    "time_series_gap_fill",
    "key_skew_profile",
    "latest_record_compaction",
    "union_all_monthly",
    "grouped_zscore_histogram",
    "from_json_map",
    "scalar_means",
    "join_customer_orders",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "window_topk_orders",
    "window_running_total",
    "top10_expensive_items",
    "set_operations",
    "distinct_counts",
    "rollup_customer_geo",
    "cube_order_status",
    "string_functions",
    "date_functions",
    "agg_suite",
    "case_when_tiers",
    "decontaminate_corpus",
    "vocab_top_ngrams",
    "quality_percentile_filter",
    "cdc_chunk_stats",
    "token_budget_fill",
    "dedup_canonical_keep",
    "dup_graph_triangles",
    "mixture_sampling_plan",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
