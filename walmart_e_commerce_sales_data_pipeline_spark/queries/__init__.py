"""Named query registry — the driver contract surface.

Importing this package populates ``REGISTRY`` with every implemented query
(core relational, event-time, dedup, similarity, text analysis).
"""

from . import events, relational  # noqa: F401  (registration side effects)
from .registry import REGISTRY, Query, oracle_map, register, spark_queries  # noqa: F401

from . import (  # noqa: F401
    clusters,
    corpus,
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
# hard oracle-checked signal this round.  Round-5 rotation policy (per the
# round-4 verdict, task #1): the r4 checked window went 50/50 green, so it
# rotates wholesale to the tail; the new checked prefix is exactly the 50
# queries that were in the r4 tail — whose freshest external evidence dates
# from rounds 1/2 — headed by ``events_dow_hour_heatmap``, the single query
# with zero external driver rows in any round.  The two windows are
# disjoint, so after r5 every query's external green row is at most one
# round old.  Every tail query is r4-green and re-proven by the local
# DuckDB mirror (driver-equivalent strictness) on every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # (1) Never externally checked — highest priority.
    "events_dow_hour_heatmap",
    # (2) r1/r2-era external evidence — regain a fresh driver row.
    "monthly_avg_value",
    "events_hourly_window",
    "events_sessionization",
    "events_sliding_window",
    "pricing_summary",
    "impute_group_avg",
    "regional_revenue",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_stats",
    "text_quality_buckets",
    "text_lang_id",
    "doc_fingerprint",
    "text_bpe_tokens",
    "text_repetition",
    "pack_context_segments",
    "pack_greedy_bins",
    "dedup_clusters",
    "event_transition_matrix",
    "dedup_embedding",
    "corpus_clean_pipeline",
    "events_funnel",
    "events_cohort_retention",
    "profile_documents",
    "stratified_sample_stats",
    "join_cross",
    "null_ordering",
    "window_frames_suite",
    "grouping_sets_explicit",
    "asof_join_latest_order",
    "range_join_close_events",
    "correlated_subquery_orders",
    "min_price_per_type",
    "exists_not_exists_combo",
    "lateral_explode_embeddings",
    "tfidf_top_terms",
    "top_supplier_revenue",
    "promo_revenue_share",
    "trailing_spend_range_frame",
    "market_share_by_year",
    "similarity_pairs",
    "similarity_topk",
    "similarity_pairs_blocked",
    "similarity_lsh",
    "similarity_topk_ivf",
    "events_session_window",
    "multimodal_features",
    # (The 50 r4-green queries rotate to the tail — their external
    # evidence is one round old, the freshest possible, and each is
    # mirror-proven by tests/test_queries_vs_duckdb.py every run.)
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
