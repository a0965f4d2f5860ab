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
# Round-15 staleness histogram (registry at 185 after this round's nine
# additions — wave 1: ``events_hourly_kmv``, the batch readout of the
# fifth and final streaming sketch family twin; ``mg_heavy_hitters``,
# the Misra-Gries deterministic heavy-hitter summary; the signed
# Count-Sketch pair ``countsketch_user_freq`` / ``countsketch_f2``;
# and ``time_decayed_engagement``, the dyadic-exact landmark-decay
# counter.  Wave 2: ``events_forward_decay``, the streaming-maintainable
# forward-decay reorganization of that counter; ``countsketch_join_size``,
# the unbiased AMS two-relation join-size estimator;
# ``priority_sample_subsetsum``, the Duffield-Lund-Thorup weight-
# sensitive sample with its Horvitz-Thompson subset-sum estimator; and
# ``benford_digit_profile``, the first-digit forensic screen.  Wave 3:
# ``revenue_gini_lorenz``, the exact tied-rank Gini with the 10-point
# Lorenz curve via the zone-decomposed rank; and
# ``survival_time_to_purchase``, the Kaplan-Meier product-limit
# time-to-conversion curve with right-censoring.  Wave 4:
# ``basket_association_rules``, market-basket support/confidence/lift;
# ``revenue_cusum_changepoint``, the pure-BIGINT CUSUM level-shift
# scan; and ``quality_score_auc``, the Mann-Whitney midrank ROC-AUC.
# Wave 5: ``vocab_coverage_estimators``, Chao1 species richness +
# Good-Turing unseen mass from the frequency-of-frequencies; and
# ``revenue_autocorrelation``, the Box-Jenkins sample ACF at lags 1-6
# in exact cross-multiplied integers.  Wave 6:
# ``revenue_seasonal_decomposition``, the classical 2x12-MA additive
# decomposition with cross-multiplied integer sufficient statistics;
# and ``market_concentration_hhi``, the Herfindahl-Hirschman supplier
# concentration screen.  Wave 7: ``training_negative_samples``, the
# deterministic (user, item-not-interacted) pair generator for
# contrastive/two-tower training):
# 19 never-green, 26 last green externally in r10, 50 in r12, 50 in
# r13, 50 in r14.  The window, computed and staleness-asserted by
# tools/rotate_window.py, extends the r14 VERDICT prescription: the
# nineteen never-green queries, then ALL twenty-six r10-stale ones
# (``shipping_priority_top10``, ``large_quantity_orders``,
# ``above_average_orders``, ``pivot_status_by_year``,
# ``price_percentiles``, ``regex_math_functions``, ``ship_delay_buckets``,
# ``map_array_functions``, ``join_right_outer``, ``join_cross``,
# ``null_ordering``, ``window_frames_suite``, ``grouping_sets_explicit``,
# ``correlated_subquery_orders``, ``min_price_per_type``,
# ``exists_not_exists_combo``, ``lateral_explode_embeddings``,
# ``tfidf_top_terms``, ``top_supplier_revenue``,
# ``dormant_customer_balance``, ``local_supplier_volume``,
# ``customer_order_histogram``, ``set_operations_all``,
# ``orders_rfm_segments``, ``quantize_embeddings``,
# ``label_centroid_similarity``), then the 5 stalest r12-green queries
# in prior registry order (projected staleness horizon after r15: worst
# 3 rounds — window_topk_orders — inside the 5-round limit the tool
# asserts).
# Every tail query is re-proven by the local DuckDB mirror
# (tests/test_queries_vs_duckdb.py, driver-equivalent strictness) on
# every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "events_hourly_kmv",
    "mg_heavy_hitters",
    "countsketch_user_freq",
    "countsketch_f2",
    "time_decayed_engagement",
    "events_forward_decay",
    "benford_digit_profile",
    "priority_sample_subsetsum",
    "countsketch_join_size",
    "survival_time_to_purchase",
    "revenue_gini_lorenz",
    "basket_association_rules",
    "revenue_cusum_changepoint",
    "quality_score_auc",
    "vocab_coverage_estimators",
    "revenue_autocorrelation",
    "revenue_seasonal_decomposition",
    "market_concentration_hhi",
    "training_negative_samples",
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
    "label_centroid_similarity",
    "concurrent_sessions_profile",
    "pricing_summary",
    "join_anti",
    "join_full_outer",
    "regional_revenue",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
