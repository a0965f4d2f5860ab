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
# committed CORRECTNESS_r*.json files.  Round-13 staleness histogram
# (after this round's eleven wave-2 additions): 17 never-green (the six
# earlier round-13 queries ``substring_dup_coverage``,
# ``retrieve_rerank_topk``, ``fuzzy_name_matches``, ``dup_graph_pagerank``,
# ``dedup_containment``, ``cms_heavy_hitters`` plus the wave-2
# ``referential_integrity_audit``, ``revenue_trend_slope``,
# ``rrf_hybrid_retrieval``, ``histogram_quantile_sketch``,
# ``kmv_jaccard_langs``, ``events_hourly_cms`` — the streaming-CMS
# batch twin — ``embedding_top_pc``, ``events_time_weighted_value``,
# ``revenue_decline_streaks``, ``bloom_semijoin_stats``, and
# ``events_hourly_value_quantiles`` — the streaming-quantile-sketch
# batch twin), 42 queries last green
# externally in r9, 50 in
# r10, 50 in r12 (the r12 window duplicated r11's, so no query is r11).
# The window is the seventeen never-green queries plus the 33 stalest
# r9-green ones in prior registry order; nine r9-green queries
# (``asof_join_latest_order``, ``range_join_close_events``,
# ``events_session_window``, ``from_json_map``,
# ``mixture_sampling_plan``, ``events_funnel``,
# ``events_cohort_retention``, ``grouped_zscore_histogram``,
# ``common_shingle_fraction``) no longer fit and rotate to the r14
# head.
# Every tail query is re-proven by the local DuckDB mirror
# (tests/test_queries_vs_duckdb.py, driver-equivalent strictness) on
# every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "substring_dup_coverage",
    "retrieve_rerank_topk",
    "fuzzy_name_matches",
    "dup_graph_pagerank",
    "dedup_containment",
    "cms_heavy_hitters",
    "referential_integrity_audit",
    "revenue_trend_slope",
    "rrf_hybrid_retrieval",
    "histogram_quantile_sketch",
    "kmv_jaccard_langs",
    "events_hourly_cms",
    "embedding_top_pc",
    "events_time_weighted_value",
    "revenue_decline_streaks",
    "bloom_semijoin_stats",
    "events_hourly_value_quantiles",
    "date_functions",
    "agg_suite",
    "case_when_tiers",
    "union_all_monthly",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "decontaminate_corpus",
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
    "vocab_top_ngrams",
    "quality_percentile_filter",
    "cdc_chunk_stats",
    "token_budget_fill",
    "dedup_clusters",
    "dedup_canonical_keep",
    "event_transition_matrix",
    "dedup_embedding",
    "dup_graph_triangles",
    "corpus_clean_pipeline",
    "warc_roundtrip_curation",
    "bm25_doc_retrieval",
    "source_unigram_divergence",
    "disjunctive_predicate_revenue",
    "events_rolling_engagement",
    "events_hourly_anomaly",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
