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
# Round-17 staleness histogram (registry at 202 going in; CORRECTNESS_r16
# went 50/50 green, so evidence now reads 2 last-green r12
# (``similarity_topk_ivf``, ``multimodal_features`` — staleness 4, they
# MUST land this round), 50 @ r13, 50 @ r14, 50 @ r15, 50 @ r16.  The
# window, computed and staleness-asserted by tools/rotate_window.py, is
# the r16 VERDICT item 1 prescription: the two r12 carry-overs first,
# then (never-green first, the standing policy) this round's new
# ``source_ks_drift`` + ``conversion_ab_ztest`` +
# ``events_hourly_sample_aes`` (the seventh streaming family's batch
# readout) + ``event_dow_independence`` + ``source_psi_drift`` and
# the stalest 43 of the 50 r13-green queries in registry order
# (``date_functions``, ``agg_suite``, ``case_when_tiers``,
# ``union_all_monthly``, the dedup/text/curation families, ...).  The
# seven r13-green queries the 50-cap excludes head the r18 window at
# staleness 5 — exactly the structural refresh period for a
# 207-query registry over a 50-row window; the tool's
# MAX_STALE_ROUNDS=5 assertion passed with worst projected staleness
# 4 (``rrf_hybrid_retrieval``).
# Every tail query is re-proven by the local DuckDB mirror
# (tests/test_queries_vs_duckdb.py, driver-equivalent strictness) on
# every pytest run.
# ---------------------------------------------------------------------------
_PRIORITY = [
    "source_ks_drift",
    "conversion_ab_ztest",
    "events_hourly_sample_aes",
    "event_dow_independence",
    "source_psi_drift",
    "similarity_topk_ivf",
    "multimodal_features",
    "date_functions",
    "agg_suite",
    "case_when_tiers",
    "union_all_monthly",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "decontaminate_corpus",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "substring_dup_coverage",
    "fuzzy_name_matches",
    "dedup_containment",
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
    "dup_graph_pagerank",
    "corpus_clean_pipeline",
    "warc_roundtrip_curation",
    "bm25_doc_retrieval",
    "source_unigram_divergence",
    "disjunctive_predicate_revenue",
    "events_rolling_engagement",
    "events_hourly_anomaly",
    "cms_heavy_hitters",
    "referential_integrity_audit",
    "revenue_trend_slope",
    "events_time_weighted_value",
    "revenue_decline_streaks",
    "bloom_semijoin_stats",
]


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    assert not missing, f"priority list references unknown queries: {missing}"
    tail = [n for n in REGISTRY if n not in _PRIORITY]
    ordered = {n: REGISTRY[n] for n in [*_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()
