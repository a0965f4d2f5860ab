#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query wall time excludes Spark session startup (BASELINE.md bench
posture).  Also times the reference-parity Walmart ETL end-to-end on the
reference's own bundled data for a like-for-like comparison with the
measured pandas baseline (0.623 s end-to-end).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REFERENCE_DIR = "/root/reference"

# Calibration trust gate (VERDICT r11 item 2, r12 item 7): the official
# BENCH artifact must never be a loaded run.  A start calibration above
# this threshold (~0.33 s on a quiet box; BENCH_r11's 0.555 s was an
# ambient-load wave) triggers bounded auto-retry — wait, re-calibrate,
# and only start the timed HEADLINE sweep once the machine is quiet.
# Quiet means BOTH the 32-way shuffle calibration AND the single-thread
# loop clear their gates (serial-path queries drift on a signal the
# parallel workload can't see), and the stamped `calibration_trusted`
# additionally requires the END calibration pair to clear the same gates
# — the flag covers the whole measurement window, not just its first
# instant.  If the box never goes quiet within the retry budget the
# sweep still runs (an artifact marked untrusted beats no artifact), but
# "calibration_trusted": false is stamped into BOTH the stdout line and
# the sidecar so no reader can mistake the walls for a quiet measurement.
CAL_GATE_SEC = float(os.environ.get("SPARK_GRAFT_CAL_GATE", "0.33"))
# Single-thread gate (VERDICT r12 item 7): the 32-way shuffle calibration
# measures aggregate throughput, but serial-path queries (presentation
# sorts, driver-side materialization, the ETL e2e) drift on single-core
# speed, which the parallel gate doesn't watch — r12's gate history shows
# an attempt passing the parallel gate while the box was still busy on the
# serial signal.  Quiet-box single-thread calibration is ~0.27-0.31 s;
# 0.40 gives headroom without admitting a genuinely loaded wave.
CAL_ST_GATE_SEC = float(os.environ.get("SPARK_GRAFT_CAL_ST_GATE", "0.40"))
CAL_GATE_ATTEMPTS = int(os.environ.get("SPARK_GRAFT_CAL_ATTEMPTS", "8"))
CAL_GATE_SLEEP_SEC = float(os.environ.get("SPARK_GRAFT_CAL_SLEEP", "45"))
# END calibration sample count (VERDICT r13 item 3): two r13 runs missed
# the trusted stamp by 1-3 ms on the END parallel calibration under light
# ambient waves while the single-thread signal stayed quiet.  The start
# gate can retry-until-quiet; the end gate cannot (re-running later would
# say nothing about the window that just closed), so its one shot takes
# MORE samples instead: min-of-5.  A 1-2 s transient blip is unlikely to
# straddle all five ~0.3 s runs, while a sustained load still fails every
# one — the gate VALUE is unchanged, only the sample count grows.
END_CAL_RUNS = int(os.environ.get("SPARK_GRAFT_END_CAL_RUNS", "5"))


# Interleaved host probes (VERDICT r14 item 1): the two-ended gate
# samples host health only at the endpoints of a ~40-minute sweep, so a
# co-tenant wave arriving mid-run was stamped trusted in r14 while
# common queries ran 1.68x r13 (judge-verified: dedup_canonical_keep
# [25.2, 19.2, 10.2] s in-bench vs 2.58 s idle).  The fix is sampling,
# not a new threshold: a probe runs between every PROBE_EVERY_N headline
# queries, each query's wall is trusted only when BOTH probes bracketing
# its segment cleared the gates, and the run-level flag now requires the
# whole probe sequence quiet — a mid-sweep wave can no longer hide
# behind quiet endpoints.  Each probe takes BOTH calibration signals
# with the SAME two gate values the endpoints use: the first dual-gated
# r15 run proved the single-thread loop alone under-responds to
# parallel-throughput waves (probe mins 0.288 -> 0.334/0.356 — inside
# the 0.40 st gate — while 32-thread queries in that segment inflated
# 3-6x with byte-identical shuffle; the parallel signal read over its
# 0.33 gate at that moment and would have flagged the segment).
PROBE_EVERY_N = int(os.environ.get("SPARK_GRAFT_PROBE_EVERY", "10"))
# min-of-5 per probe signal — the SAME sample count and the SAME argument
# as the END calibration (r13 item 3): a probe, like the end gate, cannot
# retry-until-quiet (re-probing later says nothing about the segment that
# just closed), so its one shot takes MORE samples instead.  The history:
# min-of-2 over-refused (second r15 run: 10/14 probes failed while the
# min-of-5 endpoints passed and every wall matched the judge's idle
# re-timings); min-of-3 still over-refused on a host whose quiet parallel
# floor now TOUCHES the 0.33 gate (fifth run: probe mins 0.328-0.452 with
# the single-thread signal quiet at 0.21-0.25 and BOTH min-of-5 endpoints
# trusted — a sample-count artifact, not a wave).  Gate values unchanged;
# a sustained load still fails all five samples.
PROBE_RUNS = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "5"))
# Dual-signal RELATIVE parallel band (VERDICT r15 item 2 — judge
# sign-off granted, with conditions).  The r15 absolute-parallel-floor
# policy over-refused: 136/137 walls stamped untrusted by interior
# parallel probes reading 0.31-0.57 against the fixed 0.33 gate, on a
# run whose walls matched the judge's idle re-timings — the absolute
# floor conflates a few-percent ambient drift with r14-style 4x waves.
# Per-probe trust is now:
#   - single-thread min vs the ABSOLUTE st gate (value unchanged since
#     r12 — it caught real serial waves), AND
#   - parallel min vs a RELATIVE band anchored to the run's own TRUSTED
#     start calibration: par_min <= max(CAL_GATE_SEC, 1.3 * anchor).
# The max() floor means the policy is never STRICTER than the old
# absolute rule (the change reduces over-refusal, never adds it); when
# the start calibration never went quiet the anchor is unreliable and
# the parallel signal falls back to the absolute gate — conservative.
# Sign-off conditions honored: both raw signals stay in the sidecar
# (par_runs/st_runs per probe, unchanged), the refusal history is
# preserved (trusted_abs records the old verdict next to trusted), and
# tests/test_bench_gate.py shows an r14-shape wave is still refused.
PROBE_PAR_REL_BAND = float(os.environ.get("SPARK_GRAFT_PROBE_REL_BAND", "1.3"))
# Scan-path gate (VERDICT r17 item 4 — turned ON this round, one round of
# quiet-floor data after the signal landed recorded-only in r17).  The
# r17 diagnosis (SCALE.md §37): a host phase can degrade the parquet
# scan/scheduling path 1.5-3x while BOTH synthetic calibrations read
# quiet, so byte-identical queries inflate invisibly.  Quiet floor from
# the four committed r17 sf0.1 sidecars: probe scan_min 0.086-0.196 s,
# start-calibration scan min 0.185-0.233 s (the first scan run is cold at
# ~1.2-1.5 s; min-of-3 absorbs it).  0.30 sits above every quiet sample
# with ~1.5x headroom over the typical 0.10-0.13 probe floor while
# refusing the documented 2-3x degraded phase.  NOTE the gate VALUE is
# derived from the DEFAULT sf0.1 bench dir — a run against a different
# SF dir must override SPARK_GRAFT_SCAN_GATE (the scan workload scales
# with the documents table), else the relative band anchored to that
# run's own start scan is the only meaningful signal.
SCAN_GATE_SEC = float(os.environ.get("SPARK_GRAFT_SCAN_GATE", "0.30"))
# Same relative-band method as the parallel gate (r15): the live
# threshold is max(absolute gate, band * this run's trusted start scan),
# so the policy is never stricter than the absolute rule and a box whose
# quiet scan floor drifts up a few percent isn't blanket-refused.  1.5
# (vs the parallel 1.3) because the scan signal's quiet min-of-3 spread
# is wider (0.086-0.196 = 2.3x across sweeps vs ~1.2x for par).
SCAN_REL_BAND = float(os.environ.get("SPARK_GRAFT_SCAN_REL_BAND", "1.5"))


def scan_band_sec(
    anchor: float,
    anchor_trusted: bool,
    gate: float = SCAN_GATE_SEC,
    band: float = SCAN_REL_BAND,
) -> float:
    """The scan-signal trust threshold for this run's probes and end
    calibration: ``max(gate, band * anchor)`` when the start scan
    calibration itself cleared the absolute gate, else the absolute
    ``gate`` (an untrusted anchor says nothing about the quiet floor —
    falling back to absolute is conservative, the same fallback the
    parallel band uses).  Pure for tests/test_bench_gate.py."""
    if not anchor_trusted:
        return gate
    return max(gate, band * anchor)


def probe_verdict(
    par_min: float,
    st_min: float,
    scan_min: float,
    par_band: float,
    scan_band: float,
    st_gate: float = CAL_ST_GATE_SEC,
) -> bool:
    """TRIPLE-signal probe trust (r18): 32-way shuffle throughput vs the
    relative parallel band, single-core speed vs the absolute st gate,
    AND the parquet scan path vs the relative scan band.  Any one signal
    over its threshold refuses the probe — each watches a host resource
    the other two have been measured blind to (SCALE.md §§11, 37).
    Refusal behavior is unchanged from the dual-signal policy: a refused
    probe untrusts its bracketing segments' walls, and the per-segment
    retry re-measures them in the next quiet window.  Pure for
    tests/test_bench_gate.py."""
    return par_min <= par_band and st_min <= st_gate and scan_min <= scan_band


def par_band_sec(
    anchor: float,
    start_trusted: bool,
    gate: float = CAL_GATE_SEC,
    band: float = PROBE_PAR_REL_BAND,
) -> float:
    """The parallel-signal trust threshold for this run's probes and end
    calibration: ``max(gate, band * anchor)`` when the start calibration
    went quiet (``anchor`` = its min), else the absolute ``gate``.  Pure
    so the band arithmetic is unit-testable (tests/test_bench_gate.py)."""
    if not start_trusted:
        return gate
    return max(gate, band * anchor)


def per_query_trusted(
    names: list[str],
    probe_trusted: list[bool],
    every_n: int = PROBE_EVERY_N,
) -> dict[str, bool]:
    """Per-query trust verdicts from the interleaved probe verdicts.

    ``probe_trusted[s]`` is the verdict of the probe taken just BEFORE
    the s-th segment of ``every_n`` queries (``probe_trusted[0]``
    precedes the sweep) and ``probe_trusted[s+1]`` just after it, so
    query p in segment ``p // every_n`` is trusted iff both its
    bracketing probes cleared the gates (each probe verdict is min-of-N
    parallel <= CAL_GATE_SEC AND min-of-N single-thread <=
    CAL_ST_GATE_SEC — the same two gate values the start/end
    calibrations use; only the sampling is finer).  Pure function so
    the trust logic is unit-testable without a loaded machine
    (tests/test_bench_gate.py)."""
    n_segments = max(1, -(-len(names) // every_n)) if names else 0
    assert len(probe_trusted) >= n_segments + 1 or not names, (
        f"{len(probe_trusted)} probes cannot bracket {n_segments} segments"
    )
    out: dict[str, bool] = {}
    for p, name in enumerate(names):
        s = p // every_n
        out[name] = bool(probe_trusted[s]) and bool(probe_trusted[s + 1])
    return out


def untrusted_segments(
    n_queries: int,
    probe_trusted: list[bool],
    every_n: int = PROBE_EVERY_N,
) -> list[int]:
    """Segment indices whose walls the interleaved probes REFUSED — a
    segment is untrusted unless BOTH its bracketing probes cleared the
    gates.  These are the segments the per-segment retry (VERDICT r16
    item 2) re-measures in the next quiet window.  Pure function so the
    retry targeting is unit-testable (tests/test_bench_gate.py)."""
    if not n_queries:
        return []
    n_segments = -(-n_queries // every_n)
    return [
        s
        for s in range(n_segments)
        if not (probe_trusted[s] and probe_trusted[s + 1])
    ]


def retry_spliceable(probe_pre: dict | None, probe_post: dict | None) -> bool:
    """A retried segment's walls may be spliced into the sidecar's
    trusted set iff BOTH retry probes bracketing it cleared the gates —
    the identical trust criterion the first-pass walls face, so a
    spliced wall carries exactly the same evidence as a first-pass
    trusted wall.  Pure for unit testing."""
    return bool(
        probe_pre
        and probe_pre.get("trusted")
        and probe_post
        and probe_post.get("trusted")
    )


def apply_segment_splice(
    timings: dict,
    all_runs: dict,
    runtime: dict,
    query_trusted: dict,
    walls: dict,
    rruns: dict,
    rmetrics: dict,
    loadavgs: dict | None = None,
    rloads: dict | None = None,
) -> list[str]:
    """Splice a trusted retry's walls into the sidecar maps in place:
    each retried query's wall/runs/metrics replace the refused
    first-pass values and its trust verdict flips to True.  When the
    caller passes the loadavg maps, each spliced query's recorded
    loadavg is replaced by its RETRY-time sample too (r17 ADVICE: a
    spliced wall paired with its first-pass loadavg mispairs the wave
    context with the quiet-window measurement).  Returns the spliced
    names.  Pure bookkeeping, unit-tested in tests/test_bench_gate.py;
    callers gate it on retry_spliceable."""
    spliced = []
    for name, w in walls.items():
        timings[name] = w
        all_runs[name] = rruns[name]
        if name in rmetrics:
            runtime[name] = rmetrics[name]
        if loadavgs is not None and rloads is not None and name in rloads:
            loadavgs[name] = rloads[name]
        query_trusted[name] = True
        spliced.append(name)
    return spliced


def end_calibration_trusted(
    cal_end_runs: list[float],
    st_end_runs: list[float],
    gate: float = CAL_GATE_SEC,
    st_gate: float = CAL_ST_GATE_SEC,
) -> bool:
    """END-of-sweep trust verdict: min of each calibration's runs must
    clear the same gates the start used — min-of-N, never mean, so one
    quiet sample among transient-wave samples is enough (the repo's
    standing measurement rule), and a sustained load fails all N."""
    return min(cal_end_runs) <= gate and min(st_end_runs) <= st_gate


def wait_for_quiet_machine(
    calibrate,
    gate: float = CAL_GATE_SEC,
    attempts: int = CAL_GATE_ATTEMPTS,
    sleep_sec: float = CAL_GATE_SLEEP_SEC,
    sleep=time.sleep,
    st_gate: float | None = None,
):
    """Re-run ``calibrate`` until its best run clears ``gate``, sleeping
    ``sleep_sec`` between attempts, at most ``attempts`` times.

    ``calibrate`` returns either a list of wall seconds (parallel
    calibration only) or a ``(parallel_runs, single_thread_runs)`` tuple;
    in the tuple form the attempt is quiet only when BOTH ``min(parallel)
    <= gate`` AND ``min(single_thread) <= st_gate`` — serial-path queries
    drift on a signal the 32-way gate alone doesn't watch.  Returns
    ``(runs, trusted, history)`` where ``runs`` is the last calibration in
    the same shape ``calibrate`` produced, ``trusted`` says whether the
    gate was met, and ``history`` holds every attempt for the sidecar.
    Pure function of its inputs (injectable sleep) so the refusal path is
    unit-testable without a loaded machine."""
    history: list = []
    for i in range(max(1, attempts)):
        out = calibrate()
        history.append(out)
        par, st = out if isinstance(out, tuple) else (out, None)
        quiet = min(par) <= gate and (
            st is None or st_gate is None or min(st) <= st_gate
        )
        if quiet:
            return out, True, history
        if i < attempts - 1:
            sleep(sleep_sec)
    return history[-1], False, history

# Queries with a sketch_only= production tier (VERDICT r13 item 6): the
# default (headline) path carries an exact-truth branch for the oracle;
# sketch_only=True is the branch a production run keeps.  bench records
# both walls in bench_details.json (sketch_only_queries).
SKETCH_ONLY_TIER = [
    "histogram_quantile_sketch",
    "kmv_jaccard_langs",
    "kmv_set_difference",
    "mad_outlier_rate",
    "embedding_top_pc",
    # VERDICT r14 item 8: the two remaining exact-branch-dominated
    # queries — production keeps the counter matrix / the sketch-only
    # estimates; the exact truth exists for the oracle.
    "cms_heavy_hitters",
    "kmv_sketch_union",
]

# Headline set: one representative per operator family (scan+agg, star join,
# every-join-type, windows, sessionization, LSH dedup, vector LSH, text).
HEADLINE = [
    "pricing_summary",
    "scalar_means",
    "join_customer_orders",
    "regional_revenue",
    "join_left_outer",
    "window_topk_orders",
    "window_running_total",
    "top10_expensive_items",
    "distinct_counts",
    "rollup_customer_geo",
    "monthly_avg_value",
    "events_hourly_window",
    "events_sessionization",
    "events_session_window",
    "dedup_exact",
    "dedup_minhash_lsh",
    "substring_dup_coverage",
    "fuzzy_name_matches",
    "dup_graph_pagerank",
    "dedup_containment",
    "cms_heavy_hitters",
    "histogram_quantile_sketch",
    "kmv_jaccard_langs",
    "kmv_set_difference",
    "events_hourly_cms",
    "embedding_top_pc",
    "events_time_weighted_value",
    "revenue_decline_streaks",
    "bloom_semijoin_stats",
    "events_hourly_bloom_returns",
    "events_hourly_hll",
    "cms_selfjoin_size",
    "events_daily_hll_rollup",
    "events_sliding_hll",
    "cms_join_size_estimate",
    "events_hourly_value_quantiles",
    "rrf_hybrid_retrieval",
    "referential_integrity_audit",
    "revenue_trend_slope",
    "similarity_pairs_blocked",
    "similarity_topk",
    "text_quality_buckets",
    "doc_fingerprint",
    "text_bpe_tokens",
    "profile_documents",
    "similarity_topk_ivf",
    "retrieve_rerank_topk",
    "promo_revenue_share",
    "top_supplier_revenue",
    "grouped_zscore_histogram",
    "asof_join_latest_order",
    "range_join_close_events",
    "window_frames_suite",
    "market_share_by_year",
    "text_repetition",
    "pack_context_segments",
    "decontaminate_corpus",
    "dedup_canonical_keep",
    "mixture_sampling_plan",
    "quantize_embeddings",
    "local_supplier_volume",
    "vocab_top_ngrams",
    "customer_order_histogram",
    "time_series_gap_fill",
    "cdc_chunk_stats",
    # round 6 additions (queries/curation.py)
    "bm25_doc_retrieval",
    "source_unigram_divergence",
    "events_hourly_anomaly",
    "events_rolling_engagement",
    "disjunctive_predicate_revenue",
    # round 7 additions (queries/curation.py, relational3.py)
    "common_shingle_fraction",
    "vocab_oov_rate",
    "prefix_dup_groups",
    "dormant_customer_balance",
    # round 8 additions (queries/clusters.py, curation.py)
    "dedup_cluster_density",
    "text_token_entropy",
    "doc_unigram_logprob",
    "kmv_distinct_sketch",
    # round 8 TPC-H completions (queries/relational5.py)
    "bilateral_trade_volume",
    "product_profit_by_nation_year",
    "returned_item_customers",
    "priority_shipping_split",
    "brand_supplier_counts",
    "order_priority_checking",
    "important_supplier_share",
    "small_quantity_order_revenue",
    "excess_shipping_suppliers",
    # late round 8 additions (queries/analysis.py)
    "kmv_sketch_union",
    "sliding_chunk_windows",
    "bigram_pmi",
    "dup_graph_degree_hist",
    "winsorized_price_stats",
    "ngram_distribution_profile",
    "cross_source_dup_matrix",
    "scd2_user_state_history",
    "state_as_of_label_time",
    # round 9/10 additions (queries/corpus.py, similarity.py, events.py):
    # the WARC wire-format round trip, its incremental per-day rollup
    # twin, the label-centroid drift map, and the event inter-arrival
    # percentile profile
    "warc_roundtrip_curation",
    "warc_curation_by_day",
    "label_centroid_similarity",
    "event_interarrival_profile",
    # round 11 additions (queries/clusters.py, lakehouse.py, analysis.py,
    # events.py): the star-path duplicate-cluster size distribution, the
    # MERGE-upsert round trip (scratch copy is write-once, so min-of-3
    # measures merge+read, not base seeding), the two-pass MAD outlier
    # profile, and the sweep-line session-concurrency profile
    "dup_cluster_size_dist_star",
    "merge_upsert_orders",
    "mad_outlier_rate",
    "concurrent_sessions_profile",
    # round 11 (queries/text.py): the PII-redaction scrub stage
    "pii_redaction_stats",
    # round 11 (queries/curation.py): the HLL register-array twin of the
    # KMV sketch, over the identical portable-hash shingle stream
    "hll_distinct_sketch",
    # round 11 (queries/profiling.py): deterministic weight-proportional
    # sampling (Efraimidis-Spirakis A-ES over the portable hash)
    "weighted_sample_aes",
    # round 14 wave 2: exact penny-allocation attribution, Theil-Sen
    # robust trend, sparse inverted-index ANN, sketch-merged HLL cube
    # margins, and the linear 2-D skyline
    "multi_touch_attribution",
    "revenue_theilsen_slope",
    "similarity_inverted_index",
    "cube_distinct_hll",
    "pareto_frontier_parts",
    # round 14 wave 3: Poisson-bootstrap CI bands and retraction-stream
    # incremental view maintenance
    "bootstrap_ci_revenue",
    "incremental_rollup_maintenance",
    "jaccard_prefix_filter",
    # round 14 wave 4: Cramer-solved seasonal regression and the
    # one-pass Pearson correlation matrix
    "revenue_seasonality_regression",
    "corr_matrix_lineitem",
    # round 15: the streaming-KMV batch readout (fifth sketch family),
    # the Misra-Gries deterministic heavy-hitter summary, and the
    # signed Count-Sketch pair (unbiased frequency + AMS F2)
    "events_hourly_kmv",
    "mg_heavy_hitters",
    "countsketch_user_freq",
    "countsketch_f2",
    # round 15: dyadic-exact landmark-decay engagement counter
    "time_decayed_engagement",
    # round 15 wave 2: the forward-decay (streaming-maintainable) readout,
    # the signed AMS two-relation join-size estimator, DLT priority
    # sampling with its HT subset-sum estimator, and the Benford screen
    "events_forward_decay",
    "countsketch_join_size",
    "priority_sample_subsetsum",
    "benford_digit_profile",
    # round 15 wave 3: the zone-decomposed exact Gini/Lorenz profile and
    # the Kaplan-Meier time-to-conversion curve
    "revenue_gini_lorenz",
    "survival_time_to_purchase",
    # round 15 wave 4: market-basket lift, the BIGINT-exact CUSUM
    # changepoint scan, and the Mann-Whitney ROC-AUC
    "basket_association_rules",
    "revenue_cusum_changepoint",
    "quality_score_auc",
    # round 15 wave 5: Chao1/Good-Turing vocabulary coverage and the
    # exact-integer Box-Jenkins ACF profile
    "vocab_coverage_estimators",
    "revenue_autocorrelation",
    # round 15 wave 6: classical seasonal decomposition and the HHI
    # concentration screen
    "revenue_seasonal_decomposition",
    "market_concentration_hhi",
    # round 15 wave 7: deterministic negative sampling for training pairs
    "training_negative_samples",
    # round 16: per-cohort KM + log-rank, the Zipf/Heaps corpus-profiling
    # pair, the sixth streaming family's batch readout, and the
    # Mann-Kendall trend test
    "survival_km_logrank",
    "zipf_slope_fit",
    "heaps_law_fit",
    "events_hourly_mg",
    "revenue_mann_kendall",
    "source_token_diversity",
    "survival_logrank_stratified",
    # round 17: the exact-ECDF Kolmogorov-Smirnov one-vs-rest drift
    # screen and the two-proportion A/B z-test with Wilson intervals
    "source_ks_drift",
    "conversion_ab_ztest",
    # round 17: the seventh streaming family's batch readout (per-hour
    # A-ES weighted sample) and the chi-squared independence screen
    "events_hourly_sample_aes",
    "event_dow_independence",
    # round 17: the binned PSI drift screen beside the exact-ECDF KS
    "source_psi_drift",
    # round 18: the cluster-keyed split (leakage-free 80/10/10) and the
    # inverse-cluster-size training weights — both ride the shared
    # exact-Jaccard pair generator + components composition
    "cluster_aware_split",
    "cluster_sampling_weights",
    # round 18: the perplexity-proxy LM quality filter and the
    # rank-correlation (Spearman) member of the correlation family
    "bigram_lm_quality",
    "spearman_rank_corr",
    # round 18: per-doc n-gram novelty under ingestion order
    "ngram_novelty_rate",
    # round 18: k-sample rank test (Kruskal-Wallis) across sources
    "source_length_kruskal",
    # round 18: classifier-eval layer (per-class P/R/F1) over lang-id
    "lang_id_precision_recall",
    # round 18: the eighth streaming sketch family's batch readout
    "events_hourly_countsketch",
    # round 18: decile gains/lift ranking evaluation
    "score_lift_deciles",
    # round 18: Brown-Forsythe variance-homogeneity across sources
    "source_length_levene",
]


def main() -> None:
    from walmart_e_commerce_sales_data_pipeline_spark import queries as q
    from walmart_e_commerce_sales_data_pipeline_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the executor pool / codegen before the timed runs.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Machine-speed calibration: a fixed synthetic workload (pure compute +
    # one shuffle, no file I/O, identical every round) timed min-of-3.
    # Round-over-round wall-clock deltas on sub-second queries proved to be
    # dominated by ambient machine state (r7: +98 % on quantize_embeddings
    # with byte-identical shuffle/row metrics and zero code change) — this
    # number lets a reader normalize a round's walls before calling a
    # drift a regression.
    def _calibrate(n_runs: int = 3) -> list[float]:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            (
                spark.range(20_000_000)
                .selectExpr("id % 97 AS k", "id * 2654435761 % 1000003 AS v")
                .groupBy("k")
                .agg({"v": "avg"})
                .collect()
            )
            runs.append(round(time.perf_counter() - t0, 3))
        return runs

    # Single-thread calibration: the 32-way shuffle workload above measures
    # aggregate throughput, but serial critical paths (final presentation
    # sorts, driver-side Row materialization, single-partition result
    # stages) track single-core speed instead — the two can drift
    # independently across this shared box's host generations (r10→r11
    # diagnosis: scd2_user_state_history walls moved ±40 % with identical
    # plans/bytes/rows while the parallel calibration said "quiet").
    # Recording both lets a reader attribute a wall delta to the right
    # resource mechanically.
    def _calibrate_single_thread(n_runs: int = 3) -> list[float]:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            acc = 0
            for i in range(5_000_000):
                acc += i * i
            runs.append(round(time.perf_counter() - t0, 3))
        return runs

    # Scan-path calibration (round 17, RECORDED ONLY — no gate): the r17
    # session proved a third independent host resource the two synthetic
    # signals cannot see.  A run whose parallel/single-thread
    # calibrations matched the r16 sidecar (0.306/0.224 vs 0.293/0.232)
    # still produced walls 1.2-3x on byte-identical plans, and
    # quiet-GATED idle re-timings reproduced ~1.5x — the degradation
    # lives in the parquet scan/scheduling path (file I/O, page cache,
    # memory bandwidth), which spark.range() compute never touches.
    # This signal times a fixed parquet aggregate over the bench's own
    # SF dir, min-of-N, recorded at the start/end, in every probe, and
    # in every retry probe — evidence for an informed r18 gate proposal,
    # deliberately NOT gating anything this round (the r15 band saga
    # showed unanchored gates over-refuse before their floor is known).
    def _calibrate_scan(n_runs: int = 3) -> list[float]:
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            (
                spark.read.parquet(f"{SF_DIR}/documents.parquet")
                .selectExpr("sum(n_chars)", "count(*)")
                .collect()
            )
            runs.append(round(time.perf_counter() - t0, 3))
        return runs

    # Both calibrations gate the start (VERDICT r12 item 7): an attempt is
    # quiet only if the 32-way shuffle AND the single-thread loop clear
    # their thresholds, so serial-path queries aren't measured under a
    # load wave the parallel signal can't see.
    (cal_runs, cal_st_runs), cal_start_trusted, cal_history = wait_for_quiet_machine(
        lambda: (_calibrate(), _calibrate_single_thread()),
        st_gate=CAL_ST_GATE_SEC,
    )
    calibration = min(cal_runs)
    calibration_st = min(cal_st_runs)
    cal_scan_runs = _calibrate_scan()
    # Parallel trust threshold for the interior probes and the end
    # calibration (VERDICT r15 item 2): relative band anchored to this
    # run's trusted start calibration, floored by the absolute gate.
    probe_band = round(par_band_sec(calibration, cal_start_trusted), 3)
    # Scan-path trust threshold (VERDICT r17 item 4 — GATING as of r18):
    # anchored to this run's start scan min when that itself cleared the
    # absolute scan gate; absolute-gate fallback otherwise.  The start
    # scan is NOT retry-waited (the par/st quiet-wait already ran; a
    # degraded scan phase is exactly what must be stamped, not waited
    # out, since r17 showed it persisting for whole sweeps).
    scan_anchor = min(cal_scan_runs)
    scan_start_trusted = scan_anchor <= SCAN_GATE_SEC
    scan_band = round(scan_band_sec(scan_anchor, scan_start_trusted), 3)

    # min of 3 runs per query: the first run of anything pays one-time JVM
    # class-loading/codegen costs that say nothing about steady-state
    # throughput at scale, and recording all three runs in the sidecar
    # makes round-over-round deltas distinguishable from run-to-run noise
    # (the r3→r6 headline ambiguity was exactly this).
    from walmart_e_commerce_sales_data_pipeline_spark.plans import (
        execution_count,
        metrics_since,
    )

    def _loadavg() -> float:
        # 1-minute load average at measurement time: ambient co-tenant
        # waves on this box inflate consecutive bench positions 1.4-2x
        # (r7/r8 diagnosis); recording the load NEXT TO each wall makes
        # wave attribution mechanical instead of forensic.
        try:
            with open("/proc/loadavg") as f:
                return float(f.read().split()[0])
        except OSError:
            return -1.0

    N_RUNS = 3
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    runtime: dict[str, dict[str, int]] = {}
    all_runs: dict[str, list[float]] = {}
    loadavgs: dict[str, float] = {}
    # Interleaved probes (VERDICT r14 item 1): one dual-signal probe
    # before each PROBE_EVERY_N-query segment and one after the last, so
    # every query wall is bracketed by two host-health samples on BOTH
    # resources (32-way shuffle throughput AND single-core speed — the
    # two drift independently on this box, and the first r15 run showed
    # a parallel-side wave the serial loop alone under-responds to).
    probes: list[dict] = []

    def _probe(at_query: int) -> None:
        # One UNTIMED settle run absorbs the bench's own residue before
        # the timed samples: a probe fires seconds after a 32-thread
        # query burst (JVM GC, task teardown, governor ramp), and the
        # third gated r15 run showed that residue inflating the parallel
        # signal past the gate on an IDLE box (probe at query 0: min-of-3
        # 0.374 at loadavg 0.42, minutes after the start calibration
        # passed at 0.279) — 123/133 walls stamped untrusted while the
        # per-query times matched r13.  The endpoints effectively get
        # this settle for free (the start gate retries until quiet; the
        # end gate follows its own first sample with min-of-5).  Gate
        # VALUES unchanged; the settle run is recorded for transparency
        # and excluded from the trust min.
        settle = _calibrate(1)[0]
        par = _calibrate(PROBE_RUNS)
        st = _calibrate_single_thread(PROBE_RUNS)
        scan = _calibrate_scan()
        probes.append(
            {
                "at_query": at_query,
                "settle_run": settle,
                "par_runs": par,
                "par_min": min(par),
                "st_runs": st,
                "st_min": min(st),
                "scan_runs": scan,
                "scan_min": min(scan),
                "loadavg_1m": _loadavg(),
                # triple-signal relative policy (r15 par band + r18 scan
                # band; st absolute throughout)
                "par_band_sec": probe_band,
                "scan_band_sec": scan_band,
                "scan_trusted": min(scan) <= scan_band,
                "trusted": probe_verdict(
                    min(par), min(st), min(scan), probe_band, scan_band
                ),
                # refusal history preserved (sign-off condition): the
                # pre-r16 absolute verdict and the pre-r18 dual-signal
                # verdict recorded beside the live one
                "trusted_abs": min(par) <= CAL_GATE_SEC
                and min(st) <= CAL_ST_GATE_SEC,
                "trusted_dual": min(par) <= probe_band
                and min(st) <= CAL_ST_GATE_SEC,
            }
        )

    for idx, name in enumerate(HEADLINE):
        if idx % PROBE_EVERY_N == 0:
            _probe(idx)
        fn = q.REGISTRY[name].fn
        loadavgs[name] = _loadavg()
        runs: list[float] = []
        try:
            for _ in range(N_RUNS):
                # cache-cold per run: operators that persist intermediates
                # (dedup LSH) must not let run 2 reuse run 1's cached state,
                # and no query may inherit another's cache
                spark.catalog.clearCache()
                mark = execution_count(spark)
                t0 = time.perf_counter()
                rows = fn(spark, SF_DIR).collect()
                runs.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # noqa: BLE001 — isolation: one broken
            # query must not zero out the whole round's bench evidence
            # (round 5 lost 41 of 42 measurements to one AnalysisException).
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        timings[name] = min(runs)
        all_runs[name] = runs
        # shuffle/spill volume of the last run: wall-clock can stay flat at
        # sf0.1 while shuffle volume doubles — the 100 TB regression signal.
        # Result cardinality rides along so round-over-round result drift
        # (a correctness smell the wall clock can't see) is visible too.
        runtime[name] = {**metrics_since(spark, mark), "rows": len(rows)}

    _probe(len(HEADLINE))  # closing bracket for the final segment
    query_trusted = per_query_trusted(
        list(HEADLINE), [p["trusted"] for p in probes]
    )
    all_probes_trusted = all(p["trusted"] for p in probes)
    # First-pass state preserved verbatim (the honesty condition on the
    # retry design): the spliced sidecar must still show what the
    # original sweep measured and refused.
    first_pass_queries = dict(timings)
    first_pass_runs = {n: list(r) for n, r in all_runs.items()}
    query_trusted_first_pass = dict(query_trusted)

    # Per-segment retry (VERDICT r16 item 2): a refused probe poisons a
    # whole ~PROBE_EVERY_N-query segment, and on this genuinely noisy box
    # entire sweeps have come back 1/144 trusted while the judge's idle
    # re-timings matched every wall.  Instead of re-running the full
    # sweep (another 20+ minutes of exposure to the same waves), each
    # refused segment is re-measured alone in the next quiet window:
    # wait for BOTH calibration signals to go quiet, bracket the ~10
    # re-timed queries with two fresh dual-signal probes, and splice the
    # walls in ONLY when both probes cleared — the identical trust
    # criterion first-pass walls face (retry_spliceable).  Both raw
    # sweeps stay in the sidecar (first_pass_queries / segment_retries).
    SEG_RETRY_WAIT_ATTEMPTS = int(
        os.environ.get("SPARK_GRAFT_SEG_RETRY_ATTEMPTS", "3")
    )
    # Default budget sized so a driver-invoked bench stays well under any
    # plausible harness timeout (typ. sweep ~4 min + probes; 600 s of
    # retries covers 4-6 segments).  Local deep runs raise it via env.
    SEG_RETRY_BUDGET_SEC = float(
        os.environ.get("SPARK_GRAFT_SEG_RETRY_BUDGET", "600")
    )

    def _retry_segment(s: int, retry_pass: int) -> bool:
        """Re-measure one refused segment; returns True iff its walls
        were spliced (both fresh bracketing probes trusted)."""
        seg_names = [
            n
            for n in HEADLINE[s * PROBE_EVERY_N : (s + 1) * PROBE_EVERY_N]
            if n not in errors
        ]
        if not seg_names:
            return True
        (rcal, _rst), rquiet, rhist = wait_for_quiet_machine(
            lambda: (_calibrate(), _calibrate_single_thread()),
            attempts=SEG_RETRY_WAIT_ATTEMPTS,
            st_gate=CAL_ST_GATE_SEC,
        )
        if not rquiet:
            segment_retries.append(
                {
                    "segment": s,
                    "pass": retry_pass,
                    "quiet_wait_trusted": False,
                    "wait_history": rhist,
                }
            )
            return False
        # the retry window anchors its own relative band — the ORIGINAL
        # start calibration says nothing about machine state this many
        # minutes later
        rband = round(par_band_sec(min(rcal), True), 3)

        def _retry_probe() -> dict:
            settle = _calibrate(1)[0]
            par = _calibrate(PROBE_RUNS)
            st = _calibrate_single_thread(PROBE_RUNS)
            scan = _calibrate_scan()
            return {
                "settle_run": settle,
                "par_runs": par,
                "par_min": min(par),
                "st_runs": st,
                "st_min": min(st),
                "scan_runs": scan,
                "scan_min": min(scan),
                "loadavg_1m": _loadavg(),
                "par_band_sec": rband,
                # scan band stays anchored to the RUN's start scan (the
                # retry quiet-wait re-anchors only the par band): the r18
                # gate exists to refuse a drifted scan phase, so the
                # retry must not re-baseline to it
                "scan_band_sec": scan_band,
                "scan_trusted": min(scan) <= scan_band,
                "trusted": probe_verdict(
                    min(par), min(st), min(scan), rband, scan_band
                ),
            }

        pre = _retry_probe()
        walls: dict[str, float] = {}
        rruns: dict[str, list[float]] = {}
        rmetrics: dict[str, dict] = {}
        rloads: dict[str, float] = {}
        post = None
        if pre["trusted"]:
            for name in seg_names:
                fn = q.REGISTRY[name].fn
                rloads[name] = _loadavg()
                runs = []
                try:
                    for _ in range(N_RUNS):
                        spark.catalog.clearCache()
                        mark = execution_count(spark)
                        t0 = time.perf_counter()
                        rows = fn(spark, SF_DIR).collect()
                        runs.append(round(time.perf_counter() - t0, 3))
                except Exception as exc:  # noqa: BLE001
                    errors[f"{name}[retry]"] = f"{type(exc).__name__}: {exc}"[:300]
                    continue
                walls[name] = min(runs)
                rruns[name] = runs
                rmetrics[name] = {**metrics_since(spark, mark), "rows": len(rows)}
            post = _retry_probe()
        ok = retry_spliceable(pre, post)
        segment_retries.append(
            {
                "segment": s,
                "pass": retry_pass,
                "queries": seg_names,
                "quiet_wait_trusted": rquiet,
                "retry_par_band_sec": rband,
                "probe_pre": pre,
                "probe_post": post,
                "walls": walls,
                "runs": rruns,
                # retry-time loadavg per re-measured query (r17 ADVICE):
                # recorded here verbatim AND spliced into the main
                # loadavg map so sidecar readers never pair a spliced
                # wall with its first-pass wave context
                "loadavgs": rloads,
                "spliced": bool(ok and walls),
            }
        )
        if ok:
            spliced_via_retry.extend(
                apply_segment_splice(
                    timings, all_runs, runtime, query_trusted,
                    walls, rruns, rmetrics, loadavgs, rloads,
                )
            )
        return bool(ok)

    segment_retries: list[dict] = []
    spliced_via_retry: list[str] = []
    retry_deadline = time.monotonic() + SEG_RETRY_BUDGET_SEC
    # Up to two passes: a wave that refuses a segment's FIRST retry
    # (pre/post probe failed, or quiet-wait never cleared) usually
    # passes within minutes on this box — a second pass over the
    # still-refused segments inside the same budget recovers them
    # without re-running anything already trusted.
    pending = untrusted_segments(len(HEADLINE), [p["trusted"] for p in probes])
    if pending and not cal_start_trusted:
        # the box never went quiet for the START gate after 8 waits —
        # per-segment quiet-waits will spin against the same load;
        # record the skip instead of burning the budget
        segment_retries.append(
            {"skipped": "start-calibration-never-quiet", "segments": pending}
        )
        pending = []
    for retry_pass in range(2):
        if not pending:
            break
        still_refused: list[int] = []
        for s in pending:
            if time.monotonic() > retry_deadline:
                segment_retries.append(
                    {"segment": s, "pass": retry_pass, "skipped": "budget"}
                )
                continue
            if _retry_segment(s, retry_pass):
                continue
            still_refused.append(s)
        pending = still_refused
    untrusted_queries = sorted(
        n for n, ok in query_trusted.items() if not ok and n in timings
    )

    # Production-tier twin measurements (VERDICT r13 item 6): four of the
    # five slowest headline queries spend most of their wall on the exact-
    # truth branch they deliberately carry for the oracle.  Each exposes a
    # sketch_only= escape hatch (default off — the headline number above is
    # unchanged); this second sweep records the production-path walls so
    # bench_details.json reports BOTH tiers.  Measurement, not a behavior
    # change: nothing here feeds `total`.
    sketch_only_timings: dict[str, float] = {}
    sketch_only_runs: dict[str, list[float]] = {}
    for name in SKETCH_ONLY_TIER:
        fn = q.REGISTRY[name].fn
        runs = []
        try:
            for _ in range(N_RUNS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, SF_DIR, sketch_only=True).collect()
                runs.append(round(time.perf_counter() - t0, 3))
        except Exception as exc:  # noqa: BLE001
            errors[f"{name}[sketch_only]"] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        sketch_only_timings[name] = min(runs)
        sketch_only_runs[name] = runs

    # Shared-scan tier for the dup-cluster trio (VERDICT r15 item 8 —
    # measurement only): dup_cluster_size_dist_star, dedup_canonical_keep
    # and dup_graph_pagerank each rebuild the same exact-Jaccard pair
    # table in their headline walls.  A production pipeline materializes
    # the pair table once and runs all three consumers against it; this
    # sweep records that cost split — one pair build (persisted +
    # counted) and each consumer's wall on the cached pairs.  Nothing
    # here feeds `total`; the headline walls above are unchanged.
    SHARED_SCAN_TRIO = [
        "dup_cluster_size_dist_star",
        "dedup_canonical_keep",
        "dup_graph_pagerank",
    ]
    shared_scan: dict[str, object] = {}
    shared_pairs = None
    try:
        from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
            jaccard_pairs_from_docs,
        )
        from walmart_e_commerce_sales_data_pipeline_spark.queries.dedup import (
            JACCARD_THRESHOLD,
        )

        spark.catalog.clearCache()
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        t0 = time.perf_counter()
        shared_pairs = jaccard_pairs_from_docs(docs, JACCARD_THRESHOLD).persist()
        n_pairs = shared_pairs.count()
        shared_scan["pairs_build_sec"] = round(time.perf_counter() - t0, 3)
        shared_scan["n_pairs"] = n_pairs
        walls: dict[str, float] = {}
        for name in SHARED_SCAN_TRIO:
            fn = q.REGISTRY[name].fn
            runs = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn(spark, SF_DIR, pairs=shared_pairs).collect()
                runs.append(round(time.perf_counter() - t0, 3))
            walls[name] = min(runs)
        shared_scan["queries"] = walls
        shared_scan["trio_total_sec"] = round(
            shared_scan["pairs_build_sec"] + sum(walls.values()), 3
        )
    except Exception as exc:  # noqa: BLE001
        errors["shared_scan"] = f"{type(exc).__name__}: {exc}"[:300]
    finally:
        # a failed consumer must not leave the pair table pinned in
        # executor memory through the remaining timing tiers
        if shared_pairs is not None:
            shared_pairs.unpersist()

    # Reference-parity ETL on the reference's own bundled data (matches the
    # BASELINE.md measurement boundary: extract→transform→agg→load→validate).
    from walmart_e_commerce_sales_data_pipeline_spark.pipeline import main as etl_main

    try:
        loadavgs["walmart_etl_e2e"] = _loadavg()
        runs = []
        for _ in range(N_RUNS):
            with tempfile.TemporaryDirectory() as out:
                t0 = time.perf_counter()
                etl_main(
                    spark,
                    f"{REFERENCE_DIR}/grocery_sales.csv",
                    f"{REFERENCE_DIR}/extra_data.parquet",
                    output_dir=out,
                )
                runs.append(round(time.perf_counter() - t0, 3))
        timings["walmart_etl_e2e"] = min(runs)
        all_runs["walmart_etl_e2e"] = runs
    except Exception as exc:  # noqa: BLE001
        errors["walmart_etl_e2e"] = f"{type(exc).__name__}: {exc}"[:300]

    # IVF pruning win (bench-only: at nprobe < n_cells the result is
    # approximate, so it can't share the registered query's exact oracle —
    # this quantifies the ANN speedup the design claims in SCALE.md §7).
    # Same corpus/params as similarity_topk_ivf, probing 2 of 8 cells.
    from walmart_e_commerce_sales_data_pipeline_spark.operators.similarity import (
        ivf_topk,
        train_ivf_centroids,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.similarity import (
        TOPK_K,
        TOPK_QUERY_LIMIT,
        _IVF_CELLS,
    )
    from pyspark.sql import functions as F

    try:
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        qs = emb.filter(F.col("vec_id") < TOPK_QUERY_LIMIT)
        cents = train_ivf_centroids(emb, n_cells=_IVF_CELLS, sample=1024)
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            ivf_topk(emb, qs, cents, k=TOPK_K, nprobe=2).collect()
            best = min(best, time.perf_counter() - t0)
        # Scanned fraction from the cell histograms (exact candidate count /
        # the brute-force candidate count), without re-running the topk join.
        from walmart_e_commerce_sales_data_pipeline_spark.operators.similarity import (
            _with_cells,
        )

        cell_sizes = {
            r["cell"]: r["n"]
            for r in _with_cells(emb, cents, "vec_id", "embedding", "i", "v", 1)
            .groupBy("cell")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        probed = (
            _with_cells(qs, cents, "vec_id", "embedding", "i", "v", 2)
            .select("i", "cell")
            .collect()
        )
        n_corpus = emb.count()
        candidates = sum(cell_sizes.get(p["cell"], 0) for p in probed)
        ivf_pruned = {
            "sec": round(best, 3),
            "exact_sec": timings.get("similarity_topk_ivf"),
            "nprobe": 2,
            "n_cells": _IVF_CELLS,
            "scanned_frac": round(candidates / (len(set(p["i"] for p in probed)) * n_corpus), 3),
        }
    except Exception as exc:  # noqa: BLE001
        ivf_pruned = {"err": f"{type(exc).__name__}: {exc}"[:200]}

    # Second calibration AFTER the measurements: ambient waves that arrive
    # mid-run defeat a start-only calibration (measured: cal 0.32 at start,
    # 1-min load 13.8 mid-run) — the start/end pair bounds the machine
    # state the walls were actually taken under.  The END pair also gates
    # the stamped flag (ADVICE r12): `calibration_trusted` means the WHOLE
    # measurement window was bounded by quiet calibrations, not just the
    # start, so a load wave arriving mid-sweep can't hide behind the flag.
    # min-of-5 at the end (VERDICT r13 item 3): the end gate has no
    # retry loop, so it takes more samples in its one shot instead.
    cal_end_runs = _calibrate(END_CAL_RUNS)
    cal_st_end_runs = _calibrate_single_thread(END_CAL_RUNS)
    cal_scan_end_runs = _calibrate_scan(END_CAL_RUNS)
    # The end gate shares the probes' argument (no retry, one shot) so it
    # shares their parallel policy too: relative band, absolute st gate —
    # and, as of r18, the scan band (VERDICT r17 item 4): the end scan
    # min must sit inside the same run-anchored band the probes used.
    scan_end_trusted = min(cal_scan_end_runs) <= scan_band
    cal_end_trusted = (
        end_calibration_trusted(cal_end_runs, cal_st_end_runs, gate=probe_band)
        and scan_end_trusted
    )
    # The run-level flag now covers the INTERIOR of the window too
    # (VERDICT r14 item 1): endpoints quiet + every interleaved probe
    # quiet.  A partially-noisy run still names its clean queries via
    # query_trusted, so one bad segment no longer poisons — or hides
    # behind — the whole artifact.
    cal_trusted = (
        cal_start_trusted
        and scan_start_trusted
        and cal_end_trusted
        and all_probes_trusted
    )

    total = round(sum(timings.values()), 3)
    # Coverage marker: when a query errors it drops out of `total`, which
    # would otherwise read as a speedup vs rounds that measured more
    # queries.  n_measured makes cross-round totals comparable-or-visibly-
    # incomparable.
    n_measured = len(timings)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full-precision detail (per-query shuffle/spill telemetry) goes to a
    # sidecar file: the driver captures only a ~2000-byte stdout tail, so
    # the stdout line must stay under ~1.9 KB to be parseable.
    details_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_details.json")
    with open(details_path, "w") as fh:
        json.dump(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "n_measured": n_measured,
                "calibration_sec": calibration,
                "calibration_trusted": cal_trusted,
                "calibration_start_trusted": cal_start_trusted,
                "calibration_end_trusted": cal_end_trusted,
                "all_probes_trusted": all_probes_trusted,
                "probe_every_n": PROBE_EVERY_N,
                "interleaved_st_probes": probes,
                "query_trusted": query_trusted,
                "query_trusted_first_pass": query_trusted_first_pass,
                "untrusted_queries": untrusted_queries,
                "first_pass_queries": first_pass_queries,
                "first_pass_runs": first_pass_runs,
                "segment_retries": segment_retries,
                "spliced_via_retry": sorted(spliced_via_retry),
                "n_trusted": sum(
                    1 for n, ok in query_trusted.items() if ok and n in timings
                ),
                "calibration_gate_sec": CAL_GATE_SEC,
                "calibration_st_gate_sec": CAL_ST_GATE_SEC,
                "probe_par_band_sec": probe_band,
                "probe_par_rel_band": PROBE_PAR_REL_BAND,
                "calibration_gate_attempts": len(cal_history),
                "calibration_gate_history": cal_history,
                "calibration_runs": cal_runs,
                "calibration_end_sec": min(cal_end_runs),
                "calibration_end_runs": cal_end_runs,
                "calibration_st_sec": calibration_st,
                "calibration_st_runs": cal_st_runs,
                "calibration_st_end_sec": min(cal_st_end_runs),
                "calibration_st_end_runs": cal_st_end_runs,
                "calibration_scan_sec": min(cal_scan_runs),
                "calibration_scan_runs": cal_scan_runs,
                "calibration_scan_end_sec": min(cal_scan_end_runs),
                "calibration_scan_end_runs": cal_scan_end_runs,
                "scan_gate_sec": SCAN_GATE_SEC,
                "scan_rel_band": SCAN_REL_BAND,
                "scan_band_sec": scan_band,
                "scan_start_trusted": scan_start_trusted,
                "scan_end_trusted": scan_end_trusted,
                "queries": timings,
                "runs": all_runs,
                "sketch_only_queries": sketch_only_timings,
                "sketch_only_runs": sketch_only_runs,
                "shared_scan": shared_scan,
                "loadavg_1m": loadavgs,
                "errors": errors,
                "runtime_metrics": runtime,
                "ivf_pruned": ivf_pruned,
                "sf": sf_val,
            },
            fh,
            indent=1,
        )
    # Stdout line: errors appear as names only (full messages live in the
    # sidecar) so one long exception can't blow the tail-capture budget.
    # Error-key convention (r17 ADVICE): a plain "name" key is a
    # first-pass failure (the query has NO wall in `queries`);
    # "name[retry]" means the FIRST pass measured a wall (still present
    # in `queries`, trust per query_trusted) and only the per-segment
    # re-measurement failed; "name[sketch_only]" scopes to the
    # production-tier twin sweep.
    err_names = sorted(errors)
    payload = json.dumps(
        {
            "metric": "headline_query_wall_clock_total",
            "value": total,
            "unit": "sec",
            "n_measured": n_measured,
            "calibration_sec": calibration,
            "calibration_trusted": cal_trusted,
            "n_untrusted": len(untrusted_queries),
            "n_retried": len(spliced_via_retry),
            "queries": timings,
            **({"errors": err_names} if err_names else {}),
            "ivf_pruned": ivf_pruned,
            "sf": sf_val,
            "details": "bench_details.json",
        },
        separators=(",", ":"),
    )
    if len(payload) > 1900:  # keep the driver tail-capture parseable
        slim = {n: round(t, 2) for n, t in timings.items()}
        payload = json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "n_measured": n_measured,
                "calibration_sec": calibration,
                "calibration_trusted": cal_trusted,
                "n_untrusted": len(untrusted_queries),
                "n_retried": len(spliced_via_retry),
                "queries": slim,
                **({"errors": err_names} if err_names else {}),
                "sf": sf_val,
                "details": "bench_details.json",
            },
            separators=(",", ":"),
        )
    if len(payload) > 1900:
        # Last resort as the registry keeps growing: aggregate + the ten
        # slowest queries; the full per-query map lives in the sidecar.
        slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
        payload = json.dumps(
            {
                "metric": "headline_query_wall_clock_total",
                "value": total,
                "unit": "sec",
                "n_measured": n_measured,
                "calibration_sec": calibration,
                "calibration_trusted": cal_trusted,
                "n_untrusted": len(untrusted_queries),
                "n_retried": len(spliced_via_retry),
                "queries": {n: round(t, 2) for n, t in slowest.items()},
                **({"errors": err_names} if err_names else {}),
                "sf": sf_val,
                "details": "bench_details.json",
            },
            separators=(",", ":"),
        )
    # Emit the JSON as the very last stdout bytes: stop Spark first so JVM
    # shutdown chatter can't land after (or inside) the line the harness
    # tails, then print compact + flush.
    spark.stop()
    print(payload, flush=True)


if __name__ == "__main__":
    import logging

    logging.getLogger("py4j").setLevel(logging.ERROR)
    main()
