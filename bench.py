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
    "similarity_pairs_blocked",
    "similarity_topk",
    "text_quality_buckets",
    "doc_fingerprint",
    "text_bpe_tokens",
    "profile_documents",
    "similarity_topk_ivf",
    "promo_revenue_share",
    "top_supplier_revenue",
    "grouped_zscore_histogram",
    "asof_join_latest_order",
    "range_join_close_events",
    "window_frames_suite",
    "market_share_by_year",
    "text_repetition",
    "pack_context_segments",
]


def main() -> None:
    from walmart_e_commerce_sales_data_pipeline_spark import queries as q
    from walmart_e_commerce_sales_data_pipeline_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the executor pool / codegen before the timed runs.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # min of 2 runs per query: the first run of anything pays one-time JVM
    # class-loading/codegen costs that say nothing about steady-state
    # throughput at scale.
    from walmart_e_commerce_sales_data_pipeline_spark.plans import (
        execution_count,
        metrics_since,
    )

    timings: dict[str, float] = {}
    runtime: dict[str, dict[str, int]] = {}
    for name in HEADLINE:
        fn = q.REGISTRY[name].fn
        best = float("inf")
        for _ in range(2):
            # cache-cold per run: operators that persist intermediates
            # (dedup LSH) must not let run 2 reuse run 1's cached state,
            # and no query may inherit another's cache
            spark.catalog.clearCache()
            mark = execution_count(spark)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        # shuffle/spill volume of the last run: wall-clock can stay flat at
        # sf0.1 while shuffle volume doubles — the 100 TB regression signal
        runtime[name] = metrics_since(spark, mark)

    # Reference-parity ETL on the reference's own bundled data (matches the
    # BASELINE.md measurement boundary: extract→transform→agg→load→validate).
    from walmart_e_commerce_sales_data_pipeline_spark.pipeline import main as etl_main

    best = float("inf")
    for _ in range(2):
        with tempfile.TemporaryDirectory() as out:
            t0 = time.perf_counter()
            etl_main(
                spark,
                f"{REFERENCE_DIR}/grocery_sales.csv",
                f"{REFERENCE_DIR}/extra_data.parquet",
                output_dir=out,
            )
            best = min(best, time.perf_counter() - t0)
    timings["walmart_etl_e2e"] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = json.dumps(
        {
            "metric": "headline_query_wall_clock_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "runtime_metrics": runtime,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
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
