"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``  — flagship query (TPC-H-Q1-style pricing summary) at
                    sf0.001.
``queries()``     — every implemented operator from SURVEY.md §2 as a named
                    (spark, sf_dir) -> DataFrame callable.
``oracle_sql()``  — per-query ANSI SQL for the DuckDB oracle; omitted only
                    for ops whose semantics are not SQL-expressible (the
                    driver then records a rows-only check).

Operator coverage map (SURVEY.md §2 → query names):
- O1/O2 scans, O3 schema assert, O15-O19 sinks/orchestration: exercised by
  the ``pipeline`` module + tests (file-path based, not sf_dir queries).
- O4 inner join           → join_customer_orders, regional_revenue
- O5 scalar means         → scalar_means
- O6 fill-with-mean       → impute_group_avg
- O7-O9 date parse/month  → monthly_avg_value (reference flagship shape)
- O10/O11 filter/project  → pricing_summary, top10_expensive_items
- O12-O14 group-avg/rename/round → monthly_avg_value, pricing_summary
- §2.2 other joins        → join_left_outer / join_semi / join_anti /
                            join_full_outer
- §2.4 windows/sort/limit/setops → window_topk_orders, window_running_total,
                            top10_expensive_items, set_operations
- §2.3 agg suite          → agg_suite, distinct_counts, rollup_customer_geo,
                            cube_order_status
- §2.5 scalar fns         → string_functions, date_functions, case_when_tiers
- §2.11 extension surface → events_*, dedup_*, text_*, similarity_* entries
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from walmart_e_commerce_sales_data_pipeline_spark import queries as q  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q.REGISTRY["pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return q.spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/types)."""
    return q.oracle_map()
