"""Physical-plan assertions: the scale story isn't 'it returns the right
rows' but 'Catalyst chose the plan that survives 100×' — filters reach the
parquet scan, projections prune columns, dimensions broadcast."""

from __future__ import annotations

from tests.conftest import SF001
from walmart_e_commerce_sales_data_pipeline_spark import queries as q
from walmart_e_commerce_sales_data_pipeline_spark.plans import (
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)


def test_pricing_summary_pushdown_and_pruning(spark):
    df = q.REGISTRY["pricing_summary"].fn(spark, SF001)
    plan = formatted_plan(df)
    # shipdate filter must reach the parquet scan
    assert any("l_shipdate" in f for f in pushed_filters(df)), plan
    # projection pruning: the scan must not read l_suppkey/l_partkey etc.
    scan_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_suppkey" not in scan_schema
    assert "l_quantity" in scan_schema
    df.collect()  # AQE: codegen ids exist only in the final executed plan
    assert wholestage_codegen_spans(df) >= 1


def test_star_join_broadcasts_dimensions(spark):
    df = q.REGISTRY["regional_revenue"].fn(spark, SF001)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    # the orders date filter must push into the orders scan
    assert any("o_orderdate" in f for f in pushed_filters(df)), plan


def test_fact_dim_join_broadcasts(spark):
    df = q.REGISTRY["join_customer_orders"].fn(spark, SF001)
    assert has_broadcast_join(df)


def test_topk_uses_take_ordered(spark):
    df = q.REGISTRY["top10_expensive_items"].fn(spark, SF001)
    # global top-k must not be a full sort: TakeOrderedAndProject caps
    # per-partition state at k rows
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_runtime_metrics_capture_shuffle(spark):
    """metrics_since reads real shuffle volume from the SQL status store."""
    from walmart_e_commerce_sales_data_pipeline_spark.plans import (
        execution_count,
        metrics_since,
    )

    mark = execution_count(spark)
    q.REGISTRY["regional_revenue"].fn(spark, SF001).collect()
    m = metrics_since(spark, mark)
    assert set(m) == {"shuffle_bytes", "spill_bytes", "peak_memory_bytes"}
    # a 3-table join + groupBy must shuffle at least the aggregation
    assert m["shuffle_bytes"] > 0
    # nothing at sf0.001 should spill on a 128 GiB heap
    assert m["spill_bytes"] == 0
    # the hash aggregates report a per-task peak (the funnel tell the
    # bench sidecar records per query)
    assert m["peak_memory_bytes"] > 0


def test_market_share_all_dims_broadcast(spark):
    """Q8-style 7-relation tree: six BroadcastHashJoins, zero fact-side
    SortMergeJoin — the only exchanges are aggregation and the share
    window."""
    df = q.REGISTRY["market_share_by_year"].fn(spark, SF001)
    plan = formatted_plan(df)
    # formatted plans name each node in the tree AND the details section
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert "SortMergeJoin" not in plan, plan
    # the region predicate must reach the region scan
    assert any("r_name" in f for f in pushed_filters(df)), plan


def test_text_repetition_no_filter_below_spread(spark):
    """Regression for the filter-below-repartition trap (SCALE.md §4):
    the explode formulation must leave no Filter between the exchange and
    the documents scan re-deriving the shingle transform serially."""
    df = q.REGISTRY["text_repetition"].fn(spark, SF001)
    plan = formatted_plan(df)
    scan_region = plan.split("Scan parquet")[-1] if "Scan parquet" in plan else plan
    assert "transform" not in scan_region.split("ReadSchema")[0], plan


def test_decontaminate_benchmark_broadcasts(spark):
    """The benchmark shingle set must broadcast: the corpus side of the
    tagging join may not shuffle (the only exchange below the per-doc
    aggregation is the shingle distinct), or decontamination would pay a
    corpus-sized exchange per benchmark at 100 TB."""
    df = q.REGISTRY["decontaminate_corpus"].fn(spark, SF001)
    assert has_broadcast_join(df)
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan, plan


def test_local_supplier_volume_one_shuffle_join(spark):
    """Q5-style tree: supplier/customer/nation/region all broadcast — the
    only shuffle join may be lineitem⋈orders (and AQE usually converts
    even that at test scale); the date filter must reach the orders scan."""
    df = q.REGISTRY["local_supplier_volume"].fn(spark, SF001)
    plan = formatted_plan(df)
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan
    assert any("o_orderdate" in f for f in pushed_filters(df)), plan


def test_vocab_top_ngrams_take_ordered(spark):
    """The global top-20 must run as TakeOrderedAndProject (per-partition
    k-row state, 0-byte shuffle), never a full sort of the ngram counts."""
    df = q.REGISTRY["vocab_top_ngrams"].fn(spark, SF001)
    plan = formatted_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0], plan


def test_events_ts_filter_pushes_to_parquet_scan(spark):
    """With the timestamp[us] events encoding the loader keeps ``ts`` as a
    native column, so time-range predicates reach the parquet scan as
    PushedFilters (row-group min/max pruning at scale).  Under the old
    nanos-as-long encoding ``ts`` was a derived expression
    (timestamp_micros(ts_ns div 1000)) and no ts filter could push — this
    pins the scale win of the dtype-adaptive loader."""
    from pyspark.sql import functions as F

    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

    ev = events(spark, SF001)
    if not any(f.name == "ts" and "Timestamp" in type(f.dataType).__name__
               for f in spark.read.parquet(f"{SF001}/events.parquet").schema):
        import pytest

        pytest.skip("testdata ships the nanos-as-long encoding")
    df = ev.filter(F.col("ts") >= "2024-03-01").select("event_id", "ts")
    assert any("GreaterThan" in f and "ts" in f for f in pushed_filters(df)), (
        formatted_plan(df)
    )


def test_customer_order_histogram_on_clause_not_pushed_as_where(spark):
    """The o_orderpriority exclusion lives in the LEFT join's ON clause:
    it must push into the orders-side scan (filtering the probe input),
    while the customer side stays unfiltered so zero-order customers
    survive."""
    df = q.REGISTRY["customer_order_histogram"].fn(spark, SF001)
    assert any("o_orderpriority" in f for f in pushed_filters(df))
    plan = formatted_plan(df)
    assert "LeftOuter" in plan, plan


def test_topk_neighbors_routes_to_cell_join_above_brute_limit(spark):
    """Above TOPK_BRUTE_ROW_LIMIT, exact top-k must abandon the
    theta-join (CartesianProduct / nested loop scanning the whole corpus
    per task) for the IVF cell-key equi-join with every cell probed —
    same exact result, scale-safe shuffle shape."""
    from pyspark.sql import functions as F

    from walmart_e_commerce_sales_data_pipeline_spark.operators.similarity import (
        topk_neighbors,
    )

    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)

    routed = topk_neighbors(emb, queries, k=3, brute_limit=0)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    brute = topk_neighbors(emb, queries, k=3)  # corpus far below the limit
    brute_plan = brute._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in brute_plan or "CartesianProduct" in brute_plan

    key = lambda df: {  # noqa: E731
        (r["query_id"], r["rank"], r["neighbor_id"]) for r in df.collect()
    }
    assert key(routed) == key(brute)


def test_bigram_pmi_broadcasts_and_take_ordered(spark):
    """Unigram-count joins broadcast (vocab-bounded) and the top-25 is
    TakeOrderedAndProject, never a global sort."""
    df = q.REGISTRY["bigram_pmi"].fn(spark, SF001)
    assert has_broadcast_join(df)
    assert "TakeOrderedAndProject" in formatted_plan(df)


def test_sliding_chunks_no_shuffle_before_sort(spark):
    """Chunking is pure per-row work: the only Exchange in the plan is
    the presentation sort's range partitioning — no hash shuffle, no
    aggregation, no join anywhere."""
    plan = formatted_plan(q.REGISTRY["sliding_chunk_windows"].fn(spark, SF001))
    assert "rangepartitioning" in plan, plan
    assert "hashpartitioning" not in plan, plan
    for op in ("HashAggregate", "SortMergeJoin", "BroadcastHashJoin"):
        assert op not in plan, op


def test_winsorized_fences_broadcast(spark):
    """The 3-row fence table must broadcast back onto the fact scan."""
    df = q.REGISTRY["winsorized_price_stats"].fn(spark, SF001)
    assert has_broadcast_join(df)


def test_kmv_rank_filters_rewrite_to_group_limits(spark):
    """row_number() <= k prunes via WindowGroupLimit in both sketch
    queries — no group's full hash set ever sorts in one place — and the
    shared shingle subtree feeding the sketch and exact-count branches
    dedupes via exchange reuse instead of a persist (the reason neither
    query caches anything)."""
    for name in ("kmv_distinct_sketch", "kmv_sketch_union"):
        df = q.REGISTRY[name].fn(spark, SF001)
        df.collect()  # AQE finalizes reuse decisions in the executed plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, name
        assert "ReusedExchange" in plan or "TableCacheQueryStage" in plan, (
            name,
            plan,
        )


def test_point_in_time_join_is_hash_not_nested_loop(spark):
    """The SCD-2 interval join must ride the user_id equi key as a hash
    join with the containment as a residual — a nested loop here would
    be labels x history at scale."""
    plan = formatted_plan(q.REGISTRY["state_as_of_label_time"].fn(spark, SF001))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
