"""Tests for the scale-posture operators: salting preserves semantics,
bucketed joins are Exchange-free, and the custom stateful streaming
operator converges to the batch truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.operators.bucketing import (
    colocated_join,
    write_bucketed,
)
from walmart_e_commerce_sales_data_pipeline_spark.operators.skew import (
    salted_group_avg,
    salted_join,
)
from walmart_e_commerce_sales_data_pipeline_spark.plans import formatted_plan
from walmart_e_commerce_sales_data_pipeline_spark.queries.grouped_pandas import (
    grouped_zscore_histogram,
    grouped_zscore_histogram_pandas,
)


def test_grouped_zscore_pandas_twin_equals_window_expressions(spark):
    """The applyInPandas grouped-map kernel must compute exactly what the
    registered pure-JVM window-expression plan computes (keeps the
    pandas-UDF API family covered without a Python stage in the registered
    query)."""
    jvm = grouped_zscore_histogram(spark, SF0001).collect()
    arrow = grouped_zscore_histogram_pandas(spark, SF0001).collect()
    assert [tuple(r) for r in jvm] == [tuple(r) for r in arrow]
    assert len(jvm) > 0


def test_salted_group_avg_equals_plain(spark):
    orders = spark.read.parquet(f"{SF0001}/orders.parquet")
    plain = {
        r["o_orderstatus"]: r["a"]
        for r in orders.groupBy("o_orderstatus").agg(F.avg("o_totalprice").alias("a")).collect()
    }
    salted = {
        r["o_orderstatus"]: r["avg_o_totalprice"]
        for r in salted_group_avg(
            orders, "o_orderstatus", "o_totalprice", salt_cols=["o_orderkey"]
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k] == pytest.approx(plain[k], rel=1e-12)


def test_salted_join_equals_plain(spark):
    orders = spark.read.parquet(f"{SF0001}/orders.parquet").withColumnRenamed(
        "o_custkey", "custkey"
    )
    customer = spark.read.parquet(f"{SF0001}/customer.parquet").withColumnRenamed(
        "c_custkey", "custkey"
    )
    plain = orders.join(customer, "custkey").select("o_orderkey", "c_name")
    salted = salted_join(
        orders, customer, "custkey", salt_cols=["o_orderkey"], buckets=8
    ).select("o_orderkey", "c_name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_exchange(spark):
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped below.  Clear any debris from aborted
    # runs first: a leftover location blocks managed-table creation.
    import shutil
    from pathlib import Path

    for t in ("li_b", "orders_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(Path("spark-warehouse") / t, ignore_errors=True)
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF0001}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    write_bucketed(li, "li_b", "l_orderkey", buckets=4)
    write_bucketed(orders, "orders_b", "l_orderkey", buckets=4)

    # Force the sort-merge path: at this toy scale the planner would
    # broadcast (also shuffle-free, but then bucketing is not what's
    # being exercised).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = colocated_join(spark, "li_b", "orders_b", "l_orderkey")
        plan = formatted_plan(joined)
        # the whole point of bucketing: no shuffle over either side
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # sanity: result matches the plain join
        assert joined.count() == li.join(orders, "l_orderkey").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS orders_b")


def test_stateful_streaming_matches_batch(spark):
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        read_events_stream,
        stage_stream_dir,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.stateful import (
        running_user_profiles,
    )

    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    q = (
        running_user_profiles(stream.select("user_id", "value", "ts_ns"))
        .writeStream.format("memory")
        .queryName("profiles_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    # last update per user == batch ground truth
    got = {
        r["user_id"]: (r["n_events"], r["last_ts_ns"])
        for r in spark.sql(
            """
            SELECT user_id, n_events, last_ts_ns FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY n_events DESC) rk
                FROM profiles_test
            ) WHERE rk = 1
            """
        ).collect()
    }
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

    truth = {
        r["user_id"]: (r["n"], r["mx"])
        for r in events(spark, SF0001)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.max("ts_ns").alias("mx"))
        .collect()
    }
    assert got == truth


def test_transform_with_state_matches_v1_operator(spark):
    """The Spark-4 StatefulProcessor operator (transformWithStateInPandas)
    must produce the same final per-user profiles as the v1
    applyInPandasWithState operator — same keys, counts, sums, last-seen.
    Runs on the RocksDB state store (required by the typed-state API).
    Skipped where the TWS wire protocol's protobuf dependency is absent
    (this sandbox) — the plan/operator construction is still exercised
    below before the skip."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.stateful import (
        transform_with_state_available,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        read_events_stream,
        rocksdb_state_conf,
        stage_stream_dir,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.stateful import (
        running_user_profiles_tws,
    )

    for k, v in rocksdb_state_conf().items():
        spark.conf.set(k, v)
    stream = read_events_stream(spark, stage_stream_dir(f"{SF0001}/events.parquet"))
    # Operator construction (plan analysis, schema validation) must work
    # regardless of the gate.
    plan = running_user_profiles_tws(stream.select("user_id", "value", "ts_ns"))
    assert plan.isStreaming
    assert set(plan.columns) == {"user_id", "n_events", "value_sum", "last_ts_ns"}
    if not transform_with_state_available():
        pytest.skip("python protobuf absent: transformWithState runtime gated")
    q = (
        running_user_profiles_tws(stream.select("user_id", "value", "ts_ns"))
        .writeStream.format("memory")
        .queryName("profiles_tws_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    got = {
        r["user_id"]: (r["n_events"], round(r["value_sum"], 6), r["last_ts_ns"])
        for r in spark.sql(
            """
            SELECT user_id, n_events, value_sum, last_ts_ns FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY n_events DESC) rk
                FROM profiles_tws_test
            ) WHERE rk = 1
            """
        ).collect()
    }
    from pyspark.sql import functions as F

    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

    truth = {
        r["user_id"]: (r["n"], round(r["vsum"], 6), r["last"])
        for r in events(spark, SF0001)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("vsum"),
            F.max("ts_ns").alias("last"),
        )
        .collect()
    }
    assert got == truth
    assert len(got) > 0
