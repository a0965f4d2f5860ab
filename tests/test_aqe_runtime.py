"""AQE runtime re-planning evidence: a join that the static planner must
sort-merge (static broadcast disabled) converts to broadcast-hash at
runtime from observed shuffle sizes — the mechanism this engine leans on
instead of hand-pinning fact-join strategies."""

from __future__ import annotations

from tests.conftest import SF001


def _simple_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF001}/orders.parquet")
    prev_static = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # static planner: broadcast forbidden → SortMergeJoin
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # runtime (AQE): broadcast allowed from *observed* sizes
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")

        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        pre = _simple_plan(j)
        assert "SortMergeJoin" in pre and "BroadcastHashJoin" not in pre

        j.collect()
        post = _simple_plan(j)
        assert "isFinalPlan=true" in post
        assert "BroadcastHashJoin" in post, post  # AQE converted at runtime
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_static)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_runtime_bloom_filter_injected(spark):
    """InjectRuntimeFilter evidence: when a shuffle join's build side is
    selectively filtered, Spark can push a Bloom-filter semi-join onto the
    probe side's scan — at 100 TB this skips reading most of the fact
    table's rows for the join.  The default thresholds target real
    cluster sizes (10 GB application side), so lower them to fire on
    testdata; the assertion is that the mechanism engages at all
    (might_contain on the probe side, bloom_filter_agg on the build)."""
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF001}/orders.parquet").filter(
        "o_orderpriority = '1-URGENT'"
    )
    saved = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": None,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": None,
        "spark.sql.autoBroadcastJoinThreshold": None,
    }
    for k in saved:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        # broadcast joins skip runtime filters (the broadcast IS the
        # pushdown); force the shuffle-join shape the filter exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
        )
        plan = _simple_plan(j).lower()
        assert "might_contain" in plan or "bloomfilter" in plan, plan
        assert j.count() > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
