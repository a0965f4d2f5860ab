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
