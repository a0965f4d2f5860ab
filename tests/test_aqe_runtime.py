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


def test_aqe_splits_skewed_join_partition(spark):
    """OptimizeSkewedJoin evidence: a sort-merge join whose shuffle has one
    hot key splits the oversized partition into advisory-sized chunks at
    runtime (skew=true on the join node) instead of letting one reducer
    carry the whole key — the AQE mechanism the salting operators in
    operators/skew.py exist to *supplement*, not replace.  Thresholds are
    lowered to fire on test-sized data; the semantic check (join count
    equals the exact expected product) proves the split is
    result-transparent."""
    from pyspark.sql import functions as F

    n_big, n_hot_frac = 400_000, 9  # 90% of rows share key 0
    big = (
        spark.range(0, n_big)
        .withColumn(
            "k",
            F.when(F.col("id") % 10 < n_hot_frac, F.lit(0)).otherwise(
                F.col("id") % 1000
            ),
        )
        # widen rows so the hot partition crosses the lowered byte threshold
        .withColumn("pad", F.sha2(F.col("id").cast("string"), 512))
    )
    small = spark.range(0, 1000).select(
        F.col("id").alias("k2"), (F.col("id") * 2).alias("v")
    )
    saved = {}
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8MB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8MB",
        # forced splitting must not be undone by partition coalescing
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # count(pad) (not count(1)) so column pruning can't strip the wide
        # incompressible payload out of the shuffle — the skew detector
        # sees the partition's real bytes
        j = (
            big.join(small, big.k == small.k2)
            .agg(F.count("pad").alias("n"))
        )
        got = j.collect()[0]["n"]
        # exact expected cardinality: every big row has exactly one match
        assert got == n_big
        post = _simple_plan(j)
        assert "isFinalPlan=true" in post
        assert "skew=true" in post, post
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
