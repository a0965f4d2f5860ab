"""Deterministic hash splits: disjoint, exhaustive, stable, proportional."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF001
from walmart_e_commerce_sales_data_pipeline_spark.operators.splits import hash_split

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_splits_disjoint_and_exhaustive(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    splits = hash_split(docs, "doc_id", WEIGHTS)
    ids = {name: {r["doc_id"] for r in df.select("doc_id").collect()} for name, df in splits.items()}
    all_ids = set.union(*ids.values())
    assert sum(len(s) for s in ids.values()) == len(all_ids) == docs.count()


def test_splits_are_stable_across_invocations_and_partitioning(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    a = {r["doc_id"] for r in hash_split(docs, "doc_id", WEIGHTS)["val"].collect()}
    b = {
        r["doc_id"]
        for r in hash_split(docs.repartition(13), "doc_id", WEIGHTS)["val"].collect()
    }
    assert a == b  # pure function of (key, seed) — partitioning-independent


def test_split_proportions(spark):
    big = spark.range(100_000).withColumnRenamed("id", "k")
    splits = hash_split(big, "k", WEIGHTS)
    n = {name: df.count() for name, df in splits.items()}
    assert abs(n["train"] / 100_000 - 0.8) < 0.01
    assert abs(n["val"] / 100_000 - 0.1) < 0.01
    assert abs(n["test"] / 100_000 - 0.1) < 0.01


def test_new_rows_do_not_reshuffle_old(spark):
    first = spark.range(0, 50_000).withColumnRenamed("id", "k")
    grown = spark.range(0, 100_000).withColumnRenamed("id", "k")
    val_first = {r["k"] for r in hash_split(first, "k", WEIGHTS)["val"].collect()}
    val_grown = {
        r["k"] for r in hash_split(grown, "k", WEIGHTS)["val"].collect() if r["k"] < 50_000
    }
    assert val_first == val_grown  # growth never moves existing rows


def test_aes_rank1_probability_proportional_to_weight(spark):
    """A-ES contract: P(rank 1 = i) = w_i / Σw.  One doc carries weight
    100 against 19 docs of weight 1 (P = 100/119 ≈ 0.84); over 300
    independent salted resamples its top-1 frequency must sit well inside
    that neighborhood (±7σ ≈ ±0.15), and in the uniform-weight control no
    doc may dominate."""
    from pyspark.sql import Window

    from walmart_e_commerce_sales_data_pipeline_spark.operators.splits import (
        aes_key_column,
    )

    docs = spark.createDataFrame(
        [(i, 100.0 if i == 7 else 1.0) for i in range(20)], "k long, w double"
    )
    trials = docs.crossJoin(
        spark.range(300).select(F.col("id").alias("salt"))
    )
    keyed = trials.withColumn(
        "aes", aes_key_column("k", F.col("w"), salt="salt")
    )
    win = Window.partitionBy("salt").orderBy(F.col("aes").desc(), "k")
    wins = (
        keyed.withColumn("rk", F.row_number().over(win))
        .filter("rk = 1")
        .groupBy("k")
        .count()
        .collect()
    )
    freq = {r["k"]: r["count"] / 300 for r in wins}
    p = 100 / 119
    assert abs(freq.get(7, 0.0) - p) < 0.15, freq

    uni = spark.createDataFrame(
        [(i, 1.0) for i in range(10)], "k long, w double"
    )
    keyed_u = (
        uni.crossJoin(spark.range(300).select(F.col("id").alias("salt")))
        .withColumn("aes", aes_key_column("k", F.col("w"), salt="salt"))
    )
    wins_u = (
        keyed_u.withColumn("rk", F.row_number().over(win))
        .filter("rk = 1")
        .groupBy("k")
        .count()
        .collect()
    )
    assert max(r["count"] / 300 for r in wins_u) < 0.25  # mean 0.1


def test_aes_salt_rejects_non_identifier_strings(spark):
    """The salt lands inside a SQL expression string, so free-form text
    must raise instead of parsing as an expression ('round-1' would be
    arithmetic) — ADVICE r11 injection hardening."""
    import pytest

    from walmart_e_commerce_sales_data_pipeline_spark.operators.splits import (
        aes_key_column,
    )

    with pytest.raises(ValueError, match="bare column identifier"):
        aes_key_column("k", F.col("w"), salt="round-1")
    with pytest.raises(ValueError, match="bare column identifier"):
        aes_key_column("k", F.col("w"), salt="x'); drop")
    with pytest.raises(TypeError, match="int or column name"):
        aes_key_column("k", F.col("w"), salt=1.5)
    # the two legitimate forms still build
    aes_key_column("k", F.col("w"), salt=7)
    aes_key_column("k", F.col("w"), salt="salt")


def test_aes_sample_is_deterministic_and_group_limited(spark):
    """The registered query is a pure function of the data (same rows on
    a repartitioned input) and its per-source top-3 plans as
    WindowGroupLimit, not a full per-group sort."""
    from tests.conftest import SF001
    from walmart_e_commerce_sales_data_pipeline_spark import queries as q

    df = q.REGISTRY["weighted_sample_aes"].fn(spark, SF001)
    rows = [tuple(r) for r in df.collect()]
    again = [tuple(r) for r in df.collect()]
    assert rows == again and len(rows) > 0
    # every source contributes exactly 3 ranked rows (corpus > 3 docs/source)
    from collections import Counter

    per_src = Counter(r[0] for r in rows)
    assert all(v == 3 for v in per_src.values())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
