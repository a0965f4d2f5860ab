"""Deterministic hash splits: disjoint, exhaustive, stable, proportional."""

from __future__ import annotations

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
