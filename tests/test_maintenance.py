"""MERGE-style upsert and compaction over plain parquet, checked against
DuckDB-computed merge semantics."""

from __future__ import annotations

import duckdb

from tests.conftest import SF0001
from walmart_e_commerce_sales_data_pipeline_spark.operators.maintenance import (
    compact_parquet,
    merge_upsert,
)


def test_merge_upsert_semantics(spark, tmp_path):
    target = str(tmp_path / "customers")
    base = spark.read.parquet(f"{SF0001}/customer.parquet")
    merge_upsert(spark, target, base, key="c_custkey")  # initial load
    assert spark.read.parquet(target).count() == base.count()

    # updates: modify 10 existing customers, insert 5 new ones
    updates = spark.createDataFrame(
        [(int(k), f"updated_{k}", 0, 9999.0, "UPDATED") for k in range(10)]
        + [(int(k), f"new_{k}", 0, 1.0, "NEW") for k in range(1_000_000, 1_000_005)],
        schema=base.schema,
    )
    merge_upsert(spark, target, updates, key="c_custkey")

    got = spark.read.parquet(target)
    # oracle: DuckDB-computed MERGE result
    con = duckdb.connect()
    con.sql(f"CREATE VIEW base AS SELECT * FROM read_parquet('{SF0001}/customer.parquet')")
    updates.toPandas().to_csv(tmp_path / "u.csv", index=False)
    con.sql(f"CREATE VIEW u AS SELECT * FROM read_csv_auto('{tmp_path}/u.csv')")
    want = con.sql(
        """
        SELECT c_custkey, c_name FROM base
        WHERE c_custkey NOT IN (SELECT c_custkey FROM u)
        UNION ALL SELECT c_custkey, c_name FROM u
        ORDER BY c_custkey
        """
    ).fetchall()
    got_rows = sorted((r["c_custkey"], r["c_name"]) for r in got.select("c_custkey", "c_name").collect())
    assert got_rows == [tuple(r) for r in want]
    # updated rows actually replaced
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in got.filter("c_custkey < 10").collect()}
    assert all(v == "UPDATED" for v in seg.values())


def test_merge_upsert_is_idempotent(spark, tmp_path):
    target = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    merge_upsert(spark, target, df, key="k")
    merge_upsert(spark, target, df, key="k")  # same updates again
    assert spark.read.parquet(target).count() == 100


def test_compact_parquet_reduces_files(spark, tmp_path):
    p = str(tmp_path / "frag")
    spark.range(10000).repartition(40).write.parquet(p)
    before = compact_parquet(spark, p, target_partitions=2, sort_by="id")
    assert before == 40
    import pathlib

    after = len(list(pathlib.Path(p).glob("*.parquet")))
    assert after == 2
    back = spark.read.parquet(p)
    assert back.count() == 10000
    assert back.selectExpr("sum(id)").first()[0] == sum(range(10000))
