"""Unit tests on the stage functions, same fixtures/assertions as the
reference's own pytest module (/root/reference/wallmart_pipeline_pytest.py),
ported to Spark DataFrames (FIXTURES.md §A1-A2)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from walmart_e_commerce_sales_data_pipeline_spark.pipeline import (
    avg_weekly_sales_per_month,
    transform,
)

TRANSFORM_SCHEMA = StructType(
    [
        StructField("Store_ID", IntegerType()),
        StructField("Weekly_Sales", DoubleType()),
        StructField("IsHoliday", BooleanType()),
        StructField("CPI", DoubleType()),
        StructField("Unemployment", DoubleType()),
        StructField("Date", StringType()),
    ]
)


def test_transform(spark):
    # fixture mirrors wallmart_pipeline_pytest.py:6-13
    data = spark.createDataFrame(
        [
            (1, 15000.0, False, 200.5, 6.5, "2024-01-15T00:00:00.000"),
            (2, None, True, None, 7.1, "2024-02-20T00:00:00.000"),
            (3, 8000.0, False, 190.3, None, "2024-03-10T00:00:00.000"),
        ],
        TRANSFORM_SCHEMA,
    )
    out = transform(data)
    rows = out.collect()

    # assertions mirror wallmart_pipeline_pytest.py:16-20
    assert "Month" in out.columns, "Month column not created"
    for col in ("Weekly_Sales", "CPI", "Unemployment"):
        nulls = out.filter(F.col(col).isNull()).count()
        assert nulls == 0, f"Missing {col} not filled"
    assert min(r["Weekly_Sales"] for r in rows) > 10000, "Filtering condition not applied"

    # null Weekly_Sales filled with mean (15000+8000)/2 = 11500 → survives filter;
    # the 8000 row is dropped → exactly 2 rows.
    assert len(rows) == 2
    by_store = {r["Store_ID"]: r for r in rows}
    assert by_store[2]["Weekly_Sales"] == 11500.0
    assert by_store[2]["CPI"] == (200.5 + 190.3) / 2
    assert by_store[3 if 3 in by_store else 1]["Month"] in (1, 3)


def test_avg_weekly_sales_per_month(spark):
    # fixture mirrors wallmart_pipeline_pytest.py:23-26
    clean = spark.createDataFrame(
        [Row(Month=m, Weekly_Sales=float(s)) for m, s in
         [(1, 20000), (1, 18000), (2, 22000), (2, 21000), (3, 25000), (3, 23000)]]
    )
    agg = avg_weekly_sales_per_month(clean)
    rows = agg.collect()

    # assertions mirror wallmart_pipeline_pytest.py:30-33
    assert "Month" in agg.columns
    assert "Avg_Sales" in agg.columns
    assert len(rows) == 3, "Incorrect number of months aggregated"
    month1 = [r for r in rows if r["Month"] == 1][0]
    assert round(month1["Avg_Sales"], 2) == 19000.0

    # pandas groupby sorts keys ascending (gotcha G2) — explicit orderBy here
    assert [r["Month"] for r in rows] == [1, 2, 3]


def test_avg_drops_null_months(spark):
    """Gotcha G1: pandas groupby drops NaN keys; Spark keeps them unless
    filtered — the port must filter (SURVEY.md §2.5)."""
    schema = StructType(
        [StructField("Month", IntegerType(), True), StructField("Weekly_Sales", DoubleType())]
    )
    clean = spark.createDataFrame(
        [(1, 100.0), (None, 999.0), (1, 300.0)], schema
    )
    rows = avg_weekly_sales_per_month(clean).collect()
    assert len(rows) == 1
    assert rows[0]["Month"] == 1
    assert rows[0]["Avg_Sales"] == 200.0


def test_load_partitioned_sink_matches_single_file(spark, tmp_path):
    """r17 VERDICT item 7: load(single_file=False) is the production CSV
    sink — one part per partition, parallel write — and must produce the
    same rows as the reference-parity single-file contract; validation()
    accepts both layouts."""
    from walmart_e_commerce_sales_data_pipeline_spark.pipeline import (
        load,
        validation,
    )

    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 7 AS STRING) AS bucket"
    ).repartition(4)
    single_dir, multi_dir = str(tmp_path / "single"), str(tmp_path / "multi")
    w1 = load({"t": df}, output_dir=single_dir)
    w2 = load({"t": df}, output_dir=multi_dir, single_file=False)
    from pathlib import Path

    assert len(list(Path(single_dir, "t.csv").glob("part-*"))) == 1
    assert len(list(Path(multi_dir, "t.csv").glob("part-*"))) == 4
    r1 = sorted(map(tuple, spark.read.option("header", True).csv(w1[0]).collect()))
    r2 = sorted(map(tuple, spark.read.option("header", True).csv(w2[0]).collect()))
    assert r1 == r2 and len(r1) == 1000
    assert all(validation(spark, w1, deep=True).values())
    assert all(validation(spark, w2, deep=True).values())
