"""Executes the JDBC sink (reference O16, wallmart_pipeline.py:145-149)
against an embedded Apache Derby database — the one JDBC engine whose
driver ships inside the Spark distribution (derby*.jar in pyspark/jars),
so the sink's real codepath (DataFrameWriter.jdbc → driver registration →
CREATE TABLE → batched INSERTs) runs without any external service.

Round-trips: write with mode=overwrite, read back via spark.read.jdbc,
compare rows; then append and re-check, covering both reference modes
(``if_exists="replace"`` and implicit append).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from walmart_e_commerce_sales_data_pipeline_spark.sources.writers import write_jdbc

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url():
    d = tempfile.mkdtemp(prefix="derby_")
    return f"jdbc:derby:{d}/testdb;create=true"


def test_jdbc_write_and_read_back(spark, derby_url):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 2).alias("doubled"),
        F.concat(F.lit("row_"), F.col("id")).alias("label"),
    )
    write_jdbc(df, derby_url, "sink_roundtrip", properties=DERBY_PROPS)

    back = spark.read.jdbc(derby_url, "sink_roundtrip", properties=DERBY_PROPS)
    assert sorted(back.columns) == ["doubled", "id", "label"]
    got = {(r["id"], r["doubled"], r["label"]) for r in back.collect()}
    assert got == {(i, 2 * i, f"row_{i}") for i in range(100)}


def test_jdbc_overwrite_then_append(spark, derby_url):
    a = spark.range(10).select(F.col("id"))
    b = spark.range(10, 15).select(F.col("id"))
    write_jdbc(a, derby_url, "sink_modes", mode="overwrite", properties=DERBY_PROPS)
    write_jdbc(a, derby_url, "sink_modes", mode="overwrite", properties=DERBY_PROPS)
    write_jdbc(b, derby_url, "sink_modes", mode="append", properties=DERBY_PROPS)

    back = spark.read.jdbc(derby_url, "sink_modes", properties=DERBY_PROPS)
    assert sorted(r["id"] for r in back.collect()) == list(range(15))
