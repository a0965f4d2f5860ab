"""Cross-engine differential tests for the portable hash expressions.

``operators.splits.portable_bucket_sql`` and
``operators.dedup.portable_token_bit_sql`` are the foundation of the
externally-verifiable sampling and SimHash paths: the SAME SQL string
(modulo the integer-division spelling) must produce identical values in
Spark and DuckDB for every input.  This test drives both engines over an
adversarial string set — empty, whitespace, unicode, long, digit-like,
quote-bearing — and compares bit-for-bit.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
    portable_token_bit_sql,
)
from walmart_e_commerce_sales_data_pipeline_spark.operators.splits import (
    PORTABLE_BUCKETS,
    portable_bucket_sql,
)

TOKENS = [
    "",
    " ",
    "the",
    "The",
    "naïve",
    "Ünïcödé-tøken",
    "日本語トークン",
    "a" * 500,
    "1234567890",
    "-42",
    "3.14159",
    "tab\tchar",
    "mixed CASE Token",
    "emoji🙂token",
    "trailing space ",
    " leading",
    "punct!@#$%^&*()",
    "dash-and_underscore",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def test_portable_token_bits_agree(spark, duck):
    sdf = spark.createDataFrame([(t,) for t in TOKENS], ["tok"]).withColumn(
        "hx", F.md5("tok")
    )
    exprs = [
        F.expr(portable_token_bit_sql("hx", b, "div")).alias(f"b{b}")
        for b in range(64)
    ]
    spark_rows = {
        r["tok"]: tuple(r[f"b{b}"] for b in range(64))
        for r in sdf.select("tok", *exprs).collect()
    }

    for t in TOKENS:
        bit_sql = ", ".join(
            portable_token_bit_sql("hx", b, "//") for b in range(64)
        )
        row = duck.execute(
            f"SELECT {bit_sql} FROM (SELECT md5(?) AS hx)", [t]
        ).fetchone()
        assert tuple(row) == spark_rows[t], f"token bit mismatch for {t!r}"


def test_portable_bucket_agrees(spark, duck):
    sdf = spark.createDataFrame([(t,) for t in TOKENS], ["k"])
    spark_vals = {
        r["k"]: r["bucket"]
        for r in sdf.select(
            "k", F.expr(portable_bucket_sql("k", "STRING")).alias("bucket")
        ).collect()
    }
    for t in TOKENS:
        (v,) = duck.execute(
            f"SELECT {portable_bucket_sql('k', 'VARCHAR')} FROM (SELECT ? AS k)",
            [t],
        ).fetchone()
        assert v == spark_vals[t], f"bucket mismatch for {t!r}"
        assert 0 <= v < PORTABLE_BUCKETS
