"""Property-based differential parity: random small frames through the
Spark ``transform`` must match a pandas model of the reference semantics
(/root/reference/wallmart_pipeline.py:68-102 — fill-with-mean, coerced
date parse, month derivation, > 10000 filter, 6-column projection),
including the null edge cases the fixed fixtures can't enumerate."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from walmart_e_commerce_sales_data_pipeline_spark.pipeline import transform

SCHEMA = StructType(
    [
        StructField("Store_ID", IntegerType()),
        StructField("Weekly_Sales", DoubleType()),
        StructField("IsHoliday", BooleanType()),
        StructField("CPI", DoubleType()),
        StructField("Unemployment", DoubleType()),
        StructField("Date", StringType()),
    ]
)

money = st.one_of(
    st.none(), st.integers(min_value=0, max_value=30000).map(float)
)
date_str = st.one_of(
    st.none(),
    st.just("not-a-date"),
    st.tuples(
        st.integers(2010, 2013), st.integers(1, 12), st.integers(1, 28)
    ).map(lambda t: f"{t[0]:04d}-{t[1]:02d}-{t[2]:02d}T00:00:00.000"),
)
row = st.tuples(st.integers(1, 5), money, st.booleans(), money, money, date_str)


def pandas_model(rows):
    """The reference's transform semantics, restated in pandas."""
    df = pd.DataFrame(
        rows,
        columns=["Store_ID", "Weekly_Sales", "IsHoliday", "CPI", "Unemployment", "Date"],
    )
    df = df.astype({"Weekly_Sales": "float64", "CPI": "float64", "Unemployment": "float64"})
    df.fillna(
        {
            "Weekly_Sales": df["Weekly_Sales"].mean(),
            "CPI": df["CPI"].mean(),
            "Unemployment": df["Unemployment"].mean(),
        },
        inplace=True,
    )
    df["Date"] = pd.to_datetime(df["Date"], format="%Y-%m-%dT%H:%M:%S.%f", errors="coerce")
    df["Month"] = df["Date"].dt.month
    return df.loc[
        df["Weekly_Sales"] > 10000,
        ["Store_ID", "Weekly_Sales", "IsHoliday", "CPI", "Unemployment", "Month"],
    ]


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 6)
    return v


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=0, max_size=12))
def test_transform_matches_pandas_reference_model(spark, rows):
    def key(t):
        return tuple((x is None, str(type(x)), str(x)) for x in t)

    expected = pandas_model(rows)
    want = sorted(
        (tuple(_norm(v) for v in r) for r in expected.itertuples(index=False, name=None)),
        key=key,
    )

    got_df = transform(spark.createDataFrame(rows, SCHEMA))
    got = sorted((tuple(_norm(v) for v in r) for r in got_df.collect()), key=key)
    assert got == want, f"rows={rows}"
