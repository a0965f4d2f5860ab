"""Driver-SF (sf0.1) mirror for the hash-fragile exact-stats queries.

The standing mirror (tests/test_queries_vs_duckdb.py) checks all 217
registered queries at sf0.01.  The four queries below failed the
EXTERNAL hash in r17/r18 while that mirror stayed green — the failure
class (decimal-typed published columns, fixed in r19 by publishing the
exact-integer pins as digit strings) only ever showed up on the
driver's environment.  VERDICT r18 item 1 asks for a mirror at the
driver's bench SF for exactly these queries so any residual
environment-sensitive divergence (value rendering, rounding-boundary
flips at the larger SF's values) is caught pre-driver at the same data
the driver benches.  Strictness matches the standing mirror: exact
equality per cell, arrow type classes compared.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from walmart_e_commerce_sales_data_pipeline_spark import queries as q

SF01 = "/root/testdata/sf0.1"

FRAGILE = [
    "source_ks_drift",
    "spearman_rank_corr",
    "source_length_kruskal",
    "source_length_levene",
]

TABLES = ("lineitem", "documents")  # all four read only these


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF01}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
    return v


@pytest.mark.parametrize("name", FRAGILE)
def test_fragile_query_matches_oracle_at_sf01(spark, duck01, name):
    query = q.REGISTRY[name]
    sdf = query.fn(spark, SF01)
    spark_rows = sorted(
        [tuple(_norm(v) for v in r) for r in sdf.collect()], key=str
    )
    ddf = duck01.sql(query.oracle)
    duck_rows = sorted(
        [tuple(_norm(v) for v in r) for r in ddf.fetchall()], key=str
    )
    assert sdf.columns == list(ddf.columns), name
    assert len(spark_rows) == len(duck_rows), name
    mismatches = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows))
        if a != b
    ]
    assert not mismatches, f"{name}: {mismatches[:3]}"
    # no decimal-typed column may ever reappear here (the r17/r18 class)
    import pyarrow as pa

    for f in sdf.toArrow().schema:
        assert not pa.types.is_decimal(f.type), (name, f.name)
    for f in ddf.arrow().schema:
        assert not pa.types.is_decimal(f.type), (name, f.name)
