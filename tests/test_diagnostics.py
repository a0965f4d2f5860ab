"""Targeted semantics for queries/diagnostics.py: the OLS slope against an
independent numpy reference, and the integrity audit against PLANTED
violations (the mirror proves cross-engine equality; these prove the
numbers mean what they claim).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from walmart_e_commerce_sales_data_pipeline_spark import queries as q

from tests.conftest import SF001


def test_trend_slope_matches_numpy_polyfit(spark):
    """The sufficient-statistics slope/intercept must agree with an
    independently computed least-squares fit on the same monthly series."""
    rows = q.REGISTRY["revenue_trend_slope"].fn(spark, SF001).collect()
    assert rows
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT n.n_name,
               (EXTRACT(year FROM o.o_orderdate) - 1995) * 12
                   + EXTRACT(month FROM o.o_orderdate) - 1 AS x,
               CAST(ROUND(SUM(o.o_totalprice * 100.0)) AS BIGINT) AS y
        FROM '{SF001}/orders.parquet' o
        JOIN '{SF001}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF001}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, x
        """
    ).fetchdf()
    by_nation = {name: g for name, g in ref.groupby("n_name")}
    for r in rows:
        g = by_nation[r["n_name"]]
        slope, intercept = np.polyfit(
            g["x"].to_numpy(float), g["y"].to_numpy(float), 1
        )
        assert r["n_months"] == len(g)
        assert abs(r["slope_cents_per_month"] - slope) <= max(
            1e-6 * abs(slope), 1e-3
        ), (r, slope)
        assert abs(r["intercept_cents"] - intercept) <= max(
            1e-6 * abs(intercept), 1e-2
        ), (r, intercept)


def test_integrity_audit_counts_planted_violations(spark, tmp_path):
    """Plant one violation of every class in a miniature fixture and
    assert each check reports exactly its plant — proving the audit
    counts real defects, not just zeros on clean testdata."""
    sf = str(tmp_path)
    lineitem = pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 2, 999],  # 999 -> orphan
            "l_linenumber": [1, 1, 1, 2, 1],  # (1,1) duplicated
            "l_quantity": [1.0] * 5,
            "l_extendedprice": [10.0, 20.0, -5.0, 30.0, 40.0],  # one <= 0
            "l_discount": [0.1, 0.2, 0.0, 1.5, 0.3],  # one > 1
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": pd.to_datetime(
                ["2020-01-01", None, "2020-01-03", "2020-01-04", "2020-01-05"]
            ),  # one null
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [10, 20, 777],  # 777 -> orphan customer
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [100.0] * 3,
            "o_orderdate": pd.to_datetime(["2020-01-01"] * 3),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    customer = pd.DataFrame(
        {
            "c_custkey": [10, 20],
            "c_name": ["a", "b"],
            "c_nationkey": [0, 1],
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING"] * 2,
        }
    )
    # µs timestamps: Spark's parquet reader rejects pandas' default NANOS.
    lineitem.to_parquet(f"{sf}/lineitem.parquet", coerce_timestamps="us")
    orders.to_parquet(f"{sf}/orders.parquet", coerce_timestamps="us")
    customer.to_parquet(f"{sf}/customer.parquet")

    rows = {
        r["check_name"]: r
        for r in q.REGISTRY["referential_integrity_audit"].fn(spark, sf).collect()
    }
    assert rows["lineitem_orphan_order"]["violations"] == 1
    assert rows["lineitem_null_shipdate"]["violations"] == 1
    assert rows["lineitem_nonpositive_price"]["violations"] == 1
    assert rows["lineitem_discount_out_of_range"]["violations"] == 1
    assert rows["lineitem_duplicate_pk"]["violations"] == 1
    assert rows["orders_orphan_customer"]["violations"] == 1
    for name, r in rows.items():
        total = 3 if name == "orders_orphan_customer" else 5
        assert r["total"] == total, r
        assert abs(r["viol_rate"] - round(r["violations"] / total, 6)) < 1e-12


def test_integrity_audit_findings_on_testdata(spark):
    """The synthetic tables are referentially sound on foreign keys (zero
    orphans) but the generator does NOT de-duplicate (l_orderkey,
    l_linenumber) — the audit must surface that real defect (11,785
    surplus rows at sf0.01), proving it reports what the data contains
    rather than rubber-stamping zeros."""
    rows = {
        r["check_name"]: r["violations"]
        for r in q.REGISTRY["referential_integrity_audit"].fn(spark, SF001).collect()
    }
    assert rows["lineitem_orphan_order"] == 0
    assert rows["orders_orphan_customer"] == 0
    assert rows["lineitem_duplicate_pk"] > 0


def test_bloom_fp_rate_near_theory(spark):
    """The realized false-positive rate must sit in a binomial band
    around the textbook (1 - e^(-kn/m))^k for the filter's geometry —
    the property that makes the fixed-size filter predictable enough to
    ship as a runtime filter."""
    import math

    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        _BLOOM_BITS,
        _BLOOM_K,
    )

    row = q.REGISTRY["bloom_semijoin_stats"].fn(spark, SF001).collect()[0]
    assert row["n_pass"] >= row["n_true"]  # no false negatives, ever
    assert row["bits_set"] <= min(_BLOOM_BITS, _BLOOM_K * row["n_keys"])
    theory = (1 - math.exp(-_BLOOM_K * row["n_keys"] / _BLOOM_BITS)) ** _BLOOM_K
    # Binomial noise band on the distinct non-member probes: the fp_rate
    # is computed over ORDERS of non-member custkeys (clustered trials),
    # so allow a generous 4-sigma band on ~n_keys*4 distinct probes.
    trials = 1200  # distinct non-member custkeys at sf0.01 (1500 * 4/5)
    sigma = math.sqrt(theory * (1 - theory) / trials)
    assert abs(row["fp_rate"] - theory) <= 4 * sigma + 0.25 * theory, (
        row["fp_rate"],
        theory,
    )
