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
               SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS y
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


def test_theilsen_slope_matches_python_reference(spark):
    """The rank-selected median-of-pairwise-slopes must agree with an
    independently computed Theil-Sen estimate (statistics.median over
    all C(n,2) slopes) on the same monthly series."""
    import statistics

    rows = q.REGISTRY["revenue_theilsen_slope"].fn(spark, SF001).collect()
    assert rows
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT n.n_name,
               (EXTRACT(year FROM o.o_orderdate) - 1995) * 12
                   + EXTRACT(month FROM o.o_orderdate) - 1 AS x,
               SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS y
        FROM '{SF001}/orders.parquet' o
        JOIN '{SF001}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF001}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, x
        """
    ).fetchdf()
    by_nation = {name: g for name, g in ref.groupby("n_name")}
    for r in rows:
        g = by_nation[r["n_name"]].sort_values("x")
        xs = g["x"].tolist()
        ys = g["y"].tolist()
        slopes = [
            (ys[j] - ys[i]) / (xs[j] - xs[i])
            for i in range(len(xs))
            for j in range(i + 1, len(xs))
        ]
        assert r["n_months"] == len(xs)
        assert r["n_pairs"] == len(slopes)
        assert abs(r["ts_slope_cpm"] - statistics.median(slopes)) <= max(
            1e-6 * abs(statistics.median(slopes)), 1e-3
        ), (r, statistics.median(slopes))


def test_theilsen_robust_to_planted_spike(spark):
    """Robustness property the OLS fit lacks: plant one absurd spike month
    into a clean linear series and the Theil-Sen median must stay on the
    true slope while OLS is dragged away.  Computed on a synthetic frame
    through the SAME rank-selection arithmetic as the query."""
    from pyspark.sql import Window

    xs = list(range(24))
    true = [100 + 7 * x for x in xs]
    spiked = list(true)
    spiked[12] = 100000  # one corrupted rollup month
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, spiked)], "g string, x int, y long"
    )
    a, b = df.alias("a"), df.alias("b")
    pairs = a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.x") < F.col("b.x"))
    ).select(
        F.col("a.g").alias("g"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
        F.col("a.x").alias("x1"),
        F.col("b.x").alias("x2"),
    )
    wp = Window.partitionBy("g")
    rk = pairs.select(
        "g",
        "slope",
        F.row_number().over(wp.orderBy("slope", "x1", "x2")).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("cnt"),
    )
    (row,) = (
        rk.filter(
            (F.col("rk") >= F.expr("(cnt + 1) div 2"))
            & (F.col("rk") <= F.expr("(cnt + 2) div 2"))
        )
        .groupBy("g")
        .agg(((F.min("slope") + F.max("slope")) / F.lit(2.0)).alias("ts"))
        .collect()
    )
    assert abs(row["ts"] - 7.0) < 0.5, row
    # the OLS fit on the same spiked series is dragged far off
    import numpy as np

    ols = np.polyfit(np.array(xs, float), np.array(spiked, float), 1)[0]
    assert abs(ols - 7.0) > 20, ols


def test_bootstrap_ci_brackets_sample_mean_and_mult_is_poisson(spark):
    """Two sanity laws for bootstrap_ci_revenue: (1) the rank-selected
    band must bracket the full-sample mean for nearly every nation (the
    bootstrap distribution centers on the sample mean); (2) the integer
    threshold ladder must draw multiplicities with mean ~1 and the
    Poisson(1) frequency profile (the resample is unbiased)."""
    rows = q.REGISTRY["bootstrap_ci_revenue"].fn(spark, SF001).collect()
    assert len(rows) == 25
    inside = sum(1 for r in rows if r["ci_lo"] <= r["mean_value"] <= r["ci_hi"])
    assert inside >= 23, [
        (r["n_name"], r["ci_lo"], r["mean_value"], r["ci_hi"])
        for r in rows
        if not (r["ci_lo"] <= r["mean_value"] <= r["ci_hi"])
    ]
    for r in rows:
        assert r["ci_lo"] < r["ci_hi"], r

    import math

    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        _BOOT_GROUPS,
        _BOOT_SLICES,
        _poisson_mult_sql,
        _slice16_sql,
    )

    con = duckdb.connect()
    (n_draws, mean_m, *freqs) = con.execute(
        f"""
        WITH h AS (
            SELECT md5(concat(CAST(o.o_orderkey AS VARCHAR), ':',
                              CAST(g.g AS VARCHAR))) AS h
            FROM '{SF001}/orders.parquet' o,
                 (SELECT CAST(range AS INTEGER) AS g
                  FROM range({_BOOT_GROUPS})) g
        ),
        d AS (
            SELECT {_poisson_mult_sql(_slice16_sql('h', 'sl.s'))} AS m
            FROM h, (SELECT CAST(range AS INTEGER) AS s
                     FROM range({_BOOT_SLICES})) sl
        )
        SELECT COUNT(*), AVG(m),
               SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) / COUNT(*),
               SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) / COUNT(*),
               SUM(CASE WHEN m = 2 THEN 1 ELSE 0 END) / COUNT(*)
        FROM d
        """
    ).fetchone()
    assert n_draws >= 100_000
    assert abs(mean_m - 1.0) < 0.02, mean_m
    e1 = math.exp(-1.0)
    for got, want in zip(freqs, (e1, e1, e1 / 2)):
        assert abs(got - want) < 0.01, (freqs, want)


def test_seasonality_regression_matches_numpy_lstsq(spark):
    """The Cramer-solved (intercept, trend, q4_lift) must agree with an
    independently computed least-squares fit of the same design matrix."""
    rows = q.REGISTRY["revenue_seasonality_regression"].fn(spark, SF001).collect()
    assert rows
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT n.n_name,
               (EXTRACT(year FROM o.o_orderdate) - 1995) * 12
                   + EXTRACT(month FROM o.o_orderdate) - 1 AS t,
               CASE WHEN EXTRACT(month FROM o.o_orderdate) >= 10
                    THEN 1 ELSE 0 END AS q4,
               SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS y
        FROM '{SF001}/orders.parquet' o
        JOIN '{SF001}/customer.parquet' c ON o.o_custkey = c.c_custkey
        JOIN '{SF001}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2, 3
        """
    ).fetchdf()
    for r in rows:
        g = ref[ref["n_name"] == r["n_name"]]
        X = np.column_stack(
            [np.ones(len(g)), g["t"].to_numpy(float), g["q4"].to_numpy(float)]
        )
        beta, *_ = np.linalg.lstsq(X, g["y"].to_numpy(float), rcond=None)
        assert r["n_months"] == len(g)
        for got, want, tol in (
            (r["intercept_cents"], beta[0], 1e-2),
            (r["trend_cpm"], beta[1], 1e-3),
            (r["q4_lift_cents"], beta[2], 1e-2),
        ):
            assert abs(got - want) <= max(1e-6 * abs(want), tol), (r, beta)


def test_ks_drift_pvalue_boundary_guard(spark):
    """Round-18 regression pin for the r17 source_ks_drift hash-fail.

    The only non-exact arithmetic in the query is the Kolmogorov p-value:
    lambda^2 is now ROUNDed to 9 dp in BOTH engines (making the nine EXP
    inputs bit-identical), so the residual cross-engine divergence is the
    libm-vs-JVM exp last ulp (~1e-15 absolute).  For that divergence to
    ever flip a hashed digit, the unrounded p would have to sit within
    ~1e-15 of a ROUND(p, 6) half-way boundary, and the pre-pin lambda^2
    within ~1e-15 of a ROUND(lam2, 9) boundary.  This test asserts the
    sf0.01 data keeps a >=1e-9 guard distance on the p boundaries and
    >=1e-11 on the lam2 boundaries — six and four orders of magnitude of
    margin — recomputing both quantities from the query's own exact
    (n_docs, n_rest, d_num) outputs, independent of either engine's EXP.
    """
    import math

    rows = q.REGISTRY["source_ks_drift"].fn(spark, SF001).collect()
    assert len(rows) >= 2
    for r in rows:
        if r["n_rest"] == 0:
            continue
        nd, nr = float(r["n_docs"]), float(r["n_rest"])
        ks_d = float(r["d_num"]) / (nd * nr)
        ne = nd * nr / (nd + nr)
        lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * ks_d
        lam2 = lam * lam
        # guard on the 9-dp pin's own rounding boundary
        frac_l = abs(lam2 * 1e9 - math.floor(lam2 * 1e9) - 0.5) / 1e9
        assert frac_l >= 1e-11, (r["source"], lam2, frac_l)
        lam2r = round(lam2, 9)
        p_raw = 2.0 * sum(
            (-1) ** (j - 1) * math.exp(-2.0 * j * j * lam2r) for j in range(1, 10)
        )
        p = min(1.0, max(0.0, p_raw))
        # guard on the final ROUND(p, 6) boundary
        frac_p = abs(p * 1e6 - math.floor(p * 1e6) - 0.5) / 1e6
        assert frac_p >= 1e-9, (r["source"], p, frac_p)
        # and the emitted value is the round of the recomputed p
        assert abs(r["p_value"] - round(p, 6)) <= 1e-12, r
