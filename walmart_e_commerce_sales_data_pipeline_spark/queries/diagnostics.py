"""Pipeline-health diagnostics (extension surface, SURVEY.md §2.11):
data-quality auditing and trend estimation.

A 100 TB ingest runs a referential-integrity / constraint audit as a gate
before anything downstream trusts the tables, and fits cheap closed-form
trend lines over aggregated series for drift monitoring.  Both are pure
relational plans:

- ``referential_integrity_audit``: one conditional-aggregation pass per
  fact table (orphan foreign keys via LEFT join + null-probe, NOT an
  anti-join per check; null/range constraint violations as CASE sums in
  the same pass; primary-key duplication from one per-key aggregate), so
  the whole audit costs two joins and three scans regardless of how many
  checks ride along — the audit shape that still works when lineitem is
  the 100 TB table.
- ``revenue_trend_slope``: per-nation ordinary-least-squares slope of
  monthly revenue via sufficient statistics (n, Σx, Σy, Σxy, Σx²) — the
  classic distributed regression: two hash aggregates, no iteration, no
  driver-side math.  All sums stay exact integers (month index × exact
  cent totals) until one final deterministic double combination, so the
  slope is bit-identical cross-engine (queries/stable.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .tables import table


@register(
    "referential_integrity_audit",
    oracle="""
    WITH li_j AS (
        SELECT l.l_shipdate, l.l_extendedprice, l.l_discount,
               o.o_orderkey AS ok
        FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    li_agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS orphan,
               CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS nullship,
               CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nonpos,
               CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS baddisc
        FROM li_j
    ),
    pk AS (
        SELECT CAST(SUM(c) AS BIGINT) AS total,
               CAST(SUM(c) - COUNT(*) AS BIGINT) AS violations
        FROM (
            SELECT COUNT(*) AS c FROM lineitem
            GROUP BY l_orderkey, l_linenumber
        )
    ),
    o_agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS total,
               CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS violations
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    checks AS (
        SELECT 'lineitem_orphan_order' AS check_name,
               orphan AS violations, total FROM li_agg
        UNION ALL
        SELECT 'lineitem_null_shipdate', nullship, total FROM li_agg
        UNION ALL
        SELECT 'lineitem_nonpositive_price', nonpos, total FROM li_agg
        UNION ALL
        SELECT 'lineitem_discount_out_of_range', baddisc, total FROM li_agg
        UNION ALL
        SELECT 'lineitem_duplicate_pk', violations, total FROM pk
        UNION ALL
        SELECT 'orders_orphan_customer', violations, total FROM o_agg
    )
    SELECT check_name, violations, total,
           ROUND(violations / total, 6) AS viol_rate
    FROM checks ORDER BY check_name
    """,
    description="referential-integrity and constraint audit over the fact "
    "tables: foreign-key orphans (lineitem->orders, orders->customer), "
    "null / non-positive / out-of-range constraint violations, and "
    "primary-key duplication, each reported as (violations, total, rate). "
    "Scale shape: orphans come from LEFT joins + null-probes folded into "
    "ONE conditional-aggregation pass per fact table (never an anti-join "
    "per check — adding a check adds a CASE column, not a scan), the "
    "PK-duplication check is a single per-key partial aggregate, and "
    "every branch reduces to a 1-row frame before the 6-row UNION, so "
    "the audit costs two shuffle joins + three scans however many "
    "constraints ride along",
    tags=("audit", "join", "agg", "quality"),
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")

    li_j = li.select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    ).join(
        o.select(F.col("o_orderkey").alias("ok")),
        F.col("l_orderkey") == F.col("ok"),
        "left",
    )
    one = F.lit(1)
    zero = F.lit(0)
    li_agg = li_j.agg(
        F.count(one).cast("long").alias("total"),
        F.sum(F.when(F.col("ok").isNull(), one).otherwise(zero))
        .cast("long")
        .alias("orphan"),
        F.sum(F.when(F.col("l_shipdate").isNull(), one).otherwise(zero))
        .cast("long")
        .alias("nullship"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, one).otherwise(zero))
        .cast("long")
        .alias("nonpos"),
        F.sum(F.when(~F.col("l_discount").between(0, 1), one).otherwise(zero))
        .cast("long")
        .alias("baddisc"),
    )
    li_checks = li_agg.selectExpr(
        "stack(4, 'lineitem_orphan_order', orphan,"
        "         'lineitem_null_shipdate', nullship,"
        "         'lineitem_nonpositive_price', nonpos,"
        "         'lineitem_discount_out_of_range', baddisc)"
        " AS (check_name, violations)",
        "total",
    )
    pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(one).alias("c"))
        .agg(
            (F.sum("c") - F.count(one)).cast("long").alias("violations"),
            F.sum("c").cast("long").alias("total"),
        )
        .select(
            F.lit("lineitem_duplicate_pk").alias("check_name"),
            "violations",
            "total",
        )
    )
    o_checks = (
        o.select("o_custkey")
        .join(
            c.select(F.col("c_custkey").alias("ck")),
            F.col("o_custkey") == F.col("ck"),
            "left",
        )
        .agg(
            F.sum(F.when(F.col("ck").isNull(), one).otherwise(zero))
            .cast("long")
            .alias("violations"),
            F.count(one).cast("long").alias("total"),
        )
        .select(
            F.lit("orders_orphan_customer").alias("check_name"),
            "violations",
            "total",
        )
    )
    return (
        li_checks.select("check_name", "violations", "total")
        .union(pk)
        .union(o_checks)
        .withColumn(
            "viol_rate", F.round(F.col("violations") / F.col("total"), 6)
        )
        .orderBy("check_name")
    )


@register(
    "revenue_trend_slope",
    oracle="""
    WITH monthly AS (
        SELECT n.n_name,
               (EXTRACT(year FROM o.o_orderdate) - 1995) * 12
                   + EXTRACT(month FROM o.o_orderdate) - 1 AS x,
               CAST(ROUND(SUM(o.o_totalprice * 100.0)) AS BIGINT) AS y
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, x
    ),
    stats AS (
        SELECT n_name,
               CAST(COUNT(*) AS BIGINT) AS m,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM monthly GROUP BY n_name
    )
    SELECT n_name, m AS n_months,
           ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
               AS slope_cents_per_month,
           ROUND((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                 / (CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4)
               AS intercept_cents
    FROM stats ORDER BY n_name
    """,
    description="per-nation OLS slope of the monthly revenue series via "
    "sufficient statistics: slope = (n*Sxy - Sx*Sy)/(n*Sxx - Sx^2) over "
    "(month index, exact cent total) points — distributed closed-form "
    "regression, the drift-monitoring primitive (pinned against an "
    "independent numpy polyfit in tests/test_diagnostics.py).  Exactness: "
    "x is an integer month index and y an exact integer cent total "
    "(cent_sum pattern), so every sufficient statistic is an exact "
    "integer; the only floating arithmetic is the final slope/intercept "
    "combination, mirrored term-by-term through DOUBLE casts so both "
    "engines emit identical bits at any magnitude (integer->double "
    "conversion and IEEE multiply are deterministic even past 2^53, "
    "where staying in BIGINT would instead overflow).  Scale shape: two "
    "hash aggregates (monthly rollup, then per-group stats) behind two "
    "broadcast-able dimension joins; no iteration, no driver math, "
    "series length bounded by the calendar",
    tags=("agg", "regression", "join"),
)
def revenue_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    x = (F.year("o_orderdate") - F.lit(1995)) * F.lit(12) + F.month(
        "o_orderdate"
    ) - F.lit(1)
    monthly = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", x.alias("x"))
        .agg(
            F.round(F.sum(F.col("o_totalprice") * F.lit(100.0)), 0)
            .cast("long")
            .alias("y")
        )
    )
    stats = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    md = F.col("m").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd = F.col("sxx").cast("double")
    den = md * sxxd - sxd * sxd
    return stats.select(
        "n_name",
        F.col("m").alias("n_months"),
        F.round((md * sxyd - sxd * syd) / den, 4).alias(
            "slope_cents_per_month"
        ),
        F.round((syd * sxxd - sxd * sxyd) / den, 4).alias("intercept_cents"),
    ).orderBy("n_name")
