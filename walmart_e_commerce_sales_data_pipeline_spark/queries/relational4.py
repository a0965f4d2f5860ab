"""TPC-H Q5/Q13-shaped analytics (extension surface, SURVEY.md §2.6).

Two more classic OLAP join topologies over the driver testdata, rounding
out the Q1/Q3/Q8/Q14/Q15 analogues in relational3.py:

- ``local_supplier_volume`` (Q5): the multi-way star join with the extra
  *cross-dimension* equality (customer nation == supplier nation) that no
  single join edge expresses — the canonical "is your join tree right"
  benchmark query.
- ``customer_order_histogram`` (Q13): LEFT join with an extra ON-clause
  predicate (which must NOT degenerate into a WHERE — customers with zero
  qualifying orders stay, with count 0), then a histogram over the counts.

Reference parity note: the reference engine (wallmart_pipeline.py:76-118)
only performs single-key inner merges; these shapes are part of the
beyond-reference OLAP surface mandated by SURVEY.md §2.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .stable import unit_sum, unit_sum_sql
from .tables import table

_Q5_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT cn.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS y,
           {unit_sum_sql(_Q5_REV, "revenue")}
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation cn  ON s.s_nationkey = cn.n_nationkey
    JOIN region r   ON cn.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY nation, y
    ORDER BY nation, y
    """,
    description="TPC-H Q5-style local supplier volume: revenue per "
    "(nation, year) restricted to orders whose customer and supplier sit "
    "in the same nation — the cross-dimension equality is applied as a "
    "post-join filter on two broadcast dims, so the only shuffle is "
    "lineitem⋈orders; date range + region filters push into the scans; "
    "unit_sum keeps the revenue doubles bit-stable across engines",
    tags=("tpch", "join", "flagship"),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp_ntz"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    supplier = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("nation", "y")
    )


@register(
    "customer_order_histogram",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey,
               COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
               ON c.c_custkey = o.o_custkey
              AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13-style customer order-count distribution: LEFT "
    "join with the priority exclusion in the ON clause (customers whose "
    "orders are all urgent stay with count 0 — a WHERE would wrongly drop "
    "them), COUNT(o_orderkey) ignores the null-extended rows, then a "
    "second aggregation histograms the counts; both aggs are map-side "
    "partial, all columns exact integers — nothing to stabilize",
    tags=("tpch", "join", "agg"),
)
def customer_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer").select("c_custkey")
    orders = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    c_orders = (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "set_operations_all",
    oracle="""
    WITH a AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
         b AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT 'intersect_all' AS op, COUNT(*) AS n
    FROM (SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
    UNION ALL
    SELECT 'except_all' AS op, COUNT(*) AS n
    FROM (SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
    ORDER BY op
    """,
    description="bag-semantics set operations (INTERSECT ALL / EXCEPT ALL "
    "via intersectAll/exceptAll): multiplicities min(m,n) and max(m-n,0) "
    "per key — genuinely different results from the distinct variants in "
    "set_operations whenever a key repeats (customers place many orders); "
    "Spark plans both as an aggregate of per-side counts plus a "
    "generate/replicate step — one shuffle per side, no join; each side's "
    "cardinality is a *global* one-row aggregate (not a groupBy on the "
    "label), so an empty INTERSECT ALL / EXCEPT ALL still yields its row "
    "with n=0 exactly like the oracle's scalar COUNT(*) subqueries — a "
    "groupBy would silently drop the empty group (data-dependent row-count "
    "divergence, latent on current testdata)",
    tags=("setop",),
)
def set_operations_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    i = (
        a.intersectAll(b)
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "n")
    )
    e = (
        a.exceptAll(b)
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "n")
    )
    return i.unionAll(e).orderBy("op")


@register(
    "orders_rfm_segments",
    oracle="""
    WITH now_ref AS (SELECT MAX(o_orderdate) AS now_ts FROM orders),
    per_cust AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate),
                         (SELECT now_ts FROM now_ref)) AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders
        GROUP BY o_custkey
    ),
    bounds AS (
        SELECT
          percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days) AS r25,
          percentile_disc(0.5)  WITHIN GROUP (ORDER BY recency_days) AS r50,
          percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days) AS r75,
          percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS f25,
          percentile_disc(0.5)  WITHIN GROUP (ORDER BY frequency) AS f50,
          percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS f75,
          percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary_cents) AS m25,
          percentile_disc(0.5)  WITHIN GROUP (ORDER BY monetary_cents) AS m50,
          percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary_cents) AS m75
        FROM per_cust
    ),
    scored AS (
        SELECT monetary_cents,
               1 + CAST(recency_days > r25 AS INTEGER)
                 + CAST(recency_days > r50 AS INTEGER)
                 + CAST(recency_days > r75 AS INTEGER) AS r_q,
               1 + CAST(frequency < f75 AS INTEGER)
                 + CAST(frequency < f50 AS INTEGER)
                 + CAST(frequency < f25 AS INTEGER) AS f_q,
               1 + CAST(monetary_cents < m75 AS INTEGER)
                 + CAST(monetary_cents < m50 AS INTEGER)
                 + CAST(monetary_cents < m25 AS INTEGER) AS m_q
        FROM per_cust CROSS JOIN bounds
    )
    SELECT r_q, f_q, m_q,
           COUNT(*) AS n_customers,
           CAST(SUM(monetary_cents) AS BIGINT) / 100.0 AS total_monetary
    FROM scored
    GROUP BY r_q, f_q, m_q
    ORDER BY r_q, f_q, m_q
    """,
    description="RFM customer segmentation: per-customer recency (days "
    "since last order, against the global max order date broadcast as a "
    "1-row join), frequency, and lifetime value in exact integer cents "
    "(ROUND(x*100) per order — cent-valued doubles cannot tie at .5, the "
    "cent_avg numerator argument in stable.py — so the measure is "
    "bit-identical across engines, closing the float-sum NTILE hazard); "
    "quartiling is value-threshold, not rank-based: the three quartile "
    "boundaries per measure come from one exact percentile_disc aggregate "
    "(SQL-standard smallest-value-with-CDF>=p, verified identical in "
    "Spark and DuckDB), broadcast to every row, and bucketed with pure "
    "integer comparisons — zero unpartitioned windows, zero global "
    "sorts; the plan is two key-shuffles (custkey agg, 64-key segment "
    "rollup) plus two broadcast singletons, and the boundary aggregate "
    "is map-side partial (value-count maps), so nothing funnels "
    "|customers| rows through one task at any scale",
    tags=("analytics", "segmentation"),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    now_ref = orders.agg(F.max("o_orderdate").alias("now_ts"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("long")
            ).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(now_ref))
        .withColumn("recency_days", F.datediff("now_ts", "last_order"))
    )
    bounds = per_cust.agg(
        *[
            F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {c})"
            ).alias(f"{a}{int(p * 100)}")
            for c, a in [
                ("recency_days", "r"),
                ("frequency", "f"),
                ("monetary_cents", "m"),
            ]
            for p in (0.25, 0.5, 0.75)
        ]
    )

    def _asc_bucket(col: str, lo: str, mid: str, hi: str):
        return (
            F.lit(1)
            + (F.col(col) > F.col(lo)).cast("int")
            + (F.col(col) > F.col(mid)).cast("int")
            + (F.col(col) > F.col(hi)).cast("int")
        )

    def _desc_bucket(col: str, lo: str, mid: str, hi: str):
        return (
            F.lit(1)
            + (F.col(col) < F.col(hi)).cast("int")
            + (F.col(col) < F.col(mid)).cast("int")
            + (F.col(col) < F.col(lo)).cast("int")
        )

    scored = per_cust.crossJoin(F.broadcast(bounds)).select(
        "monetary_cents",
        _asc_bucket("recency_days", "r25", "r50", "r75").alias("r_q"),
        _desc_bucket("frequency", "f25", "f50", "f75").alias("f_q"),
        _desc_bucket("monetary_cents", "m25", "m50", "m75").alias("m_q"),
    )
    return (
        scored.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum("monetary_cents") / F.lit(100.0)).alias("total_monetary"),
        )
        .orderBy("r_q", "f_q", "m_q")
    )
