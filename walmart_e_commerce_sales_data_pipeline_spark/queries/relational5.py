"""TPC-H shapes Q4 / Q7 / Q9 / Q10 / Q11 / Q12 / Q16 / Q17 / Q20,
adapted to the driver schema (no partsupp / shipmode / receipt-commit /
comment columns — substitutions documented per query).  With these, every
TPC-H query number 1–22 is covered in some shape across the registry
(Q1–Q3, Q5, Q6, Q8, Q13–Q15, Q18, Q19, Q21, Q22 live in
relational*.py/curation.py).

Money sums follow the house cent-exact rules (queries/stable.py):
term-by-term mirrored arithmetic, one ROUND at the end on values far
from decimal ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .stable import unit_sum, unit_sum_sql
from .tables import table


@register(
    "bilateral_trade_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           {unit_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE (sn.n_nationkey = 0 AND cn.n_nationkey = 1)
       OR (sn.n_nationkey = 1 AND cn.n_nationkey = 0)
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    description="TPC-H Q7 (volume shipping): bilateral revenue between two "
    "nations by direction and ship year — the disjunctive nation-pair "
    "predicate cannot push to either scan alone, so it evaluates as a "
    "post-join residual over the two broadcast nation dims while the "
    "orders/customer/supplier joins stay key-local; nationkey literals "
    "rather than names so the filter is a pushable integer comparison "
    "on both dim scans' side of the OR",
    tags=("join", "tpch", "star"),
)
def bilateral_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("s_nk") == 0) & (F.col("c_nk") == 1))
            | ((F.col("s_nk") == 1) & (F.col("c_nk") == 0))
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "product_profit_by_nation_year",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           {unit_sum_sql(
               "l_extendedprice * (1 - l_discount)"
               " - 0.1 * p_retailprice * l_quantity",
               "profit",
           )}
    FROM lineitem
    JOIN part     ON p_partkey  = l_partkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%1%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    description="TPC-H Q9 (product-type profit) adapted: the driver schema "
    "has no partsupp, so supply cost is proxied as 10% of retail price × "
    "quantity (stated, mirrored term-by-term in both engines); profit "
    "grouped by supplier nation and order year with the classic "
    "p_name LIKE part filter pushed to the part scan.  Plan shape: "
    "part/supplier/nation broadcast into the lineitem-orders join, one "
    "partial-aggregated shuffle on (nation, year)",
    tags=("join", "tpch", "star", "agg"),
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%1%"))
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(unit_sum(profit, "profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "returned_item_customers",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           {unit_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10 (returned-item reporting): top-20 customers by "
    "lost revenue on returned lineitems — global top-k AFTER a "
    "grouped aggregation, planned as TakeOrderedAndProject over the "
    "partial-aggregated shuffle (never a full sort); ordering ties on "
    "the ROUNDED revenue break by custkey so both engines emit the "
    "identical prefix",
    tags=("join", "tpch", "topk"),
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "priority_shipping_split",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY 1
    ORDER BY 1
    """,
    description="TPC-H Q12 (shipping modes and priority) adapted: the "
    "driver schema has no shipmode/receipt columns, so lines split by "
    "ship YEAR (with the sanity residual shipdate ≥ orderdate) and the "
    "classic urgent-vs-other CASE counting is kept verbatim — "
    "conditional aggregation over a fact-fact equi-join, both CASE "
    "branches computed in the same single-pass aggregate",
    tags=("join", "tpch", "agg", "conditional"),
)
def priority_shipping_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@register(
    "brand_supplier_counts",
    oracle="""
    SELECT p_brand,
           CAST(FLOOR(p_size / 10) AS INTEGER) AS size_band,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    )
    GROUP BY 1, 2
    ORDER BY supplier_cnt DESC, p_brand, size_band
    """,
    description="TPC-H Q16 (parts/supplier relationship) adapted: distinct "
    "suppliers per (brand, size band) via the lineitem linkage (no "
    "partsupp in the driver schema), EXCLUDING suppliers in bad standing "
    "through a NOT IN subquery — the null-aware anti-join machinery "
    "(Spark plans NOT IN as BroadcastNestedLoopJoin-free "
    "null-aware anti when the subquery fits a broadcast; the negative-"
    "acctbal supplier set exists in the testdata so the exclusion is "
    "exercised).  COUNT(DISTINCT) plans as the two-level expand "
    "aggregate, partial on (brand, band, suppkey)",
    tags=("join", "tpch", "subquery", "distinct"),
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    li.createOrReplaceTempView("_q16_lineitem")
    p.createOrReplaceTempView("_q16_part")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("_q16_supplier")
    return spark.sql(
        """
        SELECT p_brand,
               CAST(FLOOR(p_size / 10) AS INT) AS size_band,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM _q16_lineitem
        JOIN _q16_part ON p_partkey = l_partkey
        WHERE l_suppkey NOT IN (
            SELECT s_suppkey FROM _q16_supplier WHERE s_acctbal < 0
        )
        GROUP BY 1, 2
        ORDER BY supplier_cnt DESC, p_brand, size_band
        """
    )


@register(
    "order_priority_checking",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1994-01-01'
      AND o_orderdate <  TIMESTAMP '1995-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 (order priority checking) adapted: orders in a "
    "one-year window having at least one LATE lineitem (shipped > 60 days "
    "after ordering — the driver schema has no commit/receipt dates), "
    "counted per priority.  The correlated EXISTS plans as a LEFT SEMI "
    "hash join on orderkey; the date window pushes to the orders scan and "
    "the lateness predicate is the join residual (it references both "
    "sides)",
    tags=("join", "tpch", "subquery", "semi"),
)
def order_priority_checking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "important_supplier_share",
    oracle=f"""
    WITH sv AS (
        SELECT l_suppkey,
               {unit_sum_sql("l_extendedprice * (1 - l_discount)", "value")}
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT SUM(value) AS t FROM sv)
    SELECT s_name, sv.value,
           ROUND(sv.value / tot.t, 6) AS share
    FROM sv JOIN supplier ON s_suppkey = l_suppkey CROSS JOIN tot
    WHERE sv.value > 0.0105 * tot.t
    ORDER BY sv.value DESC, s_name
    """,
    description="TPC-H Q11 (important stock) adapted: the driver schema "
    "has no partsupp, so supplier importance is shipped value share — "
    "per-supplier revenue HAVING-filtered against a scalar fraction of "
    "the GLOBAL total (the Q11 signature shape: aggregate compared to a "
    "scalar subquery over the same aggregation).  The per-supplier values "
    "are first rounded to exact units (house cent-exact sum), so the "
    "global total, the threshold comparison and the share division start "
    "from identical integers in both engines; one shuffle for the "
    "supplier aggregate, 1-row total broadcast back",
    tags=("agg", "tpch", "subquery", "having"),
)
def important_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    sv = li.groupBy("l_suppkey").agg(
        unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "value")
    )
    tot = sv.agg(F.sum("value").alias("t"))
    return (
        sv.join(F.broadcast(s), sv.l_suppkey == s.s_suppkey)
        .crossJoin(F.broadcast(tot))
        .filter(F.col("value") > F.lit(0.0105) * F.col("t"))
        .select(
            "s_name",
            "value",
            F.round(F.col("value") / F.col("t"), 6).alias("share"),
        )
        .orderBy(F.desc("value"), "s_name")
    )


@register(
    "small_quantity_order_revenue",
    oracle="""
    SELECT ROUND(SUM(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l1
    JOIN part ON p_partkey = l1.l_partkey
    WHERE p_brand = 'Brand#1'
      AND l1.l_quantity < (
          SELECT 0.5 * AVG(l2.l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
      )
    """,
    description="TPC-H Q17 (small-quantity-order revenue): lineitems "
    "below half their part's average quantity, for one brand — the "
    "correlated scalar AVG decorrelates into a per-part aggregate joined "
    "back on partkey (Spark and DuckDB both rewrite it; the per-part "
    "averages divide identical doubles).  Revenue/7 rounds once at 2 dp; "
    "the brand filter pushes to the part scan and prunes the aggregate's "
    "probe side",
    tags=("join", "tpch", "subquery", "scalar"),
)
def small_quantity_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_q = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(avg_q, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "excess_shipping_suppliers",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE '%3%'
        )
          AND l_shipdate >= TIMESTAMP '1995-01-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 400
    )
    AND s_nationkey < 13
    ORDER BY s_name
    """,
    description="TPC-H Q20 (potential part promotion) adapted: suppliers "
    "who shipped more than a threshold quantity of pattern-matched parts "
    "since a date — the nested IN chain (supplier IN (aggregated lineitem "
    "IN (filtered part))) plans inside-out as a broadcast semi join into "
    "the lineitem aggregate, then a LEFT SEMI join into supplier; both "
    "the date and the nationkey predicates push to their scans",
    tags=("join", "tpch", "subquery", "semi", "nested"),
)
def excess_shipping_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 13)
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= "1995-01-01"
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%3%"))
    heavy = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 400)
    )
    return (
        s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
