"""Core relational operator queries (SURVEY.md §2.1-§2.6, plus the Phase-2
general operator library from §7): scans, every join type, the aggregate
suite, window functions, sorts/limits, set ops, rollup/cube, scalar
string/date/math/conditional functions.

Each query is the Spark-first expression of one operator class, written so
Catalyst can do its job: filters sit next to scans (pushdown), projections
are explicit (pruning), aggregations are declarative (partial+final
hash agg), and join strategies are left to AQE unless a side is provably
dimension-sized (then an explicit ``broadcast`` hint).

Float-valued aggregates use the bit-stable cross-engine patterns from
``stable.py`` so the driver's exact value-hash comparison against DuckDB
cannot flake on summation order or ROUND tie-breaking.

Reference anchors (the single instance each class generalizes):
- scans:      /root/reference/wallmart_pipeline.py:52-53 (O1/O2)
- inner join: /root/reference/wallmart_pipeline.py:59    (O4)
- mean agg:   /root/reference/wallmart_pipeline.py:84-86,117 (O5/O12)
- filter/project: /root/reference/wallmart_pipeline.py:92-95 (O10/O11)
- round/rename:   /root/reference/wallmart_pipeline.py:118-119 (O13/O14)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .stable import (
    cent_avg,
    cent_avg_sql,
    cent_sum,
    cent_sum_sql,
    int_avg,
    int_avg_sql,
    unit_sum,
    unit_sum_sql,
)
from .tables import table

# ---------------------------------------------------------------------------
# Flagship: TPC-H-Q1-shaped pricing summary (scan → filter → group agg).
# ---------------------------------------------------------------------------

_DISC_PRICE_SQL = "l_extendedprice * (1 - l_discount)"
_CHARGE_SQL = "l_extendedprice * (1 - l_discount) * (1 + l_tax)"

_PS_SUM_QTY_SQL = cent_sum_sql("l_quantity", "sum_qty")
_PS_BASE_SQL = cent_sum_sql("l_extendedprice", "sum_base_price")
_PS_DISC_SQL = unit_sum_sql(_DISC_PRICE_SQL, "sum_disc_price")
_PS_CHARGE_SQL = unit_sum_sql(_CHARGE_SQL, "sum_charge")
_PS_AVG_QTY_SQL = int_avg_sql("l_quantity", "avg_qty")
_PS_AVG_PRICE_SQL = cent_avg_sql("l_extendedprice", "avg_price")
_PS_AVG_DISC_SQL = cent_avg_sql("l_discount", "avg_disc")


@register(
    "pricing_summary",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        {_PS_SUM_QTY_SQL},
        {_PS_BASE_SQL},
        {_PS_DISC_SQL},
        {_PS_CHARGE_SQL},
        {_PS_AVG_QTY_SQL},
        {_PS_AVG_PRICE_SQL},
        {_PS_AVG_DISC_SQL},
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1-style pricing summary: filtered scan + 8-way hash agg",
    tags=("agg", "filter", "flagship"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            cent_sum("l_quantity", "sum_qty"),
            cent_sum("l_extendedprice", "sum_base_price"),
            unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            unit_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            int_avg("l_quantity", "avg_qty"),
            cent_avg("l_extendedprice", "avg_price"),
            cent_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scalar whole-column aggregates (reference O5).
# ---------------------------------------------------------------------------

_SM_QTY_SQL = int_avg_sql("l_quantity", "avg_qty")
_SM_PRICE_SQL = cent_avg_sql("l_extendedprice", "avg_price")
_SM_DISC_SQL = cent_avg_sql("l_discount", "avg_disc")


@register(
    "scalar_means",
    oracle=f"SELECT {_SM_QTY_SQL}, {_SM_PRICE_SQL}, {_SM_DISC_SQL} FROM lineitem",
    description="whole-column means in one job (reference O5: 3 means, 1 scan)",
    tags=("agg",),
)
def scalar_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        int_avg("l_quantity", "avg_qty"),
        cent_avg("l_extendedprice", "avg_price"),
        cent_avg("l_discount", "avg_disc"),
    )


# ---------------------------------------------------------------------------
# Null imputation with column means (reference O5/O6, two-pass literal fill).
# ---------------------------------------------------------------------------

_IMPUTE_V_AVG_SQL = cent_avg_sql("v", "avg_v")


@register(
    "impute_group_avg",
    oracle=f"""
    WITH nulled AS (
        SELECT event_type,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    ), m AS (
        -- cent-exact deterministic fill value (see stable.py): integer cents
        -- via floor(x + 0.5) so both engines break the tie identically
        SELECT FLOOR(ROUND(SUM(v * 100.0)) / COUNT(v) + 0.5) / 100.0 AS fill
        FROM nulled
    ), filled AS (
        SELECT event_type, COALESCE(v, m.fill) AS v FROM nulled, m
    )
    SELECT event_type,
           {_IMPUTE_V_AVG_SQL},
           COUNT(*) AS n
    FROM filled
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="fill-with-mean imputation then group avg (reference O6 semantics: "
    "mean computed once over the whole table, injected as a literal)",
    tags=("agg", "null-handling"),
)
def impute_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    nulled = ev.withColumn(
        "v", F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("value"))
    )
    # Two-pass literal imputation (SURVEY.md O6): one tiny job for the mean,
    # then a constant-folded coalesce — never an unpartitioned window.  The
    # fill value is cent-rounded with floor(x+0.5) so the literal is
    # bit-identical to the oracle's.
    fill = nulled.select(
        (
            F.floor(F.round(F.sum(F.col("v") * 100.0), 0) / F.count("v") + 0.5) / 100.0
        ).alias("fill")
    ).first()["fill"]
    return (
        nulled.withColumn("v", F.coalesce(F.col("v"), F.lit(fill)))
        .groupBy("event_type")
        .agg(cent_avg("v", "avg_v"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Joins — every type (reference implements only inner, O4; SURVEY.md §2.2).
# ---------------------------------------------------------------------------

_JCO_REV_SQL = cent_sum_sql("o.o_totalprice", "total_revenue")


@register(
    "join_customer_orders",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS order_cnt,
           {_JCO_REV_SQL}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="inner equi-join fact⋈dim + group agg; dim side broadcast",
    tags=("join", "agg"),
)
def join_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    # customer is the dimension side: broadcast it so the fact table never
    # shuffles (at 100 TB the orders shuffle would dominate the query).
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("order_cnt"), cent_sum("o_totalprice", "total_revenue"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c.c_mktsegment,
           COUNT(DISTINCT c.c_custkey) AS customers,
           COUNT(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN c.c_custkey END)
                                       AS customers_without_orders,
           COUNT(o.o_orderkey)         AS orders
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="left outer join preserving unmatched customers",
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    j = customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.countDistinct(
                F.when(F.col("o_orderkey").isNull(), F.col("c_custkey"))
            ).alias("customers_without_orders"),
            F.count("o_orderkey").alias("orders"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS big_spenders
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="left-semi join: customers with ≥1 large order (EXISTS)",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("big_spenders"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS inactive_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="left-anti join: customers with no orders (NOT EXISTS)",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("inactive_customers"))
        .orderBy("c_mktsegment")
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT CAST(COALESCE(c.k, s.k) AS INTEGER) AS nationkey,
           COALESCE(c.cust_cnt, 0) AS cust_cnt,
           COALESCE(s.supp_cnt, 0) AS supp_cnt
    FROM (SELECT c_nationkey AS k, COUNT(*) AS cust_cnt FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS k, COUNT(*) AS supp_cnt FROM supplier GROUP BY 1) s
    ON c.k = s.k
    ORDER BY nationkey
    """,
    description="full outer join of two aggregates (nations with only customers "
    "or only suppliers survive)",
    tags=("join", "agg"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count("*").alias("cust_cnt"))
    )
    supp = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count("*").alias("supp_cnt"))
    )
    return (
        cust.join(supp, "k", "full_outer")
        .select(
            F.col("k").cast("int").alias("nationkey"),
            F.coalesce("cust_cnt", F.lit(0)).alias("cust_cnt"),
            F.coalesce("supp_cnt", F.lit(0)).alias("supp_cnt"),
        )
        .orderBy("nationkey")
    )


_RR_REV_SQL = unit_sum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")


@register(
    "regional_revenue",
    oracle=f"""
    SELECT r.r_name,
           {_RR_REV_SQL},
           COUNT(*) AS item_cnt
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    description="TPC-H Q5-style star join (fact⋈fact⋈3 dims) with date filter",
    tags=("join", "agg", "flagship"),
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    # Star-join shape: the only shuffle is lineitem⋈orders (both grow with
    # SF); the three dimension joins broadcast.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("item_cnt"),
        )
        .orderBy("r_name")
    )


# ---------------------------------------------------------------------------
# Window functions (absent from the reference, SURVEY.md §2.4).
# ---------------------------------------------------------------------------


@register(
    "window_topk_orders",
    oracle="""
    SELECT o_orderstatus, CAST(rk AS INTEGER) AS rk, o_orderkey, o_totalprice
    FROM (
        SELECT o_orderstatus, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    )
    WHERE rk <= 3
    ORDER BY o_orderstatus, rk
    """,
    description="top-k per group via row_number window (deterministic tiebreak)",
    tags=("window",),
)
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderstatus", "rk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderstatus", "rk")
    )


@register(
    "window_running_total",
    oracle="""
    WITH monthly AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)  AS y,
               CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
               ROUND(SUM(o_totalprice), 2) AS monthly_total
        FROM orders GROUP BY 1, 2
    )
    SELECT y, m, monthly_total,
           ROUND(SUM(monthly_total) OVER (ORDER BY y, m), 2) AS running_total,
           LAG(monthly_total) OVER (ORDER BY y, m)           AS prev_total
    FROM monthly
    ORDER BY y, m
    """,
    description="running sum + lag over ordered monthly aggregates",
    tags=("window", "agg"),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("monthly_total"))
    # Unpartitioned window is safe *here*: input is the already-aggregated
    # ~80-row monthly table, not the fact table (SURVEY.md O6 warning).
    w = Window.orderBy("y", "m")
    return (
        monthly.withColumn("running_total", F.round(F.sum("monthly_total").over(w), 2))
        .withColumn("prev_total", F.lag("monthly_total").over(w))
        .orderBy("y", "m")
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (absent from the reference).
# ---------------------------------------------------------------------------


@register(
    "top10_expensive_items",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    description="global top-k: Spark runs TakeOrderedAndProject, never a full sort",
    tags=("sort", "limit"),
)
def top10_expensive_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set operations (absent from the reference).
# ---------------------------------------------------------------------------


@register(
    "set_operations",
    oracle="""
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT c_custkey FROM a UNION SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT c_custkey FROM a INTERSECT SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT c_custkey FROM a EXCEPT SELECT c_custkey FROM b)
    ORDER BY op
    """,
    description="union / intersect / except cardinalities over two key sets",
    tags=("setop",),
)
def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    u = a.union(b).distinct().selectExpr("'union' AS op")
    i = a.intersect(b).selectExpr("'intersect' AS op")
    # subtract == SQL EXCEPT (set semantics); exceptAll().distinct() would
    # diverge from the oracle whenever `a` held duplicates of a `b` row.
    e = a.subtract(b).selectExpr("'except' AS op")
    return (
        u.unionAll(i).unionAll(e).groupBy("op").agg(F.count("*").alias("n")).orderBy("op")
    )


# ---------------------------------------------------------------------------
# Distinct aggregation.
# ---------------------------------------------------------------------------


@register(
    "distinct_counts",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS orders,
           COUNT(DISTINCT o_custkey) AS distinct_customers
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    description="count-distinct per group (expand + two-phase agg in Spark)",
    tags=("agg",),
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("orders"),
            F.countDistinct("o_custkey").alias("distinct_customers"),
        )
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Grouping sets: rollup & cube.
# ---------------------------------------------------------------------------


@register(
    "rollup_customer_geo",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*)                 AS cust_cnt,
           ROUND(SUM(c_acctbal), 2) AS acctbal_sum
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    ORDER BY region_name, nation_name
    """,
    description="ROLLUP(region, nation) subtotal hierarchy",
    tags=("agg", "groupingsets"),
)
def rollup_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    j = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("cust_cnt"), F.round(F.sum("c_acctbal"), 2).alias("acctbal_sum"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "cust_cnt",
            "acctbal_sum",
        )
        .orderBy("region_name", "nation_name")
    )


_CUBE_AVG_SQL = cent_avg_sql("o_totalprice", "avg_price")


@register(
    "cube_order_status",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*)                          AS n,
           {_CUBE_AVG_SQL}
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY status, priority
    """,
    description="CUBE(status, priority) full cross-tab of subtotals",
    tags=("agg", "groupingsets"),
)
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), cent_avg("o_totalprice", "avg_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "avg_price",
        )
        .orderBy("status", "priority")
    )


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math / conditional (SURVEY.md §2.5).
# ---------------------------------------------------------------------------

_STR_AVG_LEN_SQL = int_avg_sql("LENGTH(p_name)", "avg_name_len")


@register(
    "string_functions",
    oracle=f"""
    SELECT p_brand,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE p_name LIKE '%widget%') AS widgets,
           {_STR_AVG_LEN_SQL},
           MIN(UPPER(SUBSTRING(p_name, 1, 5))) AS first_name_prefix,
           MAX(CONCAT(p_type, ':', CAST(p_size AS VARCHAR))) AS max_type_size
    FROM part
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    description="string scalar suite: LIKE/length/upper/substring/concat",
    tags=("scalar", "string"),
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return (
        part.groupBy("p_brand")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("p_name").contains("widget"), 1)).alias("widgets"),
            int_avg(F.length("p_name"), "avg_name_len"),
            F.min(F.upper(F.substring("p_name", 1, 5))).alias("first_name_prefix"),
            F.max(F.concat_ws(":", F.col("p_type"), F.col("p_size").cast("string"))).alias(
                "max_type_size"
            ),
        )
        .orderBy("p_brand")
    )


@register(
    "date_functions",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)    AS y,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS q,
           COUNT(*)                                            AS n,
           ROUND(SUM(o_totalprice), 2)                         AS total
    FROM orders
    GROUP BY 1, 2
    ORDER BY y, q
    """,
    description="date-part extraction (year/quarter) + group agg (reference O8 generalization)",
    tags=("scalar", "date"),
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.quarter("o_orderdate").alias("q")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("y", "q")
    )


_AS_AVG_QTY_SQL = int_avg_sql("l_quantity", "avg_qty")


@register(
    "agg_suite",
    oracle=f"""
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 2)        AS sum_qty,
           MIN(l_quantity)                  AS min_qty,
           MAX(l_quantity)                  AS max_qty,
           {_AS_AVG_QTY_SQL},
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price,
           COUNT(DISTINCT l_partkey)        AS distinct_parts,
           COUNT(*)                         AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="aggregate suite: sum/min/max/avg/stddev/count-distinct",
    tags=("agg",),
)
def agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            int_avg("l_quantity", "avg_qty"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


_TIER_AVG_SQL = cent_avg_sql("o_totalprice", "avg_price")


@register(
    "case_when_tiers",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 150000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END        AS tier,
           COUNT(*)                    AS n,
           {_TIER_AVG_SQL}
    FROM orders
    GROUP BY 1
    ORDER BY tier
    """,
    description="conditional bucketing (CASE WHEN) + agg",
    tags=("scalar", "conditional"),
)
def case_when_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 150000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
    )
    return (
        orders.groupBy(tier.alias("tier"))
        .agg(F.count("*").alias("n"), cent_avg("o_totalprice", "avg_price"))
        .orderBy("tier")
    )


@register(
    "union_all_monthly",
    oracle="""
    SELECT 'orders' AS source, STRFTIME(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'events' AS source, STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m') AS ym, COUNT(*) AS n
    FROM events GROUP BY 2
    ORDER BY source, ym
    """,
    description="UNION ALL of two differently-sourced aggregates",
    tags=("setop", "date"),
)
def union_all_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    ev = table(spark, sf_dir, "events")
    o = orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym")).agg(
        F.count("*").alias("n")
    ).select(F.lit("orders").alias("source"), "ym", "n")
    e = ev.groupBy(F.date_format("ts", "yyyy-MM").alias("ym")).agg(
        F.count("*").alias("n")
    ).select(F.lit("events").alias("source"), "ym", "n")
    return o.unionAll(e).orderBy("source", "ym")
