"""Operator-library breadth, wave 3: window-frame suite (moving frames,
ntile/percent_rank/cume_dist, first/last_value), explicit GROUPING SETS,
as-of join (vs DuckDB's native ASOF JOIN as the oracle), bounded range
join, and TF-IDF scoring over the documents corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_pairs
from ..session import ensure_utc
from .registry import register
from .stable import unit_sum, unit_sum_sql
from .tables import table

# ---------------------------------------------------------------------------
# Window frames + ranking suite.
# ---------------------------------------------------------------------------


@register(
    "window_frames_suite",
    oracle="""
    WITH monthly AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)  AS y,
               CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY 1, 2
    )
    SELECT y, m, total,
           ROUND(SUM(total) OVER (ORDER BY y, m
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3,
           CAST(NTILE(4) OVER (ORDER BY total, y, m) AS INTEGER) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY total), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY total), 6) AS cume,
           FIRST_VALUE(total) OVER (ORDER BY y, m
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_total
    FROM monthly
    ORDER BY y, m
    """,
    description="window-frame suite: bounded moving frame, ntile, "
    "percent_rank, cume_dist, first_value with explicit frames "
    "(rounded monthly cents → frame sums tie-free, rank ratios exact)",
    tags=("window",),
)
def window_frames_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    by_time = Window.orderBy("y", "m")
    mov = by_time.rowsBetween(-2, Window.currentRow)
    run = by_time.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    by_total = Window.orderBy("total")
    return (
        monthly.select(
            "y",
            "m",
            "total",
            F.round(F.sum("total").over(mov), 2).alias("moving_sum3"),
            F.ntile(4).over(Window.orderBy("total", "y", "m")).alias("quartile"),
            F.round(F.percent_rank().over(by_total), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(by_total), 6).alias("cume"),
            F.first("total").over(run).alias("first_total"),
        )
        .orderBy("y", "m")
    )


# ---------------------------------------------------------------------------
# Explicit GROUPING SETS through the SQL API.
# ---------------------------------------------------------------------------


@register(
    "grouping_sets_explicit",
    oracle="""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*) AS n
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r_name), (n_name), ())
    ORDER BY region_name, nation_name
    """,
    description="explicit GROUPING SETS (disjoint set list — not a rollup "
    "prefix chain) via the SQL API",
    tags=("agg", "groupingsets", "sql-api"),
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "customer").createOrReplaceTempView("gs_customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("gs_nation")
    table(spark, sf_dir, "region").createOrReplaceTempView("gs_region")
    return spark.sql(
        """
        SELECT COALESCE(r_name, 'ALL') AS region_name,
               COALESCE(n_name, 'ALL') AS nation_name,
               COUNT(*) AS n
        FROM gs_customer c
        JOIN gs_nation n ON c.c_nationkey = n.n_nationkey
        JOIN gs_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        ORDER BY region_name, nation_name
        """
    )


# ---------------------------------------------------------------------------
# As-of join: latest order at-or-before each event, per user.
# ---------------------------------------------------------------------------


@register(
    "asof_join_latest_order",
    oracle="""
    WITH o AS (
        -- unique right rows per (key, time): keep the max orderkey per date
        SELECT o_custkey AS user_id, epoch_ns(o_orderdate) AS t,
               MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2
    ), e AS (SELECT user_id, epoch_ns(ts) AS t, event_id FROM events)
    SELECT e.user_id,
           COUNT(*) AS n_events,
           COUNT(o.o_orderkey) AS n_matched,
           COUNT(DISTINCT o.o_orderkey) AS distinct_orders,
           MAX(o.o_orderkey) AS latest_orderkey
    FROM e
    ASOF LEFT JOIN o ON e.user_id = o.user_id AND e.t >= o.t
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
    description="as-of join (operators.temporal.asof_join: union-merge + "
    "running last-ignorenulls window) — oracle is DuckDB's native ASOF "
    "LEFT JOIN; latest order at-or-before each event per user",
    tags=("join", "asof", "temporal"),
)
def asof_join_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts_ns", "event_id")
    orders = (
        table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            (F.unix_timestamp(F.col("o_orderdate").cast("timestamp")) * F.lit(1_000_000_000))
            .alias("t_ns"),
        )
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev, orders, key="user_id", left_time="ts_ns", right_time="t_ns",
        right_value="o_orderkey",
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.count("asof_o_orderkey").alias("n_matched"),
            F.countDistinct("asof_o_orderkey").alias("distinct_orders"),
            F.max("asof_o_orderkey").alias("latest_orderkey"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Bounded range join: event pairs within 60 s per user.
# ---------------------------------------------------------------------------

_RANGE_TOL_NS = 60 * 1_000_000_000


@register(
    "range_join_close_events",
    oracle=f"""
    WITH e AS (SELECT user_id, epoch_ns(ts) AS t, event_id FROM events)
    SELECT a.user_id, COUNT(*) AS close_pairs
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND ABS(a.t - b.t) <= {_RANGE_TOL_NS}
    GROUP BY a.user_id
    ORDER BY a.user_id
    """,
    description="bounded range join (operators.temporal.range_join_pairs: "
    "time-bucket pruning instead of a cross join) — event pairs within "
    "60 s for the same user",
    tags=("join", "range", "temporal"),
)
def range_join_close_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events").select("user_id", "ts_ns", "event_id")
    pairs = range_join_pairs(
        ev, key="user_id", time_col="ts_ns", id_col="event_id", tolerance=_RANGE_TOL_NS
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count("*").alias("close_pairs"))
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Correlated subquery: each order vs its own customer's average.
# ---------------------------------------------------------------------------


@register(
    "correlated_subquery_orders",
    oracle="""
    WITH cust_avg AS (
        SELECT o_custkey,
               ROUND(SUM(o_totalprice * 100.0)) / 100.0 / COUNT(*) AS avg_price
        FROM orders GROUP BY o_custkey
    )
    SELECT o.o_orderstatus, COUNT(*) AS n_above_own_avg
    FROM orders o
    WHERE o.o_totalprice > (
        SELECT avg_price FROM cust_avg c WHERE c.o_custkey = o.o_custkey
    )
    GROUP BY o.o_orderstatus
    ORDER BY o.o_orderstatus
    """,
    description="correlated scalar subquery (decorrelated by Catalyst into "
    "an aggregate+join): orders above their own customer's average price",
    tags=("subquery", "sql-api"),
)
def correlated_subquery_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("corr_orders")
    return spark.sql(
        """
        SELECT o.o_orderstatus, COUNT(*) AS n_above_own_avg
        FROM corr_orders o
        WHERE o.o_totalprice > (
            SELECT ROUND(SUM(i.o_totalprice * 100.0)) / 100.0 / COUNT(*)
            FROM corr_orders i WHERE i.o_custkey = o.o_custkey
        )
        GROUP BY o.o_orderstatus
        ORDER BY o.o_orderstatus
        """
    )


@register(
    "min_price_per_type",
    oracle="""
    SELECT p.p_type, p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
        SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type
    )
    ORDER BY p.p_type, p.p_partkey
    """,
    description="TPC-H Q2-style correlated MIN: parts priced at their type "
    "class's minimum (equality on exact cent values — no float hazard)",
    tags=("subquery", "sql-api"),
)
def min_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "part").createOrReplaceTempView("mp_part")
    return spark.sql(
        """
        SELECT p.p_type, p.p_partkey, p.p_retailprice
        FROM mp_part p
        WHERE p.p_retailprice = (
            SELECT MIN(p2.p_retailprice) FROM mp_part p2 WHERE p2.p_type = p.p_type
        )
        ORDER BY p.p_type, p.p_partkey
        """
    )


@register(
    "exists_not_exists_combo",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS finished_only_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'O')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="TPC-H Q21-style EXISTS + NOT EXISTS combination (semi-join "
    "chained with anti-join on differently-filtered builds)",
    tags=("subquery", "join"),
)
def exists_not_exists_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    f_orders = orders.filter(F.col("o_orderstatus") == "F")
    o_orders = orders.filter(F.col("o_orderstatus") == "O")
    return (
        customer.join(f_orders, customer.c_custkey == f_orders.o_custkey, "left_semi")
        .join(o_orders, F.col("c_custkey") == o_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("finished_only_customers"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Lateral explode (UNNEST) over array columns.
# ---------------------------------------------------------------------------


@register(
    "lateral_explode_embeddings",
    oracle="""
    SELECT CAST(i AS INTEGER) AS pos, COUNT(*) AS n,
           ROUND(CAST(MIN(embedding[i + 1]) AS DOUBLE), 6) AS min_val,
           ROUND(CAST(MAX(embedding[i + 1]) AS DOUBLE), 6) AS max_val
    FROM embeddings, UNNEST(range(8)) AS u(i)
    GROUP BY i
    ORDER BY pos
    """,
    description="lateral explode with position (posexplode / UNNEST WITH "
    "ORDINALITY): per-dimension min/max over the first 8 embedding dims",
    tags=("array", "explode"),
)
def lateral_explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("pos", "val"))
        .filter(F.col("pos") < 8)
        .groupBy("pos")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(F.col("val").cast("double")), 6).alias("min_val"),
            F.round(F.max(F.col("val").cast("double")), 6).alias("max_val"),
        )
        .orderBy("pos")
    )


# ---------------------------------------------------------------------------
# TF-IDF: most distinctive tokens per language.
# ---------------------------------------------------------------------------


@register(
    "tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    tf AS (SELECT lang, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.lang, tf.token,
               ROUND(tf.tf * LN(n.n_docs / df.df), 4) AS tfidf
        FROM tf JOIN df ON tf.token = df.token, n
    )
    SELECT lang, token, tfidf, CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT lang, token, tfidf,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY tfidf DESC, token) AS rk
        FROM scored
    )
    WHERE rk <= 5
    ORDER BY lang, rk
    """,
    description="TF-IDF top-5 distinctive tokens per language: term "
    "frequency per lang × ln(N/df) inverse document frequency — pure "
    "joins/aggregations, no MLlib state",
    tags=("text", "tfidf"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", "lang", F.explode(tokenize("text")).alias("token")
    )
    tf = tok.groupBy("lang", "token").agg(F.count("*").alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "token").select(
        "lang",
        "token",
        F.round(F.col("tf") * F.log(F.lit(n_docs) / F.col("df")), 4).alias("tfidf"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "token", "tfidf", "rk")
        .orderBy("lang", "rk")
    )


_TSR_REV_SQL = unit_sum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")


@register(
    "top_supplier_revenue",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_TSR_REV_SQL}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    description="TPC-H Q15-style top supplier: quarterly revenue view, "
    "scalar MAX subquery selects the leader(s); the 1-row max and the "
    "supplier dim both broadcast, so the only shuffle is the revenue "
    "aggregation itself (map-side partials over l_suppkey); ties on the "
    "rounded revenue surface every co-leader in both engines",
    tags=("tpch", "subquery", "view"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_rev"))
    sup = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.total_revenue == top.max_rev)
        .join(F.broadcast(sup), rev.supplier_no == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q14_REV = "l_extendedprice * (1 - l_discount)"


@register(
    "promo_revenue_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS y,
           CAST(EXTRACT(month FROM l_shipdate) AS INTEGER) AS m,
           {unit_sum_sql(f"CASE WHEN p_type = 'PROMO' THEN {_Q14_REV} ELSE 0 END", "promo_revenue")},
           {unit_sum_sql(_Q14_REV, "total_revenue")},
           ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {_Q14_REV} ELSE 0 END))
               * 100.0 / ROUND(SUM({_Q14_REV})) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY y, m
    ORDER BY y, m
    """,
    description="TPC-H Q14-style promo revenue share per ship month: "
    "fact-dim join (part broadcasts) + conditional aggregation; the pct is "
    "a ratio of two integer-rounded sums so one IEEE division gives both "
    "engines identical bits; session TZ pinned UTC for the timestamp "
    "year/month extraction",
    tags=("tpch", "conditional-agg"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ensure_utc(spark)
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_shipdate"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m")
        )
        .agg(
            unit_sum(promo, "promo_revenue"),
            unit_sum(rev, "total_revenue"),
        )
        .withColumn(
            "promo_pct",
            F.col("promo_revenue") * 100.0 / F.col("total_revenue"),
        )
        .orderBy("y", "m")
    )


@register(
    "trailing_spend_range_frame",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER w, 2) AS spend_30d,
           COUNT(*) OVER w AS n_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
    """,
    description="RANGE-interval window frame (vs the ROWS frames "
    "elsewhere): per-order trailing 30-day spend and order count per "
    "customer — Spark expresses the interval bound as rangeBetween over "
    "epoch seconds, which admits identical peer-row semantics to the SQL "
    "INTERVAL frame; one shuffle on o_custkey; the frame sum is "
    "cent-valued so ROUND(...,2) is tie-free (queries/stable.py analysis)",
    tags=("window", "range-frame"),
)
def trailing_spend_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    # o_orderdate is TIMESTAMP_NTZ: no direct numeric cast; NTZ -> TZ cast
    # is an identity under UTC — pinned globally in session.get_spark, so
    # the driver's local TZ can't stretch/shrink the 30-day window across
    # DST and no per-query session mutation is needed.
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("n_30d"),
    ).orderBy("o_orderkey")


@register(
    "market_share_by_year",
    oracle="""
    WITH rev AS (
        SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS y,
               sn.n_name AS supp_nation,
               ROUND(SUM(l.l_extendedprice * (1 - l.l_discount))) AS revenue
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN region r    ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY y, sn.n_name
    )
    SELECT y, supp_nation, revenue,
           revenue / SUM(revenue) OVER (PARTITION BY y) AS mkt_share
    FROM rev
    ORDER BY y, supp_nation
    """,
    description="TPC-H Q8-style market share: 7-relation join tree "
    "(lineitem⋈orders shuffle; customer/nation×2/region/supplier all "
    "broadcast — nation joined twice under different roles), revenue per "
    "(year, supplier nation) with per-year share via an unpartitioned-by-"
    "nation window.  Bit-stable share: unit_sum yields exact integer "
    "revenue doubles, the window total sums exact integers, and IEEE "
    "division of exact values is deterministic across engines — no "
    "rounding of the ratio needed (queries/stable.py analysis)",
    tags=("join", "window", "agg", "flagship"),
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .stable import unit_sum

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    customer = table(spark, sf_dir, "customer")
    cn = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supplier = table(spark, sf_dir, "supplier")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(cn), customer.c_nationkey == cn.n_nationkey)
        .join(F.broadcast(region), cn.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(sn), supplier.s_nationkey == F.col("sn_nationkey"))
        .groupBy(
            F.year("o_orderdate").alias("y"),
            "supp_nation",
        )
        .agg(unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )
    w = Window.partitionBy("y")
    return (
        rev.withColumn("mkt_share", F.col("revenue") / F.sum("revenue").over(w))
        .orderBy("y", "supp_nation")
    )


_DORMANT_CUTOFF = "2000-06-01"


@register(
    "dormant_customer_balance",
    oracle=f"""
    WITH avg_bal AS (
        SELECT ROUND(SUM(c_acctbal * 100.0)) / 100.0 / COUNT(*) AS a
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           COUNT(*) AS n_cust,
           ROUND(SUM(c_acctbal * 100.0)) / 100.0 AS total_bal
    FROM customer, avg_bal
    WHERE c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= DATE '{_DORMANT_CUTOFF}')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    description="TPC-H Q22-style global sales opportunity: customers with "
    "above-average positive account balance and NO order since "
    f"{_DORMANT_CUTOFF} (dormant high-value accounts), aggregated per "
    "nation. Composition the suite lacked: scalar subquery (1-row "
    "broadcast) -> theta filter -> LEFT ANTI join against the filtered "
    "fact -> aggregate. Scale shape: the anti join is a hash join keyed "
    "on custkey (the date predicate pushes to the orders scan first); "
    "the balance average uses the cent-exact ROUND(SUM*100)/100/COUNT "
    "pattern (queries/stable.py) so both engines compare against the "
    "identical double",
    tags=("relational", "tpch", "anti-join", "subquery"),
)
def dormant_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .stable import cent_avg

    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        cent_avg("c_acctbal", "a")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(_DORMANT_CUTOFF).cast("timestamp")
    ).select(F.col("o_custkey").alias("c_custkey"))
    dormant = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, "c_custkey", "left_anti")
    )
    return (
        dormant.groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_cust"),
            (F.round(F.sum(F.col("c_acctbal") * F.lit(100.0)), 0) / F.lit(100.0)).alias(
                "total_bal"
            ),
        )
        .orderBy("c_nationkey")
    )
