"""Operator-library breadth, wave 2 (SURVEY.md §7 Phase 2): TPC-H-shaped
multi-join analytics, HAVING, scalar subqueries (through the SQL API),
pivot, exact percentiles, regex/math scalar functions, date arithmetic,
map/array/JSON functions, right/cross joins, and explicit null ordering.

Cross-engine float discipline follows queries/stable.py; notable extras:
- revenue-ranked top-k orders sort on the *rounded* revenue with a key
  tiebreak, so the LIMIT cutoff cannot flip on last-ulp differences;
- the scalar-subquery threshold uses the bit-deterministic average so both
  engines compare against the identical double;
- DuckDB sorts NULLS LAST on ASC by default while Spark sorts NULLS FIRST —
  the null-ordering query pins it explicitly on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import register
from .stable import cent_avg, cent_avg_sql, cent_sum, cent_sum_sql, unit_sum, unit_sum_sql
from .tables import table

# ---------------------------------------------------------------------------
# TPC-H Q6 shape: pure filter + scalar aggregate (pushdown showcase).
# ---------------------------------------------------------------------------


@register(
    "forecast_revenue",
    oracle=f"""
    SELECT {unit_sum_sql("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6-style forecast revenue: conjunctive filter fully "
    "pushed into the scan + scalar aggregate",
    tags=("agg", "filter"),
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            unit_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: 3-way join + revenue top-k with a stable cutoff.
# ---------------------------------------------------------------------------


@register(
    "shipping_priority_top10",
    oracle=f"""
    SELECT o.o_orderkey,
           {unit_sum_sql("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND l.l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
    description="TPC-H Q3-style shipping priority: 3-way join, group by "
    "order, top-10 by revenue (rounded before ranking so the LIMIT cutoff "
    "is ulp-stable, keyed tiebreak)",
    tags=("join", "sort", "limit", "flagship"),
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# HAVING (post-aggregation filter), TPC-H Q18 shape.
# ---------------------------------------------------------------------------


@register(
    "large_quantity_orders",
    oracle="""
    SELECT l_orderkey, SUM(l_quantity) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 150
    ORDER BY total_qty DESC, l_orderkey
    """,
    description="TPC-H Q18-style HAVING: post-aggregation predicate on the "
    "grouped sum (integer-valued quantities → exact)",
    tags=("agg", "having"),
)
def large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .orderBy(F.col("total_qty").desc(), "l_orderkey")
    )


# ---------------------------------------------------------------------------
# Scalar subquery through the SQL API (the engine's SQL surface).
# ---------------------------------------------------------------------------


@register(
    "above_average_orders",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n_above
    FROM orders
    WHERE o_totalprice > (
        SELECT {cent_avg_sql("o_totalprice", "a").replace(" AS a", "")} FROM orders
    )
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    description="scalar subquery via spark.sql(): orders above the global "
    "average price (bit-deterministic average so both engines compare "
    "against identical bits)",
    tags=("subquery", "sql-api"),
)
def above_average_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_above
        FROM orders_v
        WHERE o_totalprice > (
            SELECT ROUND(SUM(o_totalprice * 100.0)) / 100.0 / COUNT(*) FROM orders_v
        )
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# Pivot (wide cross-tab).
# ---------------------------------------------------------------------------


@register(
    "pivot_status_by_year",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS y,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders
    GROUP BY 1
    ORDER BY y
    """,
    description="pivot: order counts per year wide by status (Spark "
    "groupBy().pivot() with explicit value list)",
    tags=("pivot", "agg"),
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").alias("y"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .select(
            "y",
            F.coalesce("F", F.lit(0)).alias("F"),
            F.coalesce("O", F.lit(0)).alias("O"),
            F.coalesce("P", F.lit(0)).alias("P"),
        )
        .orderBy("y")
    )


# ---------------------------------------------------------------------------
# Exact percentiles / median.
# ---------------------------------------------------------------------------


@register(
    "price_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    description="exact interpolated percentiles (== DuckDB quantile_cont "
    "linear interpolation), rounded at 4 dp — computed by the distributed "
    "histogram ladder (operators.percentiles.exact_group_percentiles) "
    "rather than the sort-buffer percentile() builtin: the builtin "
    "materializes every value of a group in ONE aggregation buffer (fatal "
    "when a group holds billions of rows at 100 TB; also serializes on "
    "the 3 return-flag buffers here — measured slower than the ladder "
    "even at sf0.1), while the ladder's state is a per-group value "
    "histogram + index-range bracketing, bit-identical to the builtin "
    "(pinned in tests/test_percentiles.py)",
    tags=("agg", "percentile"),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.percentiles import exact_group_percentiles

    li = table(spark, sf_dir, "lineitem")
    # on_overflow="error": oracle-checked vs DuckDB's exact quantile_cont,
    # so a silent approx fallback must fail loudly instead of diverging.
    pct = exact_group_percentiles(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        [0.5, 0.9, 0.99],
        on_overflow="error",
    )
    return pct.select(
        "l_returnflag",
        F.round("p_0", 4).alias("p50"),
        F.round("p_1", 4).alias("p90"),
        F.round("p_2", 4).alias("p99"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Regex + math scalar functions.
# ---------------------------------------------------------------------------


@register(
    "regex_math_functions",
    oracle="""
    SELECT regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           COUNT(*) AS n,
           ROUND(AVG(SQRT(p_retailprice)), 6) AS avg_sqrt_price,
           CAST(MAX(CEIL(LN(p_retailprice))) AS BIGINT) AS max_ceil_ln,
           MIN(ABS(p_size - 25)) AS min_abs_size_dist
    FROM part
    GROUP BY 1
    ORDER BY first_word
    """,
    description="regexp_extract grouping + sqrt/ln/ceil/abs math suite "
    "(sqrt is IEEE-exact; ln feeds ceil so last-ulp differences cannot "
    "flip the integer result away from non-boundary values)",
    tags=("scalar", "regex", "math"),
)
def regex_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = table(spark, sf_dir, "part")
    return (
        part.groupBy(F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(F.sqrt("p_retailprice")), 6).alias("avg_sqrt_price"),
            F.max(F.ceil(F.log("p_retailprice"))).alias("max_ceil_ln"),
            F.min(F.abs(F.col("p_size") - 25)).alias("min_abs_size_dist"),
        )
        .orderBy("first_word")
    )


# ---------------------------------------------------------------------------
# Date arithmetic.
# ---------------------------------------------------------------------------


@register(
    "ship_delay_buckets",
    oracle="""
    SELECT CAST(FLOOR(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate) / 365.0)
                AS INTEGER) AS years_since_1995,
           COUNT(*) AS n,
           CAST(MIN(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate)) AS INTEGER)
               AS min_days,
           CAST(MAX(date_diff('day', TIMESTAMP '1995-01-01', l_shipdate)) AS INTEGER)
               AS max_days
    FROM lineitem
    GROUP BY 1
    ORDER BY years_since_1995
    """,
    description="date arithmetic: datediff-day buckets from an epoch date "
    "(reference O7/O8 date handling generalized)",
    tags=("scalar", "date"),
)
def ship_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    days = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date"))
    return (
        li.groupBy(F.floor(days / 365.0).cast("int").alias("years_since_1995"))
        .agg(
            F.count("*").alias("n"),
            F.min(days).alias("min_days"),
            F.max(days).alias("max_days"),
        )
        .orderBy("years_since_1995")
    )


# ---------------------------------------------------------------------------
# Map / array / JSON functions over semistructured columns.
# ---------------------------------------------------------------------------


@register(
    "map_array_functions",
    oracle="""
    SELECT label,
           COUNT(*) AS n,
           CAST(MAX(len(embedding)) AS INTEGER) AS dims,
           ROUND(CAST(MIN(embedding[1]) AS DOUBLE), 6) AS min_first,
           ROUND(CAST(MAX(embedding[1]) AS DOUBLE), 6) AS max_first
    FROM embeddings
    GROUP BY label
    ORDER BY label
    """,
    description="array functions over the embedding column: size, "
    "element_at, min/max (order-free → exact cross-engine)",
    tags=("array", "scalar"),
)
def map_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    first = F.element_at("embedding", 1).cast("double")
    return (
        emb.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.max(F.size("embedding")).alias("dims"),
            F.round(F.min(first), 6).alias("min_first"),
            F.round(F.max(first), 6).alias("max_first"),
        )
        .orderBy("label")
    )


@register(
    "from_json_map",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod7,
           COUNT(*) AS n,
           COUNT(DISTINCT user_id) AS users
    FROM events
    GROUP BY 1
    ORDER BY k_mod7
    """,
    description="from_json into MapType + map element access (multimodal/"
    "semistructured column contract: props string → map<string,long>)",
    tags=("json", "map"),
)
def from_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.groupBy((m["k"] % 7).alias("k_mod7"))
        .agg(F.count("*").alias("n"), F.countDistinct("user_id").alias("users"))
        .orderBy("k_mod7")
    )


# ---------------------------------------------------------------------------
# Right outer + cross joins (completing §2.2 coverage).
# ---------------------------------------------------------------------------


@register(
    "join_right_outer",
    oracle="""
    SELECT n.n_name,
           COUNT(DISTINCT c.c_custkey) AS customers,
           COUNT(o.o_orderkey) AS orders
    FROM orders o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
    description="right outer join: every customer kept, orders optional",
    tags=("join",),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "right")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("c_custkey").alias("customers"),
            F.count("o_orderkey").alias("orders"),
        )
        .orderBy("n_name")
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    ORDER BY r.r_name, s.o_orderstatus
    """,
    description="cross join: small-dimension cartesian grid",
    tags=("join", "cross"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = table(spark, sf_dir, "region")
    status = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return (
        region.select("r_name")
        .crossJoin(status)
        .orderBy("r_name", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Explicit null ordering (Spark defaults NULLS FIRST on ASC; DuckDB LAST).
# ---------------------------------------------------------------------------


@register(
    "null_ordering",
    oracle="""
    WITH monthly AS (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)  AS y,
               CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS m,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders GROUP BY 1, 2
    )
    SELECT y, m, LAG(total) OVER (ORDER BY y, m) AS prev_total
    FROM monthly
    ORDER BY prev_total ASC NULLS FIRST, y, m
    LIMIT 5
    """,
    description="explicit NULLS FIRST ordering (engine defaults differ: "
    "Spark ASC→nulls first, DuckDB ASC→nulls last)",
    tags=("sort", "null-handling"),
)
def null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
    w = Window.orderBy("y", "m")
    return (
        monthly.withColumn("prev_total", F.lag("total").over(w))
        .select("y", "m", "prev_total")
        .orderBy(F.col("prev_total").asc_nulls_first(), "y", "m")
        .limit(5)
    )
