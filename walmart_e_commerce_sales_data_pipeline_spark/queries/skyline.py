"""Skyline (Pareto-frontier) operator — multi-criteria dominance filtering.

``pareto_frontier_parts`` returns the parts no other part beats on BOTH
price (lower is better) and size (higher is better): q dominates p iff
q.price <= p.price AND q.size >= p.size with at least one strict.  The
skyline is the classic "best trade-offs" operator (Börzsönyi et al.,
ICDE'01) that SQL engines express only as a quadratic NOT EXISTS
self-join — which is exactly what the DuckDB oracle runs, while the Spark
side runs the sort-based linear plan a 100 TB input needs.

Why the Spark plan is NOT the quadratic join: for a 2-D skyline, p is
dominated iff

    max(size | price < p.price)  >= p.size        (strictly cheaper side)
 or max(size | price = p.price)  >  p.size        (equal-price side)

so dominance collapses to running/group maxima over the price order.  The
strictly-cheaper running max is computed WITHOUT a global single-task
sort via prefix-scan decomposition: $1 price buckets partition the window
(in-bucket running max over an integer-cent RANGE frame ending at -1, so
ties never see each other), and a bucket-level summary table carries the
cross-bucket prefix max.  The only unpartitioned window runs over that
summary — bounded by the PRICE DOMAIN, not the row count (TPC-H's pricing
formula keeps p_retailprice in ~[900, 2100] at every scale factor, i.e.
<= ~1,201 one-dollar buckets), the same bounded-side argument as the
calendar-bounded monthly windows (tests/test_plan_sweep.py whitelist).
Every corpus-sized stage is a hash aggregate or a bucket-partitioned
window; the equal-price max is a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .tables import table


@register(
    "pareto_frontier_parts",
    oracle="""
    WITH pts AS (
        SELECT p_partkey,
               CAST(ROUND(p_retailprice * 100.0) AS BIGINT) AS price_cents,
               p_size
        FROM part
    )
    SELECT p.p_partkey, p.price_cents, p.p_size
    FROM pts p
    WHERE NOT EXISTS (
        SELECT 1 FROM pts q
        WHERE q.price_cents <= p.price_cents
          AND q.p_size >= p.p_size
          AND (q.price_cents < p.price_cents OR q.p_size > p.p_size)
    )
    ORDER BY p.price_cents, p.p_partkey
    """,
    description="2-D skyline over part (minimize retail price, maximize "
    "size): the parts no competitor dominates on both criteria — the "
    "multi-criteria shortlist operator (Borzsonyi ICDE'01).  The oracle "
    "runs the definitional quadratic NOT-EXISTS; the Spark plan is the "
    "sort-based LINEAR skyline: dominance reduces to (a) the running "
    "max size over strictly-cheaper rows — an integer-cent RANGE-frame "
    "window prefix-scan-decomposed over $1 price buckets so no "
    "corpus-sized stage funnels through one task — and (b) the max "
    "size at equal price, a plain groupBy; ties on both dims are kept "
    "(dominance requires one strict edge).  The one unpartitioned "
    "window ranks the bucket SUMMARY, bounded by the price domain "
    "(<= ~1,201 one-dollar buckets under the TPC-H pricing formula at "
    "any SF), never the parts",
    tags=("window", "skyline", "dominance"),
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pts = table(spark, sf_dir, "part").select(
        "p_partkey",
        F.round(F.col("p_retailprice") * F.lit(100.0), 0)
        .cast("long")
        .alias("price_cents"),
        "p_size",
        F.expr(
            "cast(round(p_retailprice * 100.0, 0) as bigint) div 100"
        ).alias("bucket"),
    )
    # (a) in-bucket running max over STRICTLY cheaper rows: integer-cent
    # RANGE frame ending at -1 keeps equal prices out of each other's
    # frames.
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("price_cents")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    # bucket summary: max size per bucket, then prefix max over PRIOR
    # buckets (the cross-bucket half of the scan; domain-bounded input).
    bmax = pts.groupBy("bucket").agg(F.max("p_size").alias("bucket_max"))
    w_b = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = bmax.select(
        "bucket", F.max("bucket_max").over(w_b).alias("prev_bucket_max")
    )
    # (b) equal-price max: plain aggregate on the exact price.
    eq = pts.groupBy("price_cents").agg(
        F.max("p_size").alias("eq_max_size")
    )
    scanned = (
        pts.withColumn("in_bucket_max", F.max("p_size").over(w_in))
        .join(prev, "bucket")
        .join(eq, "price_cents")
        .withColumn(
            "cheaper_max",
            F.greatest(
                F.coalesce("in_bucket_max", F.lit(-1)),
                F.coalesce("prev_bucket_max", F.lit(-1)),
            ),
        )
    )
    return (
        scanned.filter(
            (F.col("cheaper_max") < F.col("p_size"))
            & (F.col("eq_max_size") == F.col("p_size"))
        )
        .select("p_partkey", "price_cents", "p_size")
        .orderBy("price_cents", "p_partkey")
    )
