"""Product-analytics query shapes over the events stream: conversion
funnels and cohort retention — the composite event-time workloads a
training-data/analytics engine gets asked for daily.  Both are pure
window/aggregation compositions with exact SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .tables import table

FUNNEL_WINDOW_NS = 30 * 60 * 1_000_000_000  # purchase within 30 min of a view


@register(
    "events_funnel",
    oracle=f"""
    WITH v AS (SELECT user_id, epoch_ns(ts) AS t FROM events WHERE event_type = 'view'),
         p AS (SELECT user_id, epoch_ns(ts) AS t FROM events WHERE event_type = 'purchase'),
    converted AS (
        SELECT DISTINCT v.user_id
        FROM v JOIN p ON v.user_id = p.user_id
         AND p.t > v.t AND p.t - v.t <= {FUNNEL_WINDOW_NS}
    )
    SELECT (SELECT COUNT(DISTINCT user_id) FROM v) AS viewers,
           (SELECT COUNT(*) FROM converted)        AS converters,
           FLOOR((SELECT COUNT(*) FROM converted) * 1000.0
                 / (SELECT COUNT(DISTINCT user_id) FROM v) + 0.5) / 1000.0
               AS conversion_rate
    """,
    description="conversion funnel: users with a purchase within 30 min "
    "after a view (semi-join on the time-bounded pair predicate); rate "
    "scaled-int stable",
    tags=("event-time", "funnel"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id", F.col("ts_ns").alias("vt"))
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts_ns").alias("pt")
    )
    converted = (
        views.join(buys, "user_id")
        .filter((F.col("pt") > F.col("vt")) & (F.col("pt") - F.col("vt") <= FUNNEL_WINDOW_NS))
        .select("user_id")
        .distinct()
    )
    import math

    viewers = views.select("user_id").distinct().count()
    converters = converted.count()
    # floor(x+0.5), not round(): Python's round is half-to-even while the
    # oracle's ROUND is half-away — floor(x+0.5) ties identically in both.
    # Zero-viewer guard: a dataset without 'view' events yields rate 0.0
    # rather than a driver-side ZeroDivisionError.
    rate = 0.0 if viewers == 0 else math.floor(converters * 1000.0 / viewers + 0.5) / 1000.0
    return spark.createDataFrame(
        [(viewers, converters, rate)],
        "viewers: long, converters: long, conversion_rate: double",
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH activity AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events GROUP BY 1, 2
    ),
    cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY 1)
    SELECT STRFTIME(c.cohort_day, '%Y-%m-%d') AS cohort,
           CAST(date_diff('day', c.cohort_day, a.day) AS INTEGER) AS day_offset,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, a.day) <= 7
    GROUP BY 1, 2
    ORDER BY cohort, day_offset
    """,
    description="cohort retention: users grouped by first-active day, "
    "distinct actives per day-offset for the first week",
    tags=("event-time", "cohort"),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    activity = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    offset = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .filter(offset <= 7)
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            offset.alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("cohort", "day_offset")
    )
