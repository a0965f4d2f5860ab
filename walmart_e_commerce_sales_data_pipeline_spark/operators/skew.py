"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join splitting (on by default in this engine's sessions) handles
most skew at runtime; these operators are the *plan-level* tools for the
cases AQE can't fix — a hot aggregation key, or a join where one key holds
a double-digit percentage of the fact table.

Semantics are preserved exactly: salting only changes the physical
distribution.  Tests assert salted results equal the unsalted plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], buckets: int) -> Column:
    """Deterministic row salt in [0, buckets) from row-distinguishing
    columns (not the group key — same-key rows must spread)."""
    return F.pmod(F.xxhash64(*cols), F.lit(buckets))


def salted_group_avg(
    df: DataFrame,
    key: str,
    value: str,
    salt_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase average with a salted first phase.

    Phase 1 aggregates (key, salt) — the hot key's rows spread over
    ``buckets`` reducers; phase 2 merges the tiny per-salt partials.
    Returns (key, avg_value) identical to ``groupBy(key).avg(value)``
    (sum/count merge is exact; the division happens once at the end).
    """
    partial = (
        df.withColumn("_salt", _salt(salt_cols, buckets))
        .groupBy(key, "_salt")
        .agg(F.sum(value).alias("_sum"), F.count(value).alias("_cnt"))
    )
    return partial.groupBy(key).agg(
        (F.sum("_sum") / F.sum("_cnt")).alias(f"avg_{value}")
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated ``buckets`` times.

    The join key becomes (key, salt): the hot key's big-side rows spread
    over ``buckets`` tasks, each meeting one replica of the small side.
    Row-for-row identical to ``big.join(small, key)``; costs a
    ``buckets``× blow-up of the *small* side only.
    """
    big_salted = big.withColumn("_salt", _salt(salt_cols, buckets))
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>"))
    )
    return big_salted.join(small_replicated, [key, "_salt"]).drop("_salt")
