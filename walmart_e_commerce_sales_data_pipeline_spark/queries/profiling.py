"""Dataset profiling: per-column statistics in one scan.

A training-data pipeline's first question about a new 100 TB corpus is
"what's in it" — null rates, cardinalities, value ranges per column.  The
profile is a single full-scan aggregation (every stat is an algebraic
aggregate, so map-side partials apply and the shuffle carries one row per
partition), then `stack` unpivots the 1×N wide row into the long
(column, stats) form.  No per-column scans: 5 columns, one job.

Numeric min/max are computed numerically *then* cast to string (lexical
min of "10" vs "9" would diverge between engines and surprise users).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register
from .tables import table

_COLS = ["doc_id", "text", "lang", "source", "n_chars"]

_ORACLE_ARMS = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           COUNT(*) - COUNT({c}) AS n_nulls,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_s,
           CAST(MAX({c}) AS VARCHAR) AS max_s
    FROM documents
    """
    for c in _COLS
)


@register(
    "profile_documents",
    oracle=f"SELECT * FROM ({_ORACLE_ARMS}) ORDER BY column_name",
    description="single-scan per-column profile of the documents table "
    "(null count, exact cardinality, min/max) unpivoted via stack; every "
    "stat is algebraic so the scan aggregates map-side and the shuffle is "
    "one partial row per partition per distinct-sketch key",
    tags=("profiling", "quality"),
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    aggs = []
    for c in _COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    arms = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in _COLS
    )
    return wide.selectExpr(
        f"stack({len(_COLS)}, {arms}) AS "
        "(column_name, n_nulls, n_distinct, min_s, max_s)"
    ).orderBy("column_name")
