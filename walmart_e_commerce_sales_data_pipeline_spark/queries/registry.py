"""Query registry backing the driver contract (``__spark_entry__.py``).

Every operator this engine claims (SURVEY.md §2) registers here as a named
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle SQL string
over the same parquet tables.  The driver runs both sides at sf0.01 and
compares row-count + schema + order-insensitive value hash, so:

- every computed column is aliased identically in both;
- doubles that pass through arithmetic/aggregation are rounded on both
  sides (sum/avg of doubles is order-dependent at the last ulp; rounding to
  a coarse decimal makes both engines emit the same bits);
- Spark int-typed results (``month()``, ``row_number()``) are CAST in the
  oracle SQL (DuckDB EXTRACT/window functions return BIGINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None → driver runs a weaker rows-only check
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name, fn, oracle, description, tags)
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in REGISTRY.values()}


def oracle_map() -> dict[str, str]:
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}
