"""Bit-stable cross-engine aggregate patterns.

The driver compares Spark results against DuckDB via an exact value hash, so
every float that passes through aggregation must come out bit-identical from
both engines.  Floating sums are order-dependent in the last ulps, and the
engines' ROUND implementations disagree exactly at decimal ties (Spark
rounds the shortest-decimal representation HALF_UP; DuckDB scales and
``nearbyint``s) — observed in practice: avg=27.565 → 27.56 vs 27.57.

The testdata money columns are cent-valued (exact 2-decimal) and quantities
are integers, which admits patterns with *no* tie risk:

- ``cent_sum``: ROUND(SUM(x), 2) — the true sum is a multiple of 0.01, the
  fp error is ≪ 0.005, and 0.005 ties are unreachable from multiples of
  0.01, so both engines land on the same 2-decimal value → same bits.
- ``cent_avg``: ROUND(SUM(x*100)) / 100 / COUNT(*) — the numerator becomes
  the exact integer cent total (identical double in both engines), and IEEE
  division is deterministic, so the average is bit-identical *without* a
  final rounding step that could tie.
- ``int_avg``: SUM(int)/COUNT(*) — exact integer numerator, deterministic
  division.
- ``unit_sum``: ROUND(SUM(expr)) for derived products (price×(1−disc)…)
  whose true granularity is 1e-4/1e-6: integer ties are unreachable
  (probability ≤ 1e-4) and fp error stays far below 0.5.

Each pattern exists twice — a pure-string SQL builder (usable at module
import time inside oracle f-strings) and a Column builder (must be called
with an active SparkSession, i.e. inside the query function body).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- SQL snippet builders (pure strings, safe at import time) --------------


def cent_sum_sql(expr: str, alias: str) -> str:
    return f"ROUND(SUM({expr}), 2) AS {alias}"


def cent_avg_sql(expr: str, alias: str) -> str:
    return f"ROUND(SUM(({expr}) * 100.0)) / 100.0 / COUNT(*) AS {alias}"


def int_avg_sql(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT) / COUNT(*) AS {alias}"


def unit_sum_sql(expr: str, alias: str) -> str:
    return f"ROUND(SUM({expr})) AS {alias}"


# --- Spark Column builders (require an active session) ---------------------


def cent_sum(col: Column | str, alias: str) -> Column:
    return F.round(F.sum(col), 2).alias(alias)


def cent_avg(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.round(F.sum(c * F.lit(100.0)), 0) / F.lit(100.0) / F.count(F.lit(1))).alias(alias)


def int_avg(col: Column | str, alias: str) -> Column:
    return (F.sum(col) / F.count(F.lit(1))).alias(alias)


def unit_sum(col: Column | str, alias: str) -> Column:
    return F.round(F.sum(col), 0).alias(alias)
