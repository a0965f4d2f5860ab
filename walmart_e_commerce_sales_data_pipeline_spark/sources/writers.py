"""Sinks.

The reference writes per-table CSV files and optionally Postgres tables
(/root/reference/wallmart_pipeline.py:140-148).  This engine adds the
lakehouse-native partitioned parquet sink, which is the correct shape for
large fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv_single(df: DataFrame, path: str, header: bool = True) -> str:
    """Single-file CSV sink for *small* results (reference O15,
    wallmart_pipeline.py:140-143 ``to_csv(index=False)``).

    ``coalesce(1)`` funnels the write through one task — only correct for
    aggregates and samples.  Large outputs must use ``write_parquet``.
    """
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(path)
    return path


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> str:
    """Partitioned parquet sink — the engine-native format for big tables.

    ``partitionBy`` enables partition pruning for downstream readers (e.g.
    ``partitionBy("Month")`` for clean_sales-like tables lets a
    ``WHERE Month = 5`` query skip 11/12 of the files).
    """
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    return path


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
) -> str:
    """Partitioned ORC sink (engine extension) — same partition-pruning
    contract as ``write_parquet``; interoperates with Hive-ecosystem
    consumers that read ORC natively."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
    return path


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "overwrite",
    properties: dict[str, str] | None = None,
) -> None:
    """JDBC sink (reference O16, wallmart_pipeline.py:145-149 —
    ``to_sql(if_exists="replace")``; the reference's ``engine.dipose()``
    typo bug is not reproduced)."""
    df.write.mode(mode).jdbc(url, table, properties=properties or {})
