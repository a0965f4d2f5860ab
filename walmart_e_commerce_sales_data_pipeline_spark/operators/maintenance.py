"""Lakehouse table maintenance over plain parquet: MERGE-style upsert and
small-file compaction.

Without a transactional table format (Delta/Iceberg) in this environment,
upsert is read → anti-join → union → atomic directory swap.  The operator
keeps MERGE semantics (update matched keys, insert unmatched) and the swap
keeps readers from ever seeing a half-written table.  On a real lakehouse
deployment the same call sites swap to ``MERGE INTO`` / ``OPTIMIZE``.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
) -> None:
    """MERGE semantics onto a parquet directory: rows in ``updates`` replace
    target rows with the same key; new keys are appended.

    Write-audit-swap: the merged result lands fully in a staging directory
    before any change to the target, so readers never observe a *partial*
    table.  The swap itself is two renames — POSIX offers no atomic
    directory exchange — so there is a milliseconds-wide window where the
    target path is absent (a concurrent reader would get PATH_NOT_FOUND
    and should retry), and a crash inside the window leaves the data
    intact in a ``.old-*`` sibling for manual recovery.  True atomic
    MERGE needs a transactional table format (Delta/Iceberg ``MERGE
    INTO``), which is the drop-in replacement for this call site.
    """
    target = Path(target_path)
    staging = target.with_name(f".{target.name}.staging-{uuid.uuid4().hex[:8]}")

    if target.exists():
        current = spark.read.parquet(str(target))
        keys = updates.select(key).distinct()
        surviving = current.join(keys, key, "left_anti")
        merged = surviving.unionByName(updates)
    else:
        merged = updates

    merged.write.parquet(str(staging))
    if target.exists():
        old = target.with_name(f".{target.name}.old-{uuid.uuid4().hex[:8]}")
        target.rename(old)
        staging.rename(target)
        shutil.rmtree(old)
    else:
        staging.rename(target)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_partitions: int,
    sort_by: str | None = None,
) -> int:
    """Rewrite a parquet directory into ``target_partitions`` files.

    The small-files problem: streaming/incremental writers produce many
    tiny files whose per-file open/footer costs dominate scans.  Compaction
    rewrites to a bounded file count; ``sort_by`` additionally clusters the
    data so min/max row-group statistics prune better (poor-man's Z-order
    for a single column).  Returns the file count before compaction.
    """
    p = Path(path)
    before = len(list(p.glob("*.parquet")))
    df = spark.read.parquet(path)
    out = df.repartition(target_partitions)
    if sort_by:
        out = out.sortWithinPartitions(sort_by)
    staging = p.with_name(f".{p.name}.compact-{uuid.uuid4().hex[:8]}")
    out.write.parquet(str(staging))
    old = p.with_name(f".{p.name}.old-{uuid.uuid4().hex[:8]}")
    p.rename(old)
    staging.rename(p)
    shutil.rmtree(old)
    return before
