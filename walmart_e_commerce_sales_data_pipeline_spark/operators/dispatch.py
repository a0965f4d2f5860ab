"""Sketch-driven join-strategy dispatch: pick broadcast / shuffle /
salted-skew for a configurable equi-join from two per-relation CMS
sketches, BEFORE running the join.

The planner question at 100 TB: is R JOIN S ON k broadcast-able, and if
not, will its output explode off a hot key?  Catalyst answers the first
from file statistics and AQE patches skew at runtime, but neither helps
when the inputs are mid-plan frames with no stats (post-filter,
post-explode, post-UDF) — exactly where a hand-authored pipeline
hardcodes a hint and gets it wrong at the next data drift.  This helper
is the bounded-dispatch posture `operators/components.py` and
`operators/similarity.py` use for their tier choices, applied to join
strategy:

- two per-relation CMS counter matrices (depth x width cells, one
  map-side-combined aggregate per side — the only actions this helper
  runs; each output is <= depth*width rows regardless of input size);
- row counts ride along as the r=0 cell sum (no extra scan);
- estimated join cardinality = min over depth rows of the cell-count
  inner product — the AMS/CMS join-size estimator (Alon-Matias-Szegedy
  '96; Cormode-Muthukrishnan '05 §4.2), an overestimate in every row,
  so est >= exact always.  The registered query twin with a DuckDB
  oracle is ``queries.sketches.cms_join_size_estimate`` (portable-md5
  geometry there for cross-engine bit-parity; xxhash64 here where only
  Spark runs it).

Dispatch (thresholds are row counts, deliberately conservative):

0. both sides read tables bucketed on the join key into the same bucket
   count -> the join is already co-located; return the plain join with
   NO sketch pass at all (strategy ``"bucketed"`` — pre-bucketed storage
   is the fourth real strategy at 100 TB: the shuffle was paid once at
   write time);
1. a side's rows <= ``broadcast_limit``  -> hint ``broadcast()`` on the
   SMALLER side (strategy ``"broadcast"``);
2. est_join > ``explosion_factor`` * (n_left + n_right) and
   ``salt_cols`` given -> the hot-key join shape; route the bigger side
   through ``skew.salted_join`` (strategy ``"salted"``);
3. otherwise a plain shuffle equi-join, leaving AQE's runtime skew
   splitting on (strategy ``"shuffle"``).

Semantics are identical on every path (pinned in
tests/test_dispatch.py); only the physical distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bucketing import table_bucket_spec
from .skew import salted_join

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _cms_cells(df: DataFrame, key: str) -> DataFrame:
    """Per-relation CMS counter matrix over the join key: one
    map-side-combined aggregate to <= CMS_DEPTH * CMS_WIDTH rows.

    The key is canonicalized through a string cast before hashing:
    xxhash64 hashes TYPED values, so an INT 0 on one side and a BIGINT 0
    on the other would land in different buckets and the estimator would
    miss every cross-type match the join itself (which coerces) finds.

    NULL keys are filtered out first (r17 ADVICE): an inner equi-join
    can never emit a NULL-key row, but xxhash64 IGNORES null inputs —
    hashing only the seed — so NULLs from both sides would pile into one
    bucket per depth row, inflating est_join with phantom NULLxNULL
    matches and counting unjoinable rows in n_left/n_right (spuriously
    triggering the salted path or suppressing broadcast on NULL-heavy
    keys).
    """
    return (
        df.filter(F.col(key).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            F.pmod(
                                F.xxhash64(F.col(key).cast("string"), F.lit(r)),
                                F.lit(CMS_WIDTH),
                            ).alias("b"),
                        )
                        for r in range(CMS_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .groupBy("cell.r", "cell.b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def estimate_join_stats(left: DataFrame, right: DataFrame, key: str) -> dict:
    """(n_left, n_right, est_join) from two CMS sketches — the single
    1-row driver-side collect this helper performs (the planner-stats
    class: the collected frame is one row of three BIGINTs, never data).
    Counts cover JOINABLE rows only: NULL-key rows are excluded on both
    sides (they cannot appear in an inner equi-join's output).

    est_join >= the exact inner-join cardinality, with expected
    overestimate <= n_left * n_right / CMS_WIDTH per depth row (min over
    CMS_DEPTH independent rows tightens it).
    """
    cl = _cms_cells(left, key)
    cr = _cms_cells(right, key).select(
        F.col("r").alias("r2"), F.col("b").alias("b2"), F.col("c").alias("c2")
    )
    ip = (
        cl.join(cr, (F.col("r2") == F.col("r")) & (F.col("b2") == F.col("b")))
        .groupBy("r")
        .agg(
            F.sum(F.col("c") * F.col("c2")).cast("long").alias("inner_product")
        )
    )
    est = ip.agg(F.min("inner_product").cast("long").alias("est_join"))
    nl = cl.filter(F.col("r") == 0).agg(F.sum("c").cast("long").alias("n_left"))
    nr = (
        cr.filter(F.col("r2") == 0)
        .agg(F.sum("c2").cast("long").alias("n_right"))
    )
    row = (
        nl.crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(est))
        .collect()[0]
    )
    return {
        "n_left": row["n_left"] or 0,
        "n_right": row["n_right"] or 0,
        "est_join": row["est_join"] if row["est_join"] is not None else 0,
    }


def size_dispatched_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    broadcast_limit: int = 500_000,
    explosion_factor: float = 8.0,
    salt_cols: list[str] | None = None,
    buckets: int = 16,
) -> tuple[DataFrame, str, dict]:
    """Inner equi-join on ``key`` with the physical strategy chosen from
    sketch-estimated sizes.  Returns (joined, strategy, stats); the
    joined frame is row-identical to ``left.join(right, key)`` on every
    path.

    ``broadcast_limit`` is a ROW threshold for hinting a build side
    (Catalyst's own byte threshold still applies underneath — the hint
    can only be honored, never force an OOM-sized build).  The salted
    path needs ``salt_cols`` (row-distinguishing columns on the BIGGER
    side) and replicates the smaller side ``buckets`` times, so it only
    fires when the caller OPTS IN and the estimator says the output
    explodes past ``explosion_factor`` times the combined input rows.

    Measured guidance (SCALE.md §39): with AQE skew splitting enabled —
    this engine's default — the plain shuffle path beat the salted path
    ~15x on a planted 20k x 20k hot key at 4e8 output rows, because AQE
    already splits the hot partition while salting pays the buckets-x
    small-side replication.  Leave ``salt_cols`` unset (AQE path) unless
    the runtime lacks AQE, the skew sits under a stateful/streaming
    aggregate AQE cannot re-plan, or the hot key amplifies a BUILD side
    across executors — the cluster shapes the salted tier exists for.

    Bucketed fast path (r17 VERDICT item 5 — the fourth real strategy at
    100 TB): when BOTH sides read tables bucketed on exactly ``key``
    into the SAME bucket count, the join is already co-located — the
    shuffle the sketches would size was paid once at write time — so
    the dispatcher returns the plain join (strategy ``"bucketed"``)
    WITHOUT running the two sketch aggregates: spending two full scans
    to decide whether to avoid a shuffle that storage already avoided
    would cost more than the question is worth.  Catalyst plans the
    shuffle-free sort-merge join (or a broadcast, equally shuffle-free)
    from the matching output partitionings on its own; no hint needed.
    """
    bl, br = table_bucket_spec(left), table_bucket_spec(right)
    if (
        bl is not None
        and br is not None
        and bl[0] == br[0]
        and bl[1] == [key]
        and br[1] == [key]
    ):
        return (
            left.join(right, key),
            "bucketed",
            {"n_left": None, "n_right": None, "est_join": None,
             "n_buckets": bl[0]},
        )
    stats = estimate_join_stats(left, right, key)
    n_left, n_right = stats["n_left"], stats["n_right"]
    if min(n_left, n_right) <= broadcast_limit:
        small_is_left = n_left <= n_right
        joined = (
            F.broadcast(left).join(right, key)
            if small_is_left
            else left.join(F.broadcast(right), key)
        )
        return joined, "broadcast", stats
    if (
        salt_cols
        and stats["est_join"] > explosion_factor * (n_left + n_right)
    ):
        big, small = (left, right) if n_left >= n_right else (right, left)
        joined = salted_join(big, small, key, salt_cols, buckets)
        # restore left-side column precedence when the sides swapped
        if n_left < n_right:
            joined = joined.select(
                key,
                *[c for c in left.columns if c != key],
                *[c for c in right.columns if c != key],
            )
        return joined, "salted", stats
    return left.join(right, key), "shuffle", stats
