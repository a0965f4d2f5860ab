"""Distributed exact interpolated percentiles.

Spark's built-in ``percentile`` aggregate (like any sort-based exact
quantile) buffers every value of a group in one aggregation state — fine
for small groups, fatal when a single group holds billions of rows at
100 TB (the executor needs the whole group's value multiset in memory).

``exact_group_percentiles`` computes the *identical* interpolated result
with bounded memory everywhere:

1. ``groupBy(keys, value)`` — the value HISTOGRAM per group (one shuffle,
   map-side combinable; distinct values ≪ rows on real data).
2. A per-group running count over the histogram (window ordered by value)
   assigns every distinct value its covered index range [start, end).
3. The target rank h = p·(n−1) needs at most the two distinct values
   covering ⌊h⌋ and ⌈h⌉: an EQUI-join on the group keys against the tiny
   per-group target table plus a residual range filter picks them out,
   and v_lo + (h − ⌊h⌋)·(v_hi − v_lo) is the standard linear
   interpolation both Spark's ``percentile`` and DuckDB's
   ``quantile_cont`` implement.

Per-executor state is one histogram partition plus a constant number of
target rows — no group ever materializes in one buffer.  The window in
step 2 partitions by the group keys, so its unit of work is ONE GROUP'S
VALUE HISTOGRAM — fine while distinct values ≪ rows (the stated
assumption), degenerate when a continuous-valued column makes the
histogram row-sized.  That boundary is therefore DISPATCHED, not assumed:
``exact_group_percentiles`` probes an upper bound on the histogram size
(parquet footer row counts first — no Spark job; else one cheap
``approx_count_distinct`` pass) and, above ``max_histogram_rows``, routes
to the configured overflow path — ``percentile_approx`` (the documented
production posture for continuous values at 100 TB: bounded sketch state
per group, no histogram window at all) or a hard error.

Equality with the built-in is pinned in tests/test_percentiles.py
(bit-level agreement on the driver testdata before rounding); the
dispatch boundary itself is pinned in the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Above this many (value, count) histogram rows PER GROUP the exact ladder's
# per-group window task is no longer guaranteed small (8M rows ≈ 128 MB of
# long/double pairs in one task's sort buffer) and the operator dispatches
# to the overflow path instead of assuming "distinct ≪ rows" holds.
MAX_HISTOGRAM_ROWS = 8_000_000


def _histogram_rows_bound(df: DataFrame, value_col: str) -> tuple[str, int]:
    """(method, n): a cheap upper bound on any group's value-histogram size.

    A group's histogram has at most ``distinct(value_col)`` rows, which has
    at most ``count(df)`` rows — so try the zero-job parquet-footer row
    count first (``similarity._corpus_rows_upper_bound`` posture) and only
    then pay one narrow ``approx_count_distinct`` aggregation (HLL sketches
    merge map-side; the 5 % relative error is padded below before the
    threshold comparison).  Caveat inherited from the footer probe: a
    row-MULTIPLYING operator between scan and input (explode/posexplode)
    breaks the "plan can only drop rows" premise — callers feeding a
    generated frame should pass ``on_overflow="exact"`` or pre-count."""
    from .similarity import _corpus_rows_upper_bound

    rows = _corpus_rows_upper_bound(df)
    if rows is not None:
        return "footer", rows
    est = df.agg(F.approx_count_distinct(value_col).alias("d")).first()["d"]
    return "hll", int(est * 1.1)  # pad the sketch's default 5 % rsd


def exact_group_percentiles(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    ps: list[float],
    max_histogram_rows: int = MAX_HISTOGRAM_ROWS,
    on_overflow: str = "approx",
    approx_accuracy: int = 10_000,
    histogram_rows_bound: int | None = None,
) -> DataFrame:
    """Exact interpolated percentiles of ``value_col`` per group.

    Returns one row per group with a column ``p_<i>`` for each requested
    percentile (in ``ps`` order), matching
    ``F.expr(f"percentile({value_col}, {p})")`` exactly — below the
    dispatch boundary.  When the probed histogram bound exceeds
    ``max_histogram_rows``: ``on_overflow="approx"`` (default) computes
    ``percentile_approx`` at ``approx_accuracy`` instead (same output
    schema, bounded per-group sketch state — the production path for
    continuous-valued columns); ``"error"`` raises; ``"exact"`` forces the
    ladder anyway (caller asserts the single-task histogram window fits).

    ``histogram_rows_bound``: caller-supplied upper bound that skips the
    probe entirely.  The probe is zero-job for plain parquet frames but
    costs one aggregation pass over a COMPUTED frame (the HLL fallback) —
    a caller running dependent passes (e.g. MAD: median, then median of
    per-group |x − median|, whose distinct count per group can never
    exceed the source column's) should reuse its first bound.  The hint
    must be a genuine upper bound on sum-over-groups of per-group
    distinct values; a lying hint only risks a larger-than-expected
    single-task histogram window, never a wrong answer.
    """
    if on_overflow not in ("approx", "error", "exact"):
        raise ValueError(f"unknown on_overflow mode: {on_overflow!r}")
    if on_overflow != "exact":
        if histogram_rows_bound is not None:
            method, bound = "caller", histogram_rows_bound
        else:
            method, bound = _histogram_rows_bound(df, value_col)
        if bound > max_histogram_rows:
            if on_overflow == "error":
                raise ValueError(
                    f"value histogram bound {bound} rows ({method} probe) "
                    f"exceeds max_histogram_rows={max_histogram_rows}; the "
                    "exact ladder's per-group window would buffer it in one "
                    "task — use on_overflow='approx' (percentile_approx) or "
                    "raise the threshold deliberately"
                )
            agg_cols = [
                F.percentile_approx(
                    value_col, F.lit(float(p)), F.lit(approx_accuracy)
                )
                .cast("double")
                .alias(f"p_{i}")
                for i, p in enumerate(ps)
            ]
            return df.groupBy(*[F.col(k) for k in key_cols]).agg(*agg_cols)
    keys = [F.col(k) for k in key_cols]

    hist = df.groupBy(*keys, F.col(value_col).alias("_v")).agg(
        F.count("*").alias("_c")
    )
    # Per-group totals from the PRE-window histogram (r18 optimization
    # round): max-of-running-sum over the ordered window equals the plain
    # per-group sum of counts exactly (integer arithmetic), but the
    # former forced the per-group histogram SORT to execute twice — once
    # under this aggregate, once under the bracketing join below (both
    # consumers sit above the same reused exchange, and the sort+window
    # is post-exchange work that AQE's ReusedExchange cannot dedupe).
    # The plain sum re-aggregates from the reused histogram exchange with
    # no sort at all; the single remaining window sort feeds the join.
    totals = hist.groupBy(*key_cols).agg(F.sum("_c").alias("_n"))
    w = Window.partitionBy(*key_cols).orderBy("_v")
    hist = (
        hist.withColumn("_end", F.sum("_c").over(w))
        .withColumn("_start", F.col("_end") - F.col("_c"))
    )
    targets = (
        totals.select(
            *key_cols,
            F.posexplode(F.array(*[F.lit(float(p)) for p in ps])).alias(
                "_pi", "_p"
            ),
            F.col("_n"),
        )
        .withColumn("_h", F.col("_p") * (F.col("_n") - 1))
        .withColumn("_lo", F.floor("_h"))
        .withColumn("_hi", F.ceil("_h"))
    )

    # Equi-join on the group keys; the residual filter keeps only the ≤ 2
    # histogram rows per target that cover the bracketing indices.  The
    # fan-out before the filter is |ps| per histogram row — constant.
    j = hist.join(targets, key_cols)
    covers_lo = (F.col("_start") <= F.col("_lo")) & (F.col("_lo") < F.col("_end"))
    covers_hi = (F.col("_start") <= F.col("_hi")) & (F.col("_hi") < F.col("_end"))
    per = (
        j.filter(covers_lo | covers_hi)
        .groupBy(*key_cols, "_pi", "_h", "_lo", "_hi")
        .agg(
            F.max(F.when(covers_lo, F.col("_v"))).alias("_vlo"),
            F.max(F.when(covers_hi, F.col("_v"))).alias("_vhi"),
        )
        .withColumn(
            # Spark's Percentile.getPercentile association, reproduced
            # bit-for-bit: lower·(1−frac) + higher·frac.  (The algebraic
            # twin lower + frac·(higher−lower) differs in the last ulp —
            # the parity test asserts bit-level equality with the
            # built-in, so the association must match exactly.)
            "_val",
            F.col("_vlo") * (F.lit(1.0) - (F.col("_h") - F.col("_lo")))
            + F.col("_vhi") * (F.col("_h") - F.col("_lo")),
        )
    )

    agg_cols = [
        F.max(F.when(F.col("_pi") == i, F.col("_val"))).alias(f"p_{i}")
        for i in range(len(ps))
    ]
    return per.groupBy(*key_cols).agg(*agg_cols)
