"""Structured Streaming variants of the event-time analytics.

The reference has zero streaming surface (SURVEY.md §2.7); this module is
the extension mandated by the north star.  Design: the *transformations*
are factored out so the identical logical plan runs over a batch DataFrame
or a ``readStream`` DataFrame — only the source/sink differ.  Watermarks
bound state for late data; ``session_window`` provides native streaming
sessionization (the batch lag+cumsum equivalent lives in
``queries.events.events_sessionization`` and the two are cross-checked in
tests).

At scale: windowed aggregation state is partitioned by (group keys, window)
— the default HDFS-backed state store shards per shuffle partition; with
RocksDB state store enabled the same code handles multi-TB state.

All four sketch twins (CMS / value histogram / Bloom / HLL) accept
``window``/``slide`` so the same operator serves SLIDING windows (the
rolling-actives shape): each event then feeds window/slide windows, so
bounded per-window state multiplies by the overlap factor and nothing
else.  Sliding stream == batch is pinned per family in
tests/test_streaming.py (HLL) and collectively for the other three via
the shared window-assignment test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import LongType

from ..session import ensure_utc

# Fallback raw-events schema for streams started against a not-yet-populated
# staging directory (file-footer inference needs at least one file).  Matches
# the current testdata encoding: parquet timestamp[us] isAdjustedToUTC=false
# → TIMESTAMP_NTZ (see queries/tables.py for the encoding history);
# ``with_event_time`` normalizes either encoding downstream.
#
# SCOPE: the empty-dir fallback covers the µs encoding ONLY.  A feed that
# will deliver TIMESTAMP(NANOS)-as-long files into an initially-empty
# directory must pass its schema explicitly (``read_events_stream``'s
# ``schema`` arg, with ``ts`` as LongType) — the file-stream source pins
# the declared schema at start, so a NTZ declaration against later
# nanos-long files would fail or misread at batch time.
RAW_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stage_stream_dir(*files: str) -> str:
    """Stage files for the directory-based file stream source by symlinking
    them into a fresh temp dir (the source requires a directory; the
    testdata is read-only, so no copies)."""
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="stream_src_")
    for f in files:
        os.symlink(f, os.path.join(d, os.path.basename(f)))
    return d


def read_events_stream(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """File-source stream over a *directory* of events parquet files (use
    ``stage_stream_dir`` to stream individual files).

    ``maxFilesPerTrigger=1`` gives deterministic micro-batches in tests;
    production would leave it unset and let the source batch by size.

    The file-stream source requires an explicit schema; unless the caller
    supplies one, it is inferred with one driver-side batch footer read of
    the same directory so the stream adapts to whichever ``ts`` encoding
    the testdata ships (TIMESTAMP(NANOS)-as-long or timestamp[us] — see
    queries/tables.py).  A stream may legitimately start against an empty
    staging directory with files arriving later — inference has nothing to
    read then, so fall back to ``RAW_EVENTS_SCHEMA`` instead of failing
    with UNABLE_TO_INFER_SCHEMA.  The fallback assumes the µs encoding;
    an empty-dir start for a nanos-encoded feed must supply ``schema``
    (see the RAW_EVENTS_SCHEMA scope note above).
    """
    ensure_utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        from pyspark.errors import AnalysisException

        try:
            schema = spark.read.parquet(path).schema
        except AnalysisException:
            schema = RAW_EVENTS_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return with_event_time(raw)


def with_event_time(raw: DataFrame) -> DataFrame:
    """Normalize the raw ``ts`` column to the (``ts`` µs timestamp,
    ``ts_ns`` exact ns long) pair — same contract as the batch loader,
    queries.tables.events, for either source encoding.  Integer `div` on
    the nanos path: float division loses ns precision above 2^53 (see
    queries/tables.py)."""
    if isinstance(raw.schema["ts"].dataType, LongType):
        return raw.withColumnRenamed("ts", "ts_ns").withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
    return raw.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "ts_ns", F.unix_micros(F.col("ts")) * F.lit(1000)
    )


def hourly_window_agg(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour window counts/sums — batch or streaming input.

    With a streaming input the watermark bounds state: windows older than
    (max event time − watermark) finalize and evict.  Identical logical
    shape to queries.events.events_hourly_window.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 2).alias("avg_value"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "avg_value", "sum_value")
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user sessionization via the native ``session_window`` operator —
    batch or streaming input.  In streaming mode the watermark closes
    sessions once no event can extend them."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("sw"), F.col("user_id"))
        .agg(F.count("*").alias("ev_cnt"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "ev_cnt",
        )
    )


def hourly_user_cms(
    events: DataFrame,
    watermark: str = "25 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour count-min sketch of user-activity frequency — batch or
    streaming input (one logical plan, the module's standing design).

    Emits the counter matrix ``(window_start, r, b, c)`` using the same
    deterministic geometry as the batch ``cms_heavy_hitters`` query
    (depth × 256 cells from disjoint 8-bit slices of one md5 — see
    ``queries.curation.cms_cells``), keyed by tumbling 1-hour event-time
    windows.  This is the telemetry shape a 100 TB stream keeps instead
    of per-key counts: streaming state is bounded at depth·width rows
    PER HOUR regardless of user cardinality (the aggregation key domain
    is (window, r, b), never user_id), the watermark finalizes and
    evicts closed hours, and emitted per-hour sketches merge downstream
    by cell addition — across hours for coarser windows, across shards
    for a fleet (merge law pinned for the batch twin in
    tests/test_curation.py; stream == batch equality in
    tests/test_streaming.py).
    """
    # Lazy import: streaming.* must not import the queries package at
    # module load (queries/__init__ imports streaming-facing modules).
    from ..queries.curation import _CMS_DEPTH, _cms_bucket_sql

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    hashed = src.withColumn("h", F.md5(F.col("user_id").cast("string")))
    cells = hashed.select(
        "ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_cms_bucket_sql("h", r)).alias("b"),
                    )
                    for r in range(_CMS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("ts", "cell.r", "cell.b")
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        cells.groupBy(w.alias("w"), "r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("window_start"), "r", "b", "c")
    )


def hourly_user_countsketch(
    events: DataFrame,
    watermark: str = "25 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour Count-Sketch of user-activity frequency — batch or
    streaming input (one logical plan, the module's standing design).

    The EIGHTH streaming sketch family, and the one that completes the
    frequency triangle in the stream the way ``countsketch_user_freq``
    does in batch: the CMS twin only ever OVERestimates (collision mass
    adds) and the Misra-Gries twin only ever UNDERestimates (bounded
    decrement); Count-Sketch's Rademacher-signed cells cancel collision
    mass in expectation, so the stream keeps an UNBIASED two-sided
    frequency estimator per hour.  Emits the signed counter matrix
    ``(window_start, r, b, c)`` with c = SUM(sign) using the identical
    deterministic geometry as the batch ``countsketch_user_freq`` query
    (depth 5 x width 256; buckets from hex chars 1-10 of ONE portable
    md5, signs from chars 11-15 — ``queries.sketches._cs_bucket_sql`` /
    ``_cs_sign_sql``), keyed by tumbling event-time windows.  Streaming
    state is bounded at depth*width signed cells PER HOUR regardless of
    user cardinality (the aggregation key domain is (window, r, b),
    never user_id); a signed SUM is associative and commutative, so the
    windowed aggregate is split-independent by construction and emitted
    per-hour sketches merge downstream by cell ADDITION — across hours
    for coarser windows, across shards for a fleet, exactly the CMS
    merge law but signed.  The oracle-checked batch readout (each
    hour's busiest user probed against that hour's cells, median-of-5
    signed estimate, exact integer arithmetic end-to-end) is
    ``events_hourly_countsketch``; stream == batch equality, the state
    bound, and the two-sided-error property are pinned in
    tests/test_streaming.py.
    """
    # Lazy import: streaming.* must not import the queries package at
    # module load (queries/__init__ imports streaming-facing modules).
    from ..queries.sketches import _CS_DEPTH, _cs_bucket_sql, _cs_sign_sql

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    hashed = src.withColumn("h", F.md5(F.col("user_id").cast("string")))
    cells = hashed.select(
        "ts",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_cs_bucket_sql("h", r)).alias("b"),
                        F.expr(_cs_sign_sql("h", r)).alias("s"),
                    )
                    for r in range(_CS_DEPTH)
                ]
            )
        ).alias("cell"),
    ).select("ts", "cell.r", "cell.b", "cell.s")
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        cells.groupBy(w.alias("w"), "r", "b")
        .agg(F.sum("s").cast("long").alias("c"))
        .select(F.col("w.start").alias("window_start"), "r", "b", "c")
    )


def hourly_user_bloom(
    events: DataFrame,
    watermark: str = "25 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour Bloom filter of active user ids — batch or streaming input
    (one logical plan, the module's standing design).

    Emits the SET BITS ``(window_start, pos)`` using the same deterministic
    geometry as the batch ``bloom_semijoin_stats`` query (m = 4,096 bits,
    k = 3 probes, each a disjoint 3-hex-digit slice of one portable md5 —
    ``queries.diagnostics._bloom_pos_sql``), keyed by tumbling 1-hour
    event-time windows.  The third streaming sketch twin beside
    ``hourly_user_cms`` (frequency) and ``hourly_value_histogram``
    (quantiles): this one answers MEMBERSHIP — "was this user active in
    hour H?" — without keeping the user set.  Streaming state is bounded
    at ``_BLOOM_BITS`` rows per hour regardless of user cardinality (the
    aggregation key domain is (window, pos), never user_id), the
    watermark finalizes and evicts closed hours, and emitted per-hour
    filters merge downstream by bit-OR — a plain row union + distinct —
    across hours for coarser windows, across shards for a fleet.  The
    oracle-checked batch readout (next-hour users probed against each
    hour's filter, false positives measured exactly) is
    ``events_hourly_bloom_returns``; stream == batch equality and the
    state bound are pinned in tests/test_streaming.py.
    """
    # Lazy import: streaming.* must not import the queries package at
    # module load (queries/__init__ imports streaming-facing modules).
    from ..queries.diagnostics import _BLOOM_K, _bloom_pos_sql

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    hashed = src.select("ts", F.md5(F.col("user_id").cast("string")).alias("h"))
    pos = hashed.select(
        "ts",
        F.explode(
            F.array(*[F.expr(_bloom_pos_sql("h", s)) for s in range(_BLOOM_K)])
        ).alias("pos"),
    )
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        pos.groupBy(w.alias("w"), "pos")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("window_start"), "pos")
    )


def hourly_user_hll(
    events: DataFrame,
    watermark: str = "25 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour HyperLogLog register array of distinct user ids — batch or
    streaming input (one logical plan, the module's standing design).

    Emits ``(window_start, bucket, m_j)`` using the same deterministic
    geometry as the batch ``hll_distinct_sketch`` query (2^8 = 256
    registers addressed by the top 8 bits of one portable 48-bit md5, the
    remaining 40 bits feeding the leading-zero rank — see
    ``queries.curation``), keyed by tumbling 1-hour event-time windows.
    The FOURTH streaming sketch family, completing the suite: CMS
    (frequency), fixed-bounds histogram (quantiles), Bloom (membership),
    and now HLL (cardinality) — "how many distinct users were active in
    hour H?" from 256 registers instead of the user set.  MAX is the
    whole trick: a register is a streaming-safe aggregate (monotone,
    order-independent), so streaming state is bounded at 2^8 rows per
    hour regardless of user cardinality, the watermark finalizes and
    evicts closed hours, and emitted per-hour register arrays merge
    downstream by elementwise max — across hours for coarser windows,
    across shards for a fleet.  The oracle-checked batch readout (per-hour
    estimate vs exact distinct count) is ``events_hourly_hll``; stream ==
    batch equality and the state bound are pinned in
    tests/test_streaming.py.

    ``window``/``slide`` generalize the key to SLIDING windows (e.g.
    window="24 hours", slide="6 hours" — the rolling-actives board):
    each event then feeds window/slide register arrays, so state
    multiplies by the overlap factor and nothing else (<= overlap x 256
    rows per slide).  The oracle-checked batch readout of the sliding
    shape is ``events_sliding_hll``; sliding stream == batch is pinned
    in tests/test_streaming.py too.
    """
    # Lazy imports: streaming.* must not import the queries package at
    # module load (queries/__init__ imports streaming-facing modules).
    from ..operators.splits import portable_hex_value_sql
    from ..queries.curation import _HLL_MAX_RHO, _HLL_REST_MOD

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    h = src.select(
        "ts", F.expr(portable_hex_value_sql("user_id", 12, "STRING")).alias("hv")
    )
    br = h.select(
        "ts",
        F.expr(f"hv DIV {_HLL_REST_MOD}").alias("bucket"),
        (F.col("hv") % _HLL_REST_MOD).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(_HLL_MAX_RHO)).otherwise(
        F.lit(_HLL_MAX_RHO) - F.length(F.expr("bin(rest)"))
    )
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        br.withColumn("rho", rho)
        .groupBy(w.alias("w"), "bucket")
        .agg(F.max("rho").alias("m_j"))
        .select(F.col("w.start").alias("window_start"), "bucket", "m_j")
    )


# Stochastic-averaging KMV geometry: k = 64 buckets addressed by the top
# 6 bits of the portable 48-bit md5, per-bucket state is ONE minimum of
# the remaining 42 bits.  (min_rest + 1) / 2^42 is an exact dyadic double
# (42 significand bits), so the k-term readout sum is order-independent
# and bit-exact across engines — the property every sketch readout in
# this repo leans on for its exact oracle.
KMV_BUCKETS = 64
KMV_BUCKET_BITS = 6
KMV_REST_MOD = 1 << (48 - KMV_BUCKET_BITS)  # 2^42


def hourly_user_kmv(
    events: DataFrame,
    watermark: str = "25 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour k-minimum-values signature of distinct user ids — batch or
    streaming input (one logical plan), the FIFTH and final streaming
    sketch family twin (CMS frequency, histogram quantiles, Bloom
    membership, HLL cardinality, and now KMV cardinality-with-set-algebra).

    Emits ``(window_start, bucket, min_rest)``: the hash space of the
    portable 48-bit md5 splits into k = 64 bucket substreams (stochastic
    averaging — Giroire 2009, Lumbroso 2010 order-statistics estimators),
    and each bucket keeps the MINIMUM of its 42 low bits.  MIN is the
    whole trick, mirroring the HLL twin's MAX registers: a minimum is a
    monotone, order-independent, streaming-safe aggregate, so state is
    bounded at k = 64 rows per hour regardless of user cardinality, the
    watermark finalizes and evicts closed hours, and emitted signatures
    merge downstream by elementwise min — across hours for coarser
    windows, across shards for a fleet (the batch KMV set algebra:
    kmv_sketch_union / kmv_jaccard_langs / kmv_set_difference).

    The oracle-checked batch readout (per-hour estimate vs exact distinct
    count) is ``events_hourly_kmv``; stream == batch equality, the 64-row
    state bound, and the elementwise-min merge law are pinned in
    tests/test_streaming.py.  ``window``/``slide`` generalize to sliding
    windows exactly as in ``hourly_user_hll`` (state multiplies by the
    overlap factor only).
    """
    from ..operators.splits import portable_hex_value_sql

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    h = src.select(
        "ts", F.expr(portable_hex_value_sql("user_id", 12, "STRING")).alias("hv")
    )
    br = h.select(
        "ts",
        F.expr(f"hv DIV {KMV_REST_MOD}").alias("bucket"),
        (F.col("hv") % KMV_REST_MOD).alias("rest"),
    )
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        br.groupBy(w.alias("w"), "bucket")
        .agg(F.min("rest").alias("min_rest"))
        .select(F.col("w.start").alias("window_start"), "bucket", "min_rest")
    )


# Fixed a-priori bounds for the streaming value histogram: the events
# generator draws value in (0, 500) (TESTDATA.md); a stream cannot
# two-pass for min/max, so fixed bounds ARE the streaming trade —
# out-of-range values clamp into the edge buckets (counts stay total).
VALUE_HIST_BOUNDS = (0.0, 500.0)
VALUE_HIST_BUCKETS = 64


def hourly_value_histogram(
    events: DataFrame,
    watermark: str = "25 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour fixed-bounds histogram of ``value`` — batch or streaming
    input (one logical plan, the module's standing design).

    Emits ``(window_start, bk, c)`` — the QUANTILE sketch of
    ``queries/sketches.py`` in its streaming-compatible form: bounds are
    fixed a priori (see ``VALUE_HIST_BOUNDS``) because a stream cannot
    two-pass for per-group min/max, which is exactly how t-digest-style
    telemetry runs in production.  Streaming state is bounded at
    ``VALUE_HIST_BUCKETS`` cells per hour regardless of event volume,
    the watermark finalizes and evicts closed hours, and emitted
    per-hour histograms merge downstream by bucket addition — across
    hours for coarser windows, across shards for a fleet.  The
    oracle-checked batch readout (interpolated per-hour quantiles vs
    the exact ladder) is ``events_hourly_value_quantiles``; stream ==
    batch equality is pinned in tests/test_streaming.py.
    """
    from ..queries.sketches import fixed_bucket_expr

    lo, hi = VALUE_HIST_BOUNDS
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    # NULL values are filtered, not bucketed: a quantile sketch over NULL is
    # meaningless (SQL aggregates ignore NULLs too), and without the filter a
    # null ``value`` would fall through fixed_bucket_expr into a NULL ``bk``
    # cell — an extra state row per hour that violates both the
    # ``<= VALUE_HIST_BUCKETS`` state bound and the counts-stay-total claim.
    # Totality therefore reads: sum(c) == count of NON-NULL values per hour
    # (pinned in tests/test_streaming.py for a null-carrying stream).
    cells = src.filter(F.col("value").isNotNull()).select(
        "ts",
        fixed_bucket_expr(F.col("value"), lo, hi, VALUE_HIST_BUCKETS).alias(
            "bk"
        ),
    )
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        cells.groupBy(w.alias("w"), "bk")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("w.start").alias("window_start"), "bk", "c")
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, mode: str = "append"
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Drain a streaming plan into an in-memory table (testing sink)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_conf() -> dict[str, str]:
    """Session confs switching streaming state to the RocksDB provider.

    The default HDFS-backed store keeps every state row on the executor
    heap — fine for sf0.1 session windows, fatal for multi-TB keyspaces
    (billions of users × open windows).  RocksDB spills state to local SSD
    with bounded memory, and changelog checkpointing uploads only per-batch
    deltas instead of full snapshots.  Read at query *start*, so set these
    before ``.start()``; running queries are unaffected.
    """
    return {
        "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }


def dedup_stream(events: DataFrame, watermark: str = "365 days") -> DataFrame:
    """Exactly-once-per-key streaming dedup via
    ``dropDuplicatesWithinWatermark`` — the streaming-native form of exact
    dedup (operators.dedup.exact_dedup): the first event per ``event_id``
    passes, re-deliveries within the watermark horizon are filtered, and
    per-key state evicts once the watermark passes the event's time, so
    state is bounded by the horizon's key cardinality, not the stream's
    lifetime (plain ``dropDuplicates`` on a stream would grow state
    forever — the operator exists precisely to fix that).

    Batch input falls back to ``dropDuplicates`` — identical result
    whenever all duplicates of a key arrive within the horizon.
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


# Forward-decay landmark: the feed's epoch.  Forward decay (Cormode,
# Shkapenyuk, Srivastava, Xu — ICDE'09) weighs each event by
# g(ts - L) / g(now - L); with the dyadic base g(x) = 2^(x/day) the
# numerator 2^(days(ts) - L) is a pure bit shift, so the per-user
# accumulator SUM(cents << days_since_landmark) is exact BIGINT, add-only,
# and NEVER re-weighted — the property that makes the decayed counter
# maintainable on an unbounded stream (the backward/landmark form in
# queries.events.time_decayed_engagement must rescale every term when the
# anchor moves; the forward form only rescales the READOUT divisor).
FWD_DECAY_LANDMARK = "2024-01-01"


def hourly_user_forward_decay(
    events: DataFrame,
    landmark: str = FWD_DECAY_LANDMARK,
    watermark: str = "25 hours",
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour, per-user FORWARD-DECAY engagement accumulator — batch or
    streaming input (one logical plan), the streaming-maintainable twin of
    the batch ``time_decayed_engagement`` counter.

    Emits ``(window_start, user_id, n_events, acc_fw)`` where ``acc_fw =
    SUM(cents << days(date(ts) - landmark))`` — exact BIGINT, half-life
    one day.  Addition is associative/commutative and each term depends
    only on the EVENT (never on "now"), so the aggregate is streaming-safe,
    hourly cells merge downstream by plain addition into any coarser
    window, and the decayed value at readout time t is
    ``merged_acc / 2^days(t - landmark)`` — ONE divisor rescale instead of
    re-weighting history, which is the whole forward-decay trick.

    State per window is bounded by the active-user dimension (like
    ``hourly_window_agg``), not by stream length; the watermark evicts
    closed hours.  Overflow headroom: terms are ``cents * 2^d`` with d =
    days since landmark, so an UNBOUNDED stream eventually overflows the
    BIGINT — the documented forward-decay trade; production renormalizes
    by advancing the landmark k days and shifting every stored cell right
    by k (exact — cells are integers), at which point readouts continue
    unchanged.  At this feed's 30-day horizon max(acc) < 2^56 even at
    1,000x the per-user event rate.

    Oracle-checked batch readout: ``queries.events.events_forward_decay``;
    stream == batch, the additive merge law, and the exact BIGINT identity
    ``acc_fw << (SHIFT - days(anchor-L)) == backward acc`` are pinned in
    tests/test_streaming.py.

    Composes downstream of other stateful operators: when ``ts`` already
    carries an event-time watermark (e.g. the purchase side of
    ``joins.attribution_join`` renamed into ``ts``), the inherited
    watermark is KEPT — Spark disallows redefining one mid-pipeline when
    multiple stateful operators chain, and the upstream delay is the
    correct horizon for rows that operator emits.  Join-then-decay ==
    batch is pinned in tests/test_stream_stream_join.py.
    """
    needs_wm = events.isStreaming and (
        "spark.watermarkDelayMs" not in events.schema["ts"].metadata
    )
    src = events.withWatermark("ts", watermark) if needs_wm else events
    # Shift-range guard: Java's shiftleft masks the shift count mod 64, so
    # an event before the landmark (negative datediff) or past the 62-day
    # renormalization horizon would SILENTLY produce a garbage weight while
    # DuckDB's << raises — the engines must fail together, loudly.  62 is
    # the hard BIGINT ceiling (cents * 2^62 overflows); production advances
    # the landmark and right-shifts stored cells before d reaches it.
    days = f"datediff(CAST(ts AS DATE), DATE'{landmark}')"
    term = F.col("cents") * F.expr(
        f"CASE WHEN {days} BETWEEN 0 AND 62"
        f" THEN shiftleft(CAST(1 AS BIGINT), {days})"
        f" ELSE raise_error(CONCAT('forward-decay: event ts ', CAST(ts AS"
        f" STRING), ' outside [landmark, landmark+62d] — advance the"
        f" landmark (renormalize) before ingesting it')) END"
    )
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        src.select(
            "ts",
            "user_id",
            F.round(F.col("value") * F.lit(100.0), 0)
            .cast("long")
            .alias("cents"),
        )
        .select("ts", "user_id", term.alias("term"))
        .groupBy(w.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("term").cast("long").alias("acc_fw"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "acc_fw",
        )
    )


# --- streaming Misra-Gries heavy hitters (sixth sketch family) ----------------

# Summary size for the per-hour cells: k = 8 counters per hour (the
# corpus-wide batch mg_heavy_hitters keeps k = 32; hourly user activity
# is a much smaller domain, and k = 8 keeps the compress path live even
# at the small oracle scale factors instead of degenerating to exact
# counts).  Unlike the five algebraic families (CMS/histogram/Bloom/HLL/KMV
# — order-independent MIN/MAX/SUM registers), the MG summary is built by
# ADDITION-THEN-COMPRESS (Agarwal et al., PODS'12), which no built-in
# streaming aggregate expresses with bounded state: groupBy(window, user)
# would hold one state row PER USER.  The twin therefore rides the
# arbitrary-state API: per-hour state is the <= k (user, count) summary
# plus the accumulated decrement, each micro-batch's exact counts merge in
# by addition and ONE compress, and the emitted summary always satisfies
# the MG laws (no overcount; undercount <= decrement <= n/(k+1); every
# user with true frequency > n/(k+1) survives) REGARDLESS of how the hour
# splits into micro-batches.  The summary's exact counters, unlike the
# five algebraic families', are order-DEPENDENT between compresses — the
# pins assert the order-independent guarantee laws, plus bit-equality
# with the canonical batch form whenever the hour arrives in one
# micro-batch (tests/test_streaming.py).
MG_STREAM_K = 8

MG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("dec", T.LongType()),
        T.StructField("n_window", T.LongType()),
    ]
)

MG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("deficit", T.LongType()),
        T.StructField("n_window", T.LongType()),
    ]
)


def _make_mg_update(k: int, win_sec: int):
    """Build the streaming MG state-update function with ``k`` and the
    window length baked into the closure at call time.

    The returned function must stay self-contained — workers may not
    have this package on their import path, so it references no module
    globals; cloudpickle ships the two closed-over ints by value, which
    is how any streaming k (not just the default 8) and any window
    length get a correct compress threshold and eviction horizon."""

    def _mg_update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        users, counts, dec, n_total = (
            state.get if state.exists else ([], [], 0, 0)
        )
        merged = dict(zip(users, counts))
        for pdf in pdfs:
            vc = pdf["user_id"].value_counts()
            n_total += int(vc.sum())
            for u, c in vc.items():
                merged[int(u)] = merged.get(int(u), 0) + int(c)
        if len(merged) > k:
            # one compress: subtract the (k+1)-th largest counter from
            # every counter, keep the positive ones — at most k survive
            # and the decrement telescopes to <= n/(k+1) across any
            # batch split
            t = sorted(merged.values(), reverse=True)[k]
            dec += t
            merged = {u: c - t for u, c in merged.items() if c > t}
        state.update(
            (list(merged.keys()), list(merged.values()), int(dec), int(n_total))
        )
        # Evict once the window is unreachable: window END (start + the
        # actual window length, not a hardcoded hour — a 2 h sliding
        # window stays admissible an hour longer than a tumbling one) +
        # the 25 h delay the other twins use.  Clamped above the current
        # watermark (Spark rejects a timeout at or before it).
        win_end_ms = int(key[0].timestamp() * 1000) + win_sec * 1000
        evict_ms = max(
            win_end_ms + 25 * 3_600_000, state.getCurrentWatermarkMs() + 60_000
        )
        state.setTimeoutTimestamp(evict_ms)
        ks = list(merged.keys())
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(ks),
                "user_id": ks,
                "mg_count": [merged[u] for u in ks],
                "deficit": [int(dec)] * len(ks),
                "n_window": [int(n_total)] * len(ks),
            }
        )

    return _mg_update


def _mg_window_starts(window_sec: int, slide_sec: int):
    """Explicit sliding-window assignment for the MG twin: each event
    belongs to the ``window/slide`` windows whose starts are
    ``slide * floor(unix(ts)/slide) - i*slide`` for i in
    [0, window/slide) — the same window set ``F.window(ts, w, s)``
    assigns, spelled out because the arbitrary-state API needs the
    window start as an explicit GROUPING column rather than a groupBy
    aggregate's internal window expression.  Requires slide to divide
    window (the same constraint the register families' overlap-factor
    argument uses)."""
    assert window_sec % slide_sec == 0, "slide must divide window"
    overlap = window_sec // slide_sec
    return F.explode(
        F.expr(
            f"transform(sequence(0, {overlap - 1}), i ->"
            f" timestamp_seconds({slide_sec} * (unix_timestamp(ts)"
            f" div {slide_sec}) - i * {slide_sec}))"
        )
    )


def hourly_user_mg(
    events: DataFrame,
    watermark: str = "25 hours",
    k: int = MG_STREAM_K,
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour Misra-Gries heavy-hitter summary of user activity — the
    SIXTH streaming sketch family (after CMS, histogram, Bloom, HLL, KMV).

    Emits ``(window_start, user_id, mg_count, deficit, n_window)``: at
    most k (default 8) counters per hour — the streaming path bakes the
    requested k and window length into the self-contained state-update
    closure (``_make_mg_update``), so any k works identically in stream
    and batch — each counter undercounting its user's true
    event count by at most ``deficit`` (<= n_window/(k+1) a priori), with
    every user whose true count exceeds n_window/(k+1) guaranteed present
    — the deterministic frequency guarantee CMS only gives
    probabilistically.

    Streaming input rides ``applyInPandasWithState`` keyed by the hour:
    state is the <= k-counter summary + decrement (NOT a row per user —
    the whole point), each micro-batch merges by addition-then-compress
    (the PODS'12 mergeable-summaries law pinned in
    tests/test_round15_properties.py), closed hours are evicted by an
    event-time timeout 25 h past the window end.  Batch input takes the
    canonical one-compress form: exact per-(hour, user) counts, the
    per-hour (k+1)-th-largest threshold via an hour-PARTITIONED rank
    (never a global sort), survivors emitted with the uniform deficit.
    Stream == batch bit-exactly when each hour arrives within one
    micro-batch; under any split the guarantee laws still hold (both
    pinned in tests/test_streaming.py).  Emitted summaries merge
    downstream by counter addition + compress like the batch family
    (mg_heavy_hitters).

    ``window``/``slide`` generalize to SLIDING windows like the five
    register families (state multiplies by the overlap factor only):
    each event is assigned its window/slide overlapping window starts
    explicitly (``_mg_window_starts`` — the arbitrary-state API groups
    by a real column, so the assignment F.window performs inside a
    groupBy is spelled out), and each window keeps its own <= k-counter
    summary.  Sliding == the per-window canonical compress is pinned in
    tests/test_streaming.py beside the other families' sliding pins.

    Oracle-checked batch readout: ``queries.sketches.events_hourly_mg``.
    """
    import re as _re

    def _sec(spec: str) -> int:
        m = _re.fullmatch(r"(\d+)\s*(hour|minute|second)s?", spec.strip())
        assert m, f"unsupported window spec: {spec!r}"
        return int(m.group(1)) * {"hour": 3600, "minute": 60, "second": 1}[
            m.group(2)
        ]

    win_sec = _sec(window)
    slide_sec = _sec(slide) if slide else win_sec
    win_col = (
        F.date_trunc("hour", "ts")
        if slide is None and window == "1 hour"
        else _mg_window_starts(win_sec, slide_sec)
    )
    if events.isStreaming:
        from pyspark.sql.streaming.state import GroupStateTimeout

        src = events.withWatermark("ts", watermark)
        keyed = src.select(
            win_col.alias("window_start"),
            "user_id",
            "ts",
        )
        return keyed.groupBy("window_start").applyInPandasWithState(
            _make_mg_update(k, win_sec),
            outputStructType=MG_OUTPUT_SCHEMA,
            stateStructType=MG_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    from pyspark.sql import Window

    cnt = (
        events.select(win_col.alias("window_start"), "user_id")
        .groupBy("window_start", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    rk = cnt.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("window_start").orderBy(
                F.col("n_exact").desc(), F.col("user_id")
            )
        ),
    )
    thr = rk.filter(F.col("rn") == k + 1).select(
        "window_start", F.col("n_exact").alias("t")
    )
    nh = cnt.groupBy("window_start").agg(
        F.sum("n_exact").cast("long").alias("n_window")
    )
    return (
        cnt.join(F.broadcast(thr), "window_start", "left")
        .withColumn("t", F.coalesce(F.col("t"), F.lit(0)).cast("long"))
        .filter(F.col("n_exact") > F.col("t"))
        .join(F.broadcast(nh), "window_start")
        .select(
            "window_start",
            "user_id",
            (F.col("n_exact") - F.col("t")).cast("long").alias("mg_count"),
            F.col("t").alias("deficit"),
            "n_window",
        )
    )


# --- streaming A-ES weighted sample (seventh sketch family) -------------------

# Per-window sample size.  Unlike MG's addition-then-compress, the A-ES
# top-k summary is a pure ORDER STATISTIC: merging two summaries is
# top-k of their union under the total order (-aes_key, event_id), which
# is associative, commutative, and independent of how events split
# across micro-batches — so the streaming twin is bit-exact vs the batch
# form under ANY split, a stronger law than MG's (which is only
# bit-exact per micro-batch-contained window).
AES_SAMPLE_K = 3

AES_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keys", T.ArrayType(T.DoubleType())),
        T.StructField("event_ids", T.ArrayType(T.LongType())),
        T.StructField("user_ids", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

AES_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("rk", T.IntegerType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("aes_key", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _make_aes_update(k: int, win_sec: int):
    """Build the streaming A-ES state-update function with ``k`` and the
    window length baked into the closure (the `_make_mg_update` pattern:
    self-contained for workers without the package on their path;
    cloudpickle ships the ints by value).

    State per window is the <= k best (aes_key, event_id, user_id,
    value) rows under the total order (-aes_key, event_id); each
    micro-batch merges by union + re-truncate.  The aes_key itself is
    computed JVM-side BEFORE the groupBy (one logical expression shared
    with the batch form), so this function only compares doubles Spark
    already produced — no Python float arithmetic to drift."""

    def _aes_update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        keys, eids, uids, vals, n_seen = (
            state.get if state.exists else ([], [], [], [], 0)
        )
        rows = list(zip(keys, eids, uids, vals))
        for pdf in pdfs:
            n_seen += len(pdf)
            rows.extend(
                zip(
                    pdf["aes_key"].tolist(),
                    pdf["event_id"].tolist(),
                    pdf["user_id"].tolist(),
                    pdf["value"].tolist(),
                )
            )
        # total order: best (largest, least-negative) key first, then
        # event_id for a deterministic tie-break
        rows.sort(key=lambda t: (-t[0], t[1]))
        rows = rows[:k]
        state.update(
            (
                [float(t[0]) for t in rows],
                [int(t[1]) for t in rows],
                [int(t[2]) for t in rows],
                [float(t[3]) for t in rows],
                int(n_seen),
            )
        )
        win_end_ms = int(key[0].timestamp() * 1000) + win_sec * 1000
        evict_ms = max(
            win_end_ms + 25 * 3_600_000, state.getCurrentWatermarkMs() + 60_000
        )
        state.setTimeoutTimestamp(evict_ms)
        yield pd.DataFrame(
            {
                "window_start": [key[0]] * len(rows),
                "rk": list(range(1, len(rows) + 1)),
                "event_id": [int(t[1]) for t in rows],
                "user_id": [int(t[2]) for t in rows],
                "value": [float(t[3]) for t in rows],
                "aes_key": [float(t[0]) for t in rows],
                "n_seen": [int(n_seen)] * len(rows),
            }
        )

    return _aes_update


def hourly_sample_aes(
    events: DataFrame,
    watermark: str = "25 hours",
    k: int = AES_SAMPLE_K,
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Per-hour Efraimidis-Spirakis weighted sample of events — the
    SEVENTH streaming sketch family (after CMS, histogram, Bloom, HLL,
    KMV, Misra-Gries): the top-k events per event-time window by
    ``ln(u)/value`` with u from the portable 48-bit md5 hash of
    event_id, i.e. a value-proportional sample WITHOUT replacement
    (P(rank 1 = i) = value_i / sum(value) exactly), deterministic across
    engines, runs, and partitionings — the reproducible-sampling
    property ``weighted_sample_aes`` establishes for documents, applied
    per window over a stream.

    The A-ES summary is a pure order statistic, so per-window state is
    the <= k best rows and merging micro-batches is top-k of the union
    under the total order (-aes_key, event_id) — associative,
    commutative, and split-independent, which makes stream == batch
    BIT-EXACT under ANY micro-batch split (pinned in
    tests/test_streaming.py; a stronger law than MG's per-batch form).
    The key is one JVM-side codegen expression computed BEFORE the
    stateful groupBy — identical in the batch plan — so the Python state
    function only compares doubles Spark produced, never recomputes
    them.  Weight semantics: ``value == 0``/NULL events are EXCLUDED
    (zero selection probability — the exact w -> 0 limit, live in the
    sf0.1 testdata); a NEGATIVE value raises loudly in BOTH engines
    rather than silently inverting the ranking (ln(u) <= 0).

    Batch input takes the canonical form: the same key expression, a
    window-PARTITIONED row_number (plans as WindowGroupLimit — k-row
    group limits, never a full per-group sort), filter rk <= k.

    Oracle-checked batch readout: ``queries.sketches.events_hourly_sample_aes``.
    """
    from ..operators.splits import aes_key_column

    import re as _re

    def _sec(spec: str) -> int:
        m = _re.fullmatch(r"(\d+)\s*(hour|minute|second)s?", spec.strip())
        assert m, f"unsupported window spec: {spec!r}"
        return int(m.group(1)) * {"hour": 3600, "minute": 60, "second": 1}[
            m.group(2)
        ]

    win_sec = _sec(window)
    slide_sec = _sec(slide) if slide else win_sec
    win_col = (
        F.date_trunc("hour", "ts")
        if slide is None and window == "1 hour"
        else _mg_window_starts(win_sec, slide_sec)
    )
    # Weight semantics: value == 0 (or NULL) means ZERO selection
    # probability — such events are EXCLUDED, the exact A-ES limit of
    # w -> 0 (ln(u)/w -> -inf, never sampled), not an error; a NEGATIVE
    # value would silently invert the ranking and raises loudly in both
    # engines.  The testdata carries a handful of value = 0.0 events at
    # sf0.1, so the zero case is live, not theoretical.  The exclusion
    # rides the SAME CASE as the raise (zero/NULL weight -> NULL key,
    # filtered on the computed column): a separate value pre-filter is
    # unsafe because Catalyst may collapse the raise-bearing projection
    # into the scan and evaluate it before the filter.  n_seen counts
    # sampleable (positive-weight) events only.
    weight = F.when(F.col("value") > 0, F.col("value")).when(
        F.col("value") < 0,
        F.expr(
            "raise_error(CONCAT('aes sample: negative weight value ',"
            " CAST(value AS STRING), ' — A-ES requires nonnegative"
            " weights'))"
        ),
    )
    keyed = events.select(
        win_col.alias("window_start"),
        "event_id",
        "user_id",
        "value",
        "ts",
        aes_key_column("event_id", weight).alias("aes_key"),
    ).filter(F.col("aes_key").isNotNull())
    if events.isStreaming:
        from pyspark.sql.streaming.state import GroupStateTimeout

        src = keyed.withWatermark("ts", watermark)
        return src.groupBy("window_start").applyInPandasWithState(
            _make_aes_update(k, win_sec),
            outputStructType=AES_OUTPUT_SCHEMA,
            stateStructType=AES_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.col("aes_key").desc(), "event_id"
    )
    # n_seen via a keyed count + broadcast join, NOT a second window:
    # an unbounded-following COUNT window would sit between the rank and
    # its filter and defeat the WindowGroupLimit rewrite, buffering
    # every row of the hour in the window operator.  The count branch
    # reads the PRE-KEY frame (win_col + the value>0 sampleability
    # filter only) so the second scan never recomputes the md5 sample
    # key; the per-window count table is calendar-bounded (one row per
    # hour) and map-side-combines.  The count branch evaluates the SAME
    # raise-bearing weight CASE (cheap — no md5): with an all-negative
    # input, AQE's empty-relation propagation can skip the rank branch
    # entirely (its broadcast side is empty), so the guard must live in
    # every branch that scans the data.
    counts = (
        events.select(win_col.alias("window_start"), weight.alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("window_start")
        .agg(F.count(F.lit(1)).cast("long").alias("n_seen"))
    )
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .join(F.broadcast(counts), "window_start")
        .select(
            "window_start",
            "rk",
            "event_id",
            "user_id",
            "value",
            "aes_key",
            "n_seen",
        )
    )
