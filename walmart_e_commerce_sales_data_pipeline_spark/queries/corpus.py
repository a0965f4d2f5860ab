"""The capstone training-data query: the composed corpus-cleaning pipeline.

exact dedup (normalized-text hash group-by) → near-dup clustering on the
survivors (exact Jaccard pairs → connected components) → representative
picking (min doc_id per cluster) → per-source accounting.  This is the
shape of a real pretraining-data cleaning stage, and every step is the
oracle-checked operator built earlier — the query proves they compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.dedup import jaccard_pairs, normalize_text, shingle_sets
from ..streaming.curation import MIN_TOKENS
from .dedup import _SHINGLE_CTE, JACCARD_THRESHOLD
from .registry import register
from .tables import scratch_dir, table, table_fingerprint


@register(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH RECURSIVE
    norm AS (
        SELECT doc_id, source,
               array_to_string(string_split(lower(text), ' '), ' ') AS nt
        FROM documents
    ),
    exact_reps AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY nt),
    s1 AS (SELECT n.doc_id, n.source FROM norm n
           JOIN exact_reps r ON n.doc_id = r.doc_id),
    {_SHINGLE_CTE},
    sh1 AS (SELECT sh.* FROM sh JOIN s1 ON sh.id = s1.doc_id),
    sizes1 AS (SELECT id, COUNT(*) AS n_sh FROM sh1 GROUP BY id),
    inter AS (
        SELECT a.id AS x, b.id AS y, COUNT(*) AS n_inter
        FROM sh1 a JOIN sh1 b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT x, y FROM inter
        JOIN sizes1 sa ON sa.id = x JOIN sizes1 sb ON sb.id = y
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
    ),
    edges AS (SELECT x, y FROM pairs UNION SELECT y, x FROM pairs),
    walk(id, lab) AS (
        SELECT x, x FROM edges
        UNION
        SELECT e.x, w.lab FROM edges e JOIN walk w ON e.y = w.id
    ),
    comp AS (SELECT id, MIN(lab) AS component FROM walk GROUP BY id),
    removed AS (SELECT id FROM comp WHERE id != component)
    SELECT d.source,
           COUNT(*) AS docs,
           COUNT(s1.doc_id) AS after_exact,
           COUNT(CASE WHEN s1.doc_id IS NOT NULL AND removed.id IS NULL
                      THEN 1 END) AS after_neardup
    FROM documents d
    LEFT JOIN s1 ON d.doc_id = s1.doc_id
    LEFT JOIN removed ON d.doc_id = removed.id
    GROUP BY d.source
    ORDER BY d.source
    """,
    description="composed corpus-cleaning pipeline: exact dedup → near-dup "
    "clustering (Jaccard ≥ 0.5 + connected components) → representative "
    "picking → per-source survivor accounting; proves the dedup operators "
    "compose end-to-end",
    tags=("dedup", "pipeline", "flagship"),
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")

    normed = normalize_text(docs)
    exact_reps = normed.groupBy("_norm").agg(F.min("doc_id").alias("doc_id"))
    s1 = normed.join(exact_reps, "doc_id", "left_semi").select("doc_id", "source")

    sh1 = shingle_sets(docs).join(
        s1.select(F.col("doc_id").alias("id")), "id", "left_semi"
    )
    pairs = jaccard_pairs(sh1, JACCARD_THRESHOLD)
    comp = connected_components(pairs)
    removed = comp.filter(F.col("id") != F.col("component")).select("id")

    return (
        docs.join(s1.select(F.col("doc_id"), F.lit(1).alias("_s1")), "doc_id", "left")
        .join(
            removed.select(F.col("id").alias("doc_id"), F.lit(1).alias("_rm")),
            "doc_id",
            "left",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.count("_s1").alias("after_exact"),
            F.count(
                F.when(F.col("_s1").isNotNull() & F.col("_rm").isNull(), 1)
            ).alias("after_neardup"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# WARC round-trip curation: the crawl-shaped composition the WARC source
# exists for — export the corpus as WARC segments, read them back through
# the custom data source, then run extract → quality-filter → exact-dedup →
# per-source accounting on what came off the wire.  The DuckDB oracle runs
# the same curation math DIRECTLY on the documents table, so a green row
# proves the WARC write/read path is byte-lossless AND the downstream
# pipeline is correct, in one check.
# ---------------------------------------------------------------------------

# Each exported record carries a deterministic synthetic crawl time —
# _WARC_EPOCH + (doc_id % _WARC_HOURS) hours — so the WARC wire carries a
# usable event-time axis (the streaming curation pipeline watermarks and
# windows on it); the round-trip oracle below ignores it, the
# warc_curation_by_day oracle recomputes it from doc_id.
_WARC_EPOCH = "2026-01-01 00:00:00"
_WARC_HOURS = 48
_MIN_TOKENS = MIN_TOKENS
# Bump when the exported record format changes: folded into the export
# cache key so cached segments from an older exporter are never reused.
_EXPORT_VERSION = 2


def _documents_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the documents table (delegates to the
    generic tables.table_fingerprint — recursive walk, empty-list guard),
    keyed with _EXPORT_VERSION so cached segments from an older exporter
    format are never reused."""
    return table_fingerprint(sf_dir, "documents", _EXPORT_VERSION)


def _warc_export_dir(sf_dir: str) -> str:
    """Per-corpus export directory: content keyed + user scoped (see
    tables.scratch_dir), with a marker file making the export
    write-once."""
    return scratch_dir("warc_curation", _documents_fingerprint(sf_dir))


_ROUNDTRIP_REGISTER = dict(
    oracle=f"""
    WITH ext AS (
        SELECT doc_id, source, lang, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        FROM documents
    ),
    filt AS (SELECT * FROM ext WHERE toks >= {_MIN_TOKENS}),
    canon AS (SELECT MIN(doc_id) AS keep_id FROM filt GROUP BY md5(text)),
    kept AS (SELECT f.* FROM filt f JOIN canon c ON f.doc_id = c.keep_id),
    a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_in
          FROM filt GROUP BY source),
    b AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_kept,
                 CAST(SUM(toks) AS BIGINT) AS tokens_kept,
                 CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
          FROM kept GROUP BY source)
    SELECT a.source AS source, a.docs_in,
           COALESCE(b.docs_kept, 0) AS docs_kept,
           COALESCE(b.tokens_kept, 0) AS tokens_kept,
           COALESCE(b.n_langs, 0) AS n_langs
    FROM a LEFT JOIN b ON a.source = b.source
    ORDER BY source
    """,
    description="WARC round-trip curation pipeline: documents exported as "
    "WARC segments (record id/URI/metadata synthesized, payload = UTF-8 "
    "text), read back through the custom WARC data source (partition per "
    "segment), then doc_id/source/lang re-parsed from the URI, payload "
    "decoded, short docs filtered, exact-deduped (md5 group-by, min-doc_id "
    "canonical), and accounted per source.  The oracle computes the same "
    "curation directly on the parquet table, so equality certifies the "
    "WARC wire format is byte-lossless end-to-end.  Scale shape: the "
    "export is write-once (marker-gated, content-keyed on the corpus "
    "files' sizes+mtimes, user-scoped 0700 dir) with the write "
    "parallelism as "
    "the sharding; the read is partition-per-segment; dedup is a "
    "hash-key group-by (md5 shuffle keys, never full texts twice); the "
    "per-source join is a left join between two source-keyed aggregates",
    tags=("warc", "dedup", "pipeline", "curation"),
)


def export_corpus_as_warc(spark: SparkSession, sf_dir: str) -> str:
    """Export the documents table as WARC segments (write-once per corpus
    content; see ``_warc_export_dir``) and return the segment directory.
    Record id/URI carry doc_id/source/lang; warc_date carries the
    deterministic synthetic crawl time; payload is the UTF-8 text."""
    import os

    from ..sources.warc import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    out = _warc_export_dir(sf_dir)
    marker = os.path.join(out, "_EXPORTED")
    if not os.path.exists(marker):
        import fcntl

        os.makedirs(out, mode=0o700, exist_ok=True)
        # Exclusive build lock (same discipline as merge_upsert_orders):
        # two processes sharing the export dir must not interleave the
        # segment write; the loser re-checks the marker and reuses the
        # winner's segments.
        with open(os.path.join(out, "_LOCK"), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            if not os.path.exists(marker):
                _export_warc_segments(spark, sf_dir, out)
                open(marker, "w").close()
    return out


def _export_warc_segments(spark: SparkSession, sf_dir: str, out: str) -> None:
    docs = table(spark, sf_dir, "documents")
    crawl_ts = F.to_timestamp(F.lit(_WARC_EPOCH)) + F.make_interval(
        hours=(F.col("doc_id") % _WARC_HOURS).cast("int")
    )
    (
        docs.select(
            F.concat(
                F.lit("<urn:doc:"), F.col("doc_id"), F.lit(">")
            ).alias("record_id"),
            F.lit("response").alias("warc_type"),
            F.concat(
                F.lit("http://"),
                F.col("source"),
                F.lit(".corpus.local/"),
                F.col("lang"),
                F.lit("/"),
                F.col("doc_id"),
            ).alias("target_uri"),
            F.date_format(crawl_ts, "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "warc_date"
            ),
            F.lit("text/plain").alias("content_type"),
            F.encode("text", "UTF-8").alias("payload"),
        )
        .write.format("warc")
        .mode("overwrite")
        .save(out)
    )


@register("warc_roundtrip_curation", **_ROUNDTRIP_REGISTER)
def warc_roundtrip_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.curation import extract_warc_docs

    out = export_corpus_as_warc(spark, sf_dir)
    seg = spark.read.format("warc").load(out)
    ext = extract_warc_docs(seg).drop("wts", "day")
    filt = ext.filter(F.col("toks") >= _MIN_TOKENS)
    canon = (
        filt.groupBy(F.md5(F.encode("text", "UTF-8")).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = filt.join(canon, "doc_id", "left_semi")
    a = filt.groupBy("source").agg(F.count("*").cast("long").alias("docs_in"))
    b = kept.groupBy("source").agg(
        F.count("*").cast("long").alias("docs_kept"),
        F.sum("toks").cast("long").alias("tokens_kept"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    return (
        a.join(b, "source", "left")
        .select(
            "source",
            "docs_in",
            F.coalesce("docs_kept", F.lit(0).cast("long")).alias("docs_kept"),
            F.coalesce("tokens_kept", F.lit(0).cast("long")).alias("tokens_kept"),
            F.coalesce("n_langs", F.lit(0).cast("long")).alias("n_langs"),
        )
        .orderBy("source")
    )


@register(
    "warc_curation_by_day",
    oracle=f"""
    WITH ext AS (
        SELECT doc_id, source, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS toks,
               TIMESTAMP '{_WARC_EPOCH}'
                 + to_hours(CAST(doc_id % {_WARC_HOURS} AS BIGINT)) AS wts
        FROM documents
    ),
    filt AS (SELECT *, CAST(wts AS DATE) AS day FROM ext
             WHERE toks >= {_MIN_TOKENS}),
    kept AS (SELECT source, day, MIN(toks) AS toks
             FROM filt GROUP BY source, day, md5(text))
    SELECT day, source,
           CAST(COUNT(*) AS BIGINT) AS docs_kept,
           CAST(SUM(toks) AS BIGINT) AS tokens_kept
    FROM kept
    GROUP BY day, source
    ORDER BY day, source
    """,
    description="incremental WARC curation rollup, batch form: read the "
    "exported WARC segments, extract docs + crawl time (warc_date), "
    "quality-filter, exact-dedup within (source, crawl day) on md5(text), "
    "and roll kept docs/tokens up per (day, source) via 1-day tumbling "
    "windows on the crawl time.  The transformation chain is "
    "streaming.curation.{extract_warc_docs, curate_warc_docs, "
    "daily_source_counts} — the IDENTICAL plan runs as a readStream with "
    "dropDuplicatesWithinWatermark and append-mode window emission "
    "(stream==batch equality asserted in tests/test_streaming.py).  The "
    "day-scoped dedup key makes the rollup arrival-order-invariant, which "
    "is what makes the streaming twin's first-arrival semantics exact.  "
    "Scale shape: partition-per-segment read, md5-key dedup shuffle, "
    "windowed-aggregate state of one row per (day, source)",
    tags=("warc", "dedup", "streaming", "curation"),
)
def warc_curation_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.curation import (
        curate_warc_docs,
        daily_source_counts,
        extract_warc_docs,
    )

    out = export_corpus_as_warc(spark, sf_dir)
    seg = spark.read.format("warc").load(out)
    kept = curate_warc_docs(extract_warc_docs(seg))
    return daily_source_counts(kept).orderBy("day", "source")
