"""Streaming corpus curation over the WARC wire format.

The batch ``warc_roundtrip_curation`` query (queries/corpus.py) proves the
WARC write/read path is byte-lossless; this module is its incremental twin
— the same extract → quality-filter → exact-dedup → per-source accounting
chain, factored so the identical logical plan runs over a batch
``spark.read.format("warc")`` and a ``spark.readStream.format("warc")``
(micro-batch directory tail).  Only the dedup stage branches:
``dropDuplicatesWithinWatermark`` on a stream (per-key state evicted once
the watermark passes, so state is bounded by the horizon's key
cardinality), plain ``dropDuplicates`` on a batch — identical results
whenever all duplicates of a key arrive within the horizon.

Event time is the WARC crawl time (``warc_date``): the exporter stamps a
deterministic synthetic crawl hour per document, the extractor parses it
back to a timestamp, and the curation windows/watermarks on it — exactly
the shape of an incremental crawl-ingest pipeline (CommonCrawl-style:
new segments land, get curated once, counts roll up per crawl day).

At scale: the stream reads partition-per-segment; dedup shuffles md5 keys
(never full texts twice); the daily rollup is a windowed aggregate whose
state is one row per (day, source) — config-sized, not data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Quality gate: documents with fewer whitespace tokens are dropped.
MIN_TOKENS = 5


def extract_warc_docs(seg: DataFrame) -> DataFrame:
    """Re-parse document fields from WARC records as written by
    ``queries.corpus.export_corpus_as_warc``: doc_id/source/lang from the
    target URI, text from the payload, token count, and the crawl time
    (``wts`` timestamp + ``day`` date) from ``warc_date``.  Works on batch
    and streaming frames alike — pure narrow projections."""
    return (
        seg.select(
            F.regexp_extract("target_uri", r"/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.regexp_extract("target_uri", r"^http://([^.]+)\.", 1).alias(
                "source"
            ),
            F.regexp_extract("target_uri", r"corpus\.local/([^/]+)/", 1).alias(
                "lang"
            ),
            F.decode(F.col("payload"), "UTF-8").alias("text"),
            F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "wts"
            ),
        )
        .withColumn("toks", F.size(F.split(F.col("text"), " ")).cast("long"))
        .withColumn("day", F.to_date("wts"))
    )


def curate_warc_docs(docs: DataFrame, watermark: str = "25 hours") -> DataFrame:
    """Quality-filter then exact-dedup within (source, crawl day).

    The dedup key is ``(source, day, md5(text))`` — scoping dedup to the
    crawl day makes the kept-counts arrival-order-invariant (every
    duplicate of a key shares source, day and token count, so WHICH row
    survives cannot change any downstream aggregate), which is what lets
    the streaming first-arrival semantics and the batch arbitrary-row
    semantics produce identical rollups.

    Streaming input: ``dropDuplicatesWithinWatermark`` keyed on the hash,
    state bounded by the watermark horizon.  Batch input: plain
    ``dropDuplicates`` on the same key.

    The default watermark covers the full dedup-key scope: because the
    key is day-scoped, two duplicates of one key can be up to ~24 h apart
    in event time, so the horizon must be >= 1 day (plus lateness slack,
    hence 25 h) for stream==batch equality to hold under multi-batch
    arrival.  A shorter watermark trades state size for a weaker
    contract: a duplicate arriving after its key's state was evicted
    survives in the stream but not in batch.
    """
    filt = docs.filter(F.col("toks") >= MIN_TOKENS).withColumn(
        "_h", F.md5(F.encode("text", "UTF-8"))
    )
    key = ["source", "day", "_h"]
    if filt.isStreaming:
        return filt.withWatermark("wts", watermark).dropDuplicatesWithinWatermark(
            key
        )
    return filt.dropDuplicates(key)


def daily_source_counts(kept: DataFrame) -> DataFrame:
    """Per-(crawl day, source) rollup of the curated stream: kept-doc and
    kept-token counts over 1-day tumbling windows on the crawl time.  In
    streaming append mode a (day, source) row is emitted exactly once —
    when the watermark passes the day's end — which is the idempotent
    incremental-ingest contract; on a batch frame ``window`` degenerates
    to a plain group-by over the same keys."""
    return (
        kept.groupBy(F.window("wts", "1 day").alias("w"), F.col("source"))
        .agg(
            F.count("*").cast("long").alias("docs_kept"),
            F.sum("toks").cast("long").alias("tokens_kept"),
        )
        .select(
            F.to_date(F.col("w.start")).alias("day"),
            "source",
            "docs_kept",
            "tokens_kept",
        )
    )
