"""Registry entries for the session-window operator and the multimodal
feature pipeline.

The session-window query gets a full DuckDB oracle: although the
``session_window`` *operator* is stateful-streaming-native, its batch
semantics are expressible as gap-detection SQL — with two traps mirrored
exactly: (1) session windows are half-open ``[t, t+gap)`` intervals, so a
new session starts when the inter-event delta is **≥** gap (the lag+cumsum
sessionization query uses strict ``>``), and (2) the operator runs on the
µs-truncated event timestamp, not the raw ns long.

The multimodal pipeline (Arrow/pandas batch extraction) remains genuinely
non-SQL-expressible → rows-only driver check + test-suite validation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, synthesize_media_table
from ..streaming.events import session_window_agg
from .registry import register
from .tables import table


_GAP_US = 30 * 60 * 1_000_000  # session_window runs on µs timestamps

@register(
    "events_session_window",
    oracle=f"""
    WITH x AS (SELECT user_id, epoch_ns(ts) // 1000 AS t_us FROM events),
    flagged AS (
        SELECT user_id,
               CASE WHEN LAG(t_us) OVER w IS NULL
                         OR t_us - LAG(t_us) OVER w >= {_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM x
        WINDOW w AS (PARTITION BY user_id ORDER BY t_us)
    ),
    per_user AS (
        SELECT user_id,
               SUM(is_new) AS n_sessions,
               COUNT(*) AS n_events
        FROM flagged GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_sessions AS BIGINT) AS n_sessions,
           CAST(n_events AS BIGINT) AS n_events
    FROM per_user
    ORDER BY user_id
    """,
    description="per-user sessionization via the native session_window "
    "operator (30-min gap), batch form of the streaming sessionizer "
    "(streaming.events.session_window_agg); oracle mirrors the operator's "
    "half-open [t, t+gap) semantics — a new session starts at delta >= gap "
    "(strict > would diverge) — on the µs-truncated event time",
    tags=("event-time", "session", "streaming-capable"),
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        session_window_agg(ev)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.sum("ev_cnt").alias("n_events"))
        .orderBy("user_id")
    )


# The synthetic payload is the document's UTF-8 bytes, so the Arrow-side
# byte math has an exact SQL mirror: hex(encode(text)) exposes each byte
# as a hex pair, and instr-on-hex-alphabet decodes pairs back to byte
# values — externally verifying the mapInPandas kernel (n_bytes, byte_max
# per payload) that would otherwise be pytest-only.  Docs are never empty
# (asserted in tests), so the per-byte UNNEST never drops a document.
_MM_BYTE = (
    "(instr('0123456789ABCDEF', substring(h, 2*i - 1, 1)) - 1) * 16"
    " + (instr('0123456789ABCDEF', substring(h, 2*i, 1)) - 1)"
)


@register(
    "multimodal_features",
    oracle=f"""
    WITH m AS (
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               hex(encode(text)) AS h,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    b AS (
        SELECT doc_id, kind, n_bytes, MAX({_MM_BYTE}) AS byte_max
        FROM m, UNNEST(range(1, n_bytes + 1)) AS u(i)
        GROUP BY doc_id, kind, n_bytes
    )
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(byte_max) AS INTEGER) AS max_byte
    FROM b
    GROUP BY kind
    ORDER BY kind
    """,
    description="multimodal binary-column pipeline: documents → synthetic "
    "media payloads (binary + typed meta map) → Arrow-batched mapInPandas "
    "feature extraction (operators.multimodal, decode stubbed) → per-kind "
    "aggregate; the oracle re-derives every byte from hex(encode(text)) "
    "pairs, so the Arrow kernel is externally verified byte-for-byte",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    media = synthesize_media_table(spark, docs)
    feats = extract_features(media, fake_decode=True)
    return (
        feats.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("byte_max").alias("max_byte"),
        )
        .orderBy("kind")
    )
