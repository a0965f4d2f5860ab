"""Registry entries for the session-window operator and the multimodal
feature pipeline.  Both are genuinely non-SQL-expressible in DuckDB
(stateful session windows; Arrow/pandas batch extraction), so they are
registered without oracles — the driver records rows-only checks and the
test suite provides the semantic validation (session_window vs the
lag+cumsum oracle-checked sessionization; feature values vs direct
byte math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, synthesize_media_table
from ..streaming.events import session_window_agg
from .registry import register
from .tables import table


@register(
    "events_session_window",
    oracle=None,  # stateful session windows have no DuckDB equivalent
    description="per-user sessionization via the native session_window "
    "operator (30-min gap), batch form of the streaming sessionizer "
    "(streaming.events.session_window_agg); cross-checked in tests against "
    "the oracle-verified lag+cumsum sessionization",
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


@register(
    "multimodal_features",
    oracle=None,  # Arrow/mapInPandas feature extraction is not SQL
    description="multimodal binary-column pipeline: documents → synthetic "
    "media payloads (binary + typed meta map) → Arrow-batched mapInPandas "
    "feature extraction (operators.multimodal, decode stubbed) → per-kind "
    "aggregate",
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
