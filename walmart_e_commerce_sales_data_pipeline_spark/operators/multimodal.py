"""Multimodal column handling: images/audio/video as opaque ``binary``
payloads with typed metadata, processed through Arrow-batched
``mapInPandas`` — the one place in this engine where Python is the right
tool (codec libraries are C/Python, not JVM).

The actual media decoding is STUBBED (this container ships no image/audio
libraries): ``decode_stub`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested.  Everything around the stub — the
schema contract, Arrow batch shapes, partitioning, and the feature-table
output — is real and tested, so swapping in PIL/torchaudio later changes
one function.

Scale posture: payloads stay in the ``binary`` column (parquet keeps them
compressed and column-pruned away unless selected); feature extraction is
embarrassingly parallel per partition with bounded Arrow batch memory
(``spark.sql.execution.arrow.maxRecordsPerBatch``).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("byte_mean", DoubleType(), True),
        StructField("byte_max", IntegerType(), True),
    ]
)


def decode_stub(payload: bytes, kind: str, fake: bool = False) -> bytes:
    """Placeholder for the real codec call (PIL.Image.open / soundfile /
    pyav frame sampling).  ``fake=True`` returns the payload unchanged as a
    deterministic stand-in so the surrounding plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    return payload


def extract_features(df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched per-partition feature extraction over binary payloads.

    The pandas iterator keeps memory bounded to one Arrow batch at a time;
    numpy does the per-payload work vectorized where possible.
    """

    # The closure must be fully self-contained: Spark's Python workers
    # unpickle it in a fresh interpreter that may not have this package on
    # its path (the driver process is not the worker process), so no
    # references to module-level names are allowed here.
    def batches(it: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        def _decode(payload: bytes, kind: str) -> bytes:
            if not fake_decode:
                raise NotImplementedError(
                    "media codecs are not available in this environment; "
                    "pass fake_decode=True for the deterministic test decoder"
                )
            return payload

        for pdf in it:
            decoded = [
                None if p is None else _decode(bytes(p), k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            arrs = [None if d is None else np.frombuffer(d, dtype=np.uint8) for d in decoded]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [None if a is None else int(a.size) for a in arrs],
                    "byte_mean": [
                        None if a is None or a.size == 0 else float(a.mean()) for a in arrs
                    ],
                    "byte_max": [
                        None if a is None or a.size == 0 else int(a.max()) for a in arrs
                    ],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def synthesize_media_table(
    spark: SparkSession, source: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic fake media table: each document's UTF-8 bytes become a
    payload, cycled across the three kinds, with typed metadata.  Lets the
    multimodal plumbing run on driver testdata without binary fixtures."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return source.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(
            F.lit("origin"), F.lit("synthetic"),
            F.lit("codec"), F.lit("raw"),
        ).alias("meta"),
    )
