"""Named query registry — the driver contract surface.

Importing this package populates ``REGISTRY`` with every implemented query
(core relational, event-time, dedup, similarity, text analysis).
"""

from . import events, relational  # noqa: F401  (registration side effects)
from .registry import REGISTRY, Query, oracle_map, register, spark_queries  # noqa: F401

from . import (  # noqa: F401
    clusters,
    corpus,
    dedup,
    grouped_pandas,
    product_analytics,
    profiling,
    relational2,
    relational3,
    similarity,
    streaming_media,
    text,
)
