"""Stream-stream interval join: view→purchase attribution.

The classic streaming join shape: two event streams joined on a key with a
time-range condition.  Watermarks on *both* sides bound the join state —
a view can only match purchases up to ``attribution_window`` later, so
once the purchase-side watermark passes ``view.ts + window`` the buffered
view row is evicted.  Without both watermarks the state grows without
bound; Spark enforces this for outer joins and we set them for inner too.

The identical logical condition runs in batch (the oracle-checked
``events_funnel`` pair predicate), which is how the tests pin the
streaming results to ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    views: DataFrame,
    purchases: DataFrame,
    window_minutes: int = 30,
    watermark: str = "40 minutes",
    how: str = "inner",
) -> DataFrame:
    """Pairs of (view, purchase) by the same user with the purchase inside
    ``window_minutes`` after the view.  Works on batch or streaming inputs;
    streaming inputs get watermarks on both sides so join state is bounded.

    ``how="leftOuter"`` is the ABANDONMENT shape: views that never convert
    within the window surface once with null purchase columns.  In batch
    the nulls appear immediately; in streaming Spark holds each view in
    state until the joint watermark proves no qualifying purchase can
    still arrive (view_ts + window < watermark), then emits the null row
    exactly once — which is why outer stream-stream joins REQUIRE the
    watermark + time-range condition this join always carries, and why
    the null rows trail the data by one watermark delay.  The stream ==
    batch equality test closes the tail with far-future sentinel events
    (tests/test_stream_stream_join.py).

    Inputs need columns: user_id, ts (event-time timestamp), event_id.
    """
    v = views.select(
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)

    cond = (
        (v.user_id == p.p_user_id)
        & (p.purchase_ts > v.view_ts)
        & (p.purchase_ts <= v.view_ts + F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return v.join(p, cond, how).select(
        "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts"
    )
