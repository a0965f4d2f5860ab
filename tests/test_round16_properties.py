"""Round-16 guard pins for the r15 ADVICE findings: the forward-decay
shift-range guard (out-of-range events must fail loudly in Spark instead
of Java silently masking the shift count mod 64), the seasonal
decomposition's gap-free-calendar assertion, and the negative-sampling
collision dedup (no duplicate (customer, part) negatives may survive)."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF0001


def test_forward_decay_rejects_pre_landmark_event(spark):
    """An event timestamped BEFORE the landmark used to hit
    shiftleft(1, negative) — Java masks the count mod 64 and produces a
    silently-garbage weight while DuckDB's << raises.  The guard makes
    both engines fail together."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_forward_decay,
    )

    ev = spark.createDataFrame(
        [(dt.datetime(2023, 12, 31, 12, 0), 1, 5.0)],
        "ts timestamp, user_id bigint, value double",
    )
    with pytest.raises(Exception, match="forward-decay"):
        hourly_user_forward_decay(ev).collect()


def test_forward_decay_rejects_post_horizon_event(spark):
    """An event more than 62 days past the landmark would overflow the
    BIGINT term (and Java would mask shifts >= 64) — the guard demands a
    landmark renormalization instead."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_forward_decay,
    )

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 3, 15, 12, 0), 1, 5.0)],  # day 74 > 62
        "ts timestamp, user_id bigint, value double",
    )
    with pytest.raises(Exception, match="forward-decay"):
        hourly_user_forward_decay(ev).collect()


def test_forward_decay_in_range_unchanged(spark):
    """The guard is a no-op for in-horizon events: cents << days."""
    from walmart_e_commerce_sales_data_pipeline_spark.streaming.events import (
        hourly_user_forward_decay,
    )

    ev = spark.createDataFrame(
        [(dt.datetime(2024, 1, 3, 12, 0), 1, 5.0)],  # day 2
        "ts timestamp, user_id bigint, value double",
    )
    row = hourly_user_forward_decay(ev).collect()[0]
    assert row.acc_fw == 500 << 2


def test_seasonal_decomposition_raises_on_month_gap(spark, tmp_path):
    """A missing calendar month would silently misalign the row-based
    2x12 MA frames; the guard raises in both engines instead."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        revenue_seasonal_decomposition,
    )

    # 30 consecutive months (so every month-of-year gets a seasonal mean
    # and the gapped row survives the join and is actually emitted),
    # then a gap: 2024-07 missing, 2024-08 present.
    rows = [
        (dt.date(2022 + m // 12, m % 12 + 1, 15), 100.0 + m)
        for m in range(30)
    ] + [(dt.date(2024, 8, 15), 200.0)]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    with pytest.raises(Exception, match="calendar gap"):
        revenue_seasonal_decomposition(spark, str(tmp_path)).collect()


def test_negative_samples_no_duplicate_pairs(spark):
    """Two draw indices hashing to the same part mod the keyspace must
    collapse to one candidate (minimum draw index) — a training batch
    must never contain duplicate negatives for one customer."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        training_negative_samples,
    )

    out = training_negative_samples(spark, SF0001).collect()
    pairs = [(r.o_custkey, r.neg_partkey) for r in out]
    assert len(pairs) == len(set(pairs))
