"""Planted-fixture semantics for queries/skyline.py: drive the REAL Spark
plan (bucket-decomposed running max) over a handcrafted part table whose
frontier is known, covering the adversarial shapes the decomposition must
get right — cross-bucket dominance, equal-price chains, duplicate points,
and a bucket whose rows are all dominated from outside.  (The mirror test
proves cross-engine equality on testdata; the hypothesis test in
test_round14_properties.py proves the decomposition law for any input.)
"""

from __future__ import annotations

import pandas as pd

from walmart_e_commerce_sales_data_pipeline_spark import queries as q


def _brute_frontier(points):
    out = []
    for pk, pc, sz in points:
        dominated = any(
            qc <= pc and qs >= sz and (qc < pc or qs > sz)
            for _, qc, qs in points
        )
        if not dominated:
            out.append((pk, pc, sz))
    return sorted(out, key=lambda t: (t[1], t[0]))


def test_skyline_spark_plan_on_planted_fixture(spark, tmp_path):
    # (partkey, price_cents, size) — prices span four $1 buckets.
    points = [
        (1, 90_001, 10),   # frontier: cheapest overall
        (2, 90_001, 10),   # duplicate point — dominance needs a strict edge
        (3, 90_002, 9),    # dominated by 1 (cheaper, bigger)
        (4, 90_050, 25),   # frontier
        (5, 90_150, 25),   # dominated CROSS-BUCKET by 4 (cheaper, equal)
        (6, 90_150, 30),   # frontier
        (7, 90_150, 28),   # equal-price chain: dominated by 6
        (8, 92_000, 5),    # dominated from a bucket two steps earlier
        (9, 93_000, 50),   # frontier: most expensive but largest
        (10, 93_000, 50),  # duplicate of 9 — both kept
    ]
    pdf = pd.DataFrame(
        {
            "p_partkey": [p for p, _, _ in points],
            "p_name": "x",
            "p_brand": "b",
            "p_type": "t",
            "p_size": [s for _, _, s in points],
            "p_retailprice": [c / 100.0 for _, c, _ in points],
        }
    )
    spark.createDataFrame(pdf).write.parquet(f"{tmp_path}/part.parquet")
    got = [
        (r.p_partkey, r.price_cents, r.p_size)
        for r in q.REGISTRY["pareto_frontier_parts"].fn(
            spark, str(tmp_path)
        ).collect()
    ]
    assert got == _brute_frontier(points)
    assert {p for p, _, _ in got} == {1, 2, 4, 6, 9, 10}
