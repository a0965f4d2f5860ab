"""The sketch_only= production tier (VERDICT r13 item 6): four headline
queries carry an exact-truth branch purely so the oracle can verify the
estimator; sketch_only=True is the branch a production run keeps.  These
tests pin (a) the tier drops NO estimator information — every estimate
equals the default path's bit-for-bit where the estimator is
deterministic, (b) the approximate tiers stay within their documented
error envelopes, and (c) bench.py's tier list names real queries that
accept the keyword.
"""

from __future__ import annotations

import inspect
import os
import sys

from walmart_e_commerce_sales_data_pipeline_spark import queries as q

from tests.conftest import SF001

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_histogram_quantile_sketch_tier_matches_default_estimates(spark):
    d = {
        (r["l_returnflag"], r["quantile"]): r["hist_est"]
        for r in q.REGISTRY["histogram_quantile_sketch"].fn(spark, SF001).collect()
    }
    s = {
        (r["l_returnflag"], r["quantile"]): r["hist_est"]
        for r in q.REGISTRY["histogram_quantile_sketch"]
        .fn(spark, SF001, sketch_only=True)
        .collect()
    }
    assert s == d  # the tier drops the exact columns, never the estimate


def test_kmv_tiers_match_default_estimates(spark):
    d = {
        (r["lang_a"], r["lang_b"]): r["kmv_jaccard_est"]
        for r in q.REGISTRY["kmv_jaccard_langs"].fn(spark, SF001).collect()
    }
    s = {
        (r["lang_a"], r["lang_b"]): r["kmv_jaccard_est"]
        for r in q.REGISTRY["kmv_jaccard_langs"]
        .fn(spark, SF001, sketch_only=True)
        .collect()
    }
    assert s == d
    dd = {
        (r["lang_a"], r["lang_b"]): (r["est_union"], r["est_a_only"], r["est_b_only"])
        for r in q.REGISTRY["kmv_set_difference"].fn(spark, SF001).collect()
    }
    ss = {
        (r["lang_a"], r["lang_b"]): (r["est_union"], r["est_a_only"], r["est_b_only"])
        for r in q.REGISTRY["kmv_set_difference"]
        .fn(spark, SF001, sketch_only=True)
        .collect()
    }
    assert ss == dd


def test_mad_tier_stays_within_sketch_error_envelope(spark):
    """percentile_approx's default accuracy (10000) bounds rank error at
    ~1/10000; on this data the approximate med/mad must land within 1% of
    the exact ladder and classify (nearly) the same outliers."""
    d = {r["l_returnflag"]: r for r in q.REGISTRY["mad_outlier_rate"].fn(spark, SF001).collect()}
    s = {
        r["l_returnflag"]: r
        for r in q.REGISTRY["mad_outlier_rate"]
        .fn(spark, SF001, sketch_only=True)
        .collect()
    }
    assert set(s) == set(d)
    for k in d:
        assert abs(s[k]["med"] - d[k]["med"]) <= 0.01 * d[k]["med"], (k, s[k], d[k])
        assert abs(s[k]["mad"] - d[k]["mad"]) <= 0.01 * d[k]["mad"], (k, s[k], d[k])
        assert abs(s[k]["outlier_rate"] - d[k]["outlier_rate"]) <= 0.005
    assert list(s[k].asDict()) == list(d[k].asDict())  # same schema


def test_embedding_top_pc_float_tier_recovers_planted_direction(spark, tmp_path):
    """The double-precision tier must recover the true top eigenvector on
    an anisotropic corpus (same bar the integer path meets) — float
    convergence replaces exact replayability, not correctness."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    u = rng.standard_normal(64)
    u /= np.linalg.norm(u)
    w = rng.standard_normal((300, 1)) * 3.0
    emb = w * u + 0.15 * rng.standard_normal((300, 64))
    pd.DataFrame(
        {
            "vec_id": range(300),
            "embedding": [r.astype(np.float32).tolist() for r in emb],
            "label": [0] * 300,
        }
    ).to_parquet(f"{tmp_path}/embeddings.parquet")
    rows = (
        q.REGISTRY["embedding_top_pc"]
        .fn(spark, str(tmp_path), sketch_only=True)
        .collect()
    )
    assert len(rows) == 64
    loading = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    g = emb.astype(np.float32).T.astype(np.float64) @ emb.astype(np.float32).astype(
        np.float64
    )
    wv, vv = np.linalg.eigh(g)
    top = vv[:, np.argmax(wv)]
    cos = abs(float(loading @ top) / (np.linalg.norm(loading) * np.linalg.norm(top)))
    assert cos >= 0.99, cos
    assert abs(rows[0]["pc1_share"] - wv.max() / np.trace(g)) <= 0.05


def test_bench_tier_list_names_registered_queries_accepting_the_kwarg():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", str(Path(__file__).parent.parent / "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench.SKETCH_ONLY_TIER
    for name in bench.SKETCH_ONLY_TIER:
        assert name in q.REGISTRY, name
        assert name in bench.HEADLINE, name
        sig = inspect.signature(q.REGISTRY[name].fn)
        assert "sketch_only" in sig.parameters, name
        assert sig.parameters["sketch_only"].default is False, name


def test_cms_heavy_hitters_tier_returns_the_maintained_counter_matrix(spark):
    """sketch_only=True returns the depth x width counter matrix itself —
    total cell mass = depth x occurrences, and probing the matrix for
    the default path's top items reproduces its cms_est exactly (the
    tier drops the exact-truth branch, never sketch information)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        _CMS_DEPTH,
        _CMS_WIDTH,
    )

    default = q.REGISTRY["cms_heavy_hitters"].fn(spark, SF001).collect()
    cells = (
        q.REGISTRY["cms_heavy_hitters"].fn(spark, SF001, sketch_only=True).collect()
    )
    assert len(cells) <= _CMS_DEPTH * _CMS_WIDTH
    assert {r["r"] for r in cells} == set(range(_CMS_DEPTH))
    import hashlib

    mat = {(r["r"], r["b"]): r["c"] for r in cells}
    n_occ = sum(c for (r, _b), c in mat.items() if r == 0)
    assert sum(mat.values()) == _CMS_DEPTH * n_occ
    for row in default:
        h = hashlib.md5(row["shingle"].encode()).hexdigest()
        est = min(
            mat.get((r, int(h[2 * r : 2 * r + 2], 16)), 0)
            for r in range(_CMS_DEPTH)
        )
        assert est == row["cms_est"], (row, est)


def test_kmv_sketch_union_tier_matches_default_estimates(spark):
    d = q.REGISTRY["kmv_sketch_union"].fn(spark, SF001).collect()[0]
    s = q.REGISTRY["kmv_sketch_union"].fn(spark, SF001, sketch_only=True).collect()[0]
    for col in ("est_a", "est_b", "est_union", "est_inter"):
        assert s[col] == d[col], (col, s[col], d[col])
    assert list(s.asDict()) == ["est_a", "est_b", "est_union", "est_inter"]
