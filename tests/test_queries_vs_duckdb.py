"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle at sf0.01, compare row count, column
names, and (order-insensitively) the values themselves.

The comparison is deliberately strict — exact equality for ints/strings,
exact float equality for rounded doubles (both engines must emit the same
bits after rounding, which is the property the driver's value-hash needs).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from tests.conftest import SF001
from walmart_e_commerce_sales_data_pipeline_spark import queries as q

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF001}/{t}.parquet')"
        )
    yield con
    con.close()


def _type_class(t) -> str:
    """Coarse Arrow type class: exact width for ints (int64 vs decimal128
    is the divergence that breaks the driver hash), family otherwise."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        return str(t)
    if pa.types.is_decimal(t):
        return str(t)
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_type_class(t.value_type)}>"
    return str(t)


def _normalize(rows, columns):
    """Sort columns by name then rows by value, like the driver's hash."""
    idx = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                # guard against -0.0 vs 0.0 and NaN identity
                if math.isnan(v):
                    v = "NaN"
                elif v == 0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [c for _, c in sorted(zip(range(len(columns)), columns), key=lambda p: columns[p[0]])], out


ORACLE_QUERIES = sorted(q.oracle_map())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    query = q.REGISTRY[name]
    sdf = query.fn(spark, SF001)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    ddf = duck.sql(query.oracle)
    duck_cols = list(ddf.columns)
    duck_rows = [tuple(r) for r in ddf.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )

    # Type-class check at the Arrow layer: the driver's value hash is
    # type-sensitive, so a DuckDB HUGEINT (decimal128) vs Spark BIGINT
    # divergence fails there even when Python-level values agree (the
    # round-1 stratified_sample_stats red row).  Compare coarse classes so
    # benign physical differences (tz annotation, string width) still pass.
    s_types = {f.name: _type_class(f.type) for f in sdf.toArrow().schema}
    d_types = {f.name: _type_class(f.type) for f in ddf.arrow().schema}
    assert s_types == d_types, f"{name}: arrow type classes differ: {s_types} vs {d_types}"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )

    _, s_norm = _normalize(spark_rows, spark_cols)
    _, d_norm = _normalize(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_norm, d_norm)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 1
    assert df.columns[0] == "l_returnflag"


def test_registry_complete():
    """Every oracle has a query; descriptions exist."""
    for name, query in q.REGISTRY.items():
        assert query.fn is not None
        assert query.description, f"{name} missing description"


def test_documents_never_empty(duck):
    """The multimodal oracle's per-byte UNNEST drops zero-length payloads;
    the synthetic corpus guarantees none exist (payload = UTF-8 text)."""
    (n,) = duck.sql(
        "SELECT COUNT(*) FROM documents WHERE octet_length(encode(text)) = 0"
    ).fetchone()
    assert n == 0


def test_checked_window_composition():
    """The external harness checks a prefix of the registry in
    registration order; pin the curated invariants so a future module
    import or decorator reorder can't silently push an unverified query
    out of the window."""
    names = list(q.REGISTRY)
    from walmart_e_commerce_sales_data_pipeline_spark.queries import _PRIORITY

    assert len(_PRIORITY) == 50
    assert names[:50] == _PRIORITY
    # Round-11 rotation policy: the checked window is the 50 queries with
    # the oldest external evidence (computed by tools/rotate_window.py).
    # Staleness histogram entering r11: never:7 / r8:35 / r9:50 / r10:50 —
    # the window is the seven never-externally-green round-11 additions,
    # all 35 r8-green queries, and the 8 stalest r9-green ones.
    window = set(names[:50])
    # The never-externally-green round-11 additions lead unconditionally.
    assert _PRIORITY[0] == "dup_cluster_size_dist_star"
    assert _PRIORITY[1] == "merge_upsert_orders"
    assert _PRIORITY[2] == "concurrent_sessions_profile"
    assert _PRIORITY[3] == "mad_outlier_rate"
    assert _PRIORITY[4] == "pii_redaction_stats"
    assert _PRIORITY[5] == "hll_distinct_sketch"
    assert _PRIORITY[6] == "weighted_sample_aes"
    # The 35 queries whose newest external evidence is r8 follow, in prior
    # registry order.
    assert _PRIORITY[7:42] == [
        "join_anti",
        "join_full_outer",
        "window_topk_orders",
        "window_running_total",
        "kmv_sketch_union",
        "sliding_chunk_windows",
        "bigram_pmi",
        "dup_graph_degree_hist",
        "winsorized_price_stats",
        "ngram_distribution_profile",
        "cross_source_dup_matrix",
        "scd2_user_state_history",
        "state_as_of_label_time",
        "dedup_cluster_density",
        "text_token_entropy",
        "doc_unigram_logprob",
        "kmv_distinct_sketch",
        "promo_revenue_share",
        "trailing_spend_range_frame",
        "market_share_by_year",
        "bilateral_trade_volume",
        "product_profit_by_nation_year",
        "returned_item_customers",
        "priority_shipping_split",
        "brand_supplier_counts",
        "order_priority_checking",
        "important_supplier_share",
        "small_quantity_order_revenue",
        "excess_shipping_suppliers",
        "similarity_pairs",
        "similarity_topk",
        "similarity_pairs_blocked",
        "similarity_lsh",
        "similarity_topk_ivf",
        "multimodal_features",
    ]
    # Nothing green in round 10 re-occupies a window slot — the window is
    # reserved for the stalest evidence.
    r10_green_sample = {
        "warc_curation_by_day", "label_centroid_similarity",
        "event_interarrival_profile", "vocab_oov_rate",
        "prefix_dup_groups", "profile_documents", "monthly_avg_value",
        "events_hourly_window", "join_customer_orders", "join_semi",
        "quantize_embeddings", "orders_rfm_segments",
    }
    assert not (r10_green_sample & window)
    # Likewise the freshest r9-green queries stay out; only the 8
    # stalest r9-green ones fill the window tail (agg_suite and
    # date_functions, the 9th and 10th stalest, were displaced by the
    # never-green hll_distinct_sketch and weighted_sample_aes).
    r9_fresh_sample = {
        "dedup_ngram_jaccard", "decontaminate_corpus",
        "corpus_clean_pipeline", "dedup_minhash_lsh",
        "asof_join_latest_order", "cdc_chunk_stats",
        "warc_roundtrip_curation", "union_all_monthly", "dedup_exact",
        "case_when_tiers",
    }
    assert not (r9_fresh_sample & window)
    assert _PRIORITY[42:] == [
        "pricing_summary",
        "regional_revenue",
        "top10_expensive_items",
        "set_operations",
        "distinct_counts",
        "rollup_customer_geo",
        "cube_order_status",
        "string_functions",
    ]
    # every query everywhere carries an exact oracle
    assert all(entry.oracle for entry in q.REGISTRY.values())


def test_bench_headline_names_are_registered():
    """Every bench.py HEADLINE entry must name a registered query — a
    typo'd or renamed entry would crash bench.py only at round-end, on
    the driver's machine, mid-measurement."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", str(__import__("pathlib").Path(__file__).parent.parent / "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    missing = [n for n in bench.HEADLINE if n not in q.REGISTRY]
    assert not missing, f"bench HEADLINE names unknown queries: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dups
