"""Property-based checks for the round-14 primitives, against the SAME
SQL expressions the registered queries ship (evaluated in DuckDB so each
hypothesis example costs milliseconds, no Spark job): the KMV
union-signature exactness lemma, Bloom pass-set monotonicity, the
cross-engine HLL rho/bin() semantics + register-merge associativity, and
the AMS F2 estimator's est >= exact theorem — each for ANY input, which
the fixed-corpus oracles can't enumerate."""

from __future__ import annotations

import hashlib

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
    _CMS_DEPTH,
    _HLL_MAX_RHO,
    _HLL_REST_MOD,
    _cms_bucket_sql,
)
from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
    _BLOOM_K,
    _bloom_pos_sql,
)

FAST = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _hv48(s: str) -> int:
    """The portable 48-bit md5 value (operators.splits
    portable_hex_value_sql) in python — first 12 hex chars as an int."""
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


@FAST
@given(
    st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122),
                    min_size=1, max_size=6), min_size=1, max_size=40),
    st.sets(st.text(st.characters(min_codepoint=97, max_codepoint=122),
                    min_size=1, max_size=6), min_size=1, max_size=40),
)
def test_kmv_union_signature_membership_is_exact(a, b):
    """The lemma kmv_set_difference leans on: every hash in the k-min of
    sig(A) UNION sig(B) that belongs to A must appear in sig(A) — so
    membership flags read from the signatures are EXACT for merged-sketch
    members, for ANY pair of sets.  Also the flag partition identity:
    a_only + b_only + in_both == |union sketch|."""
    k = 4
    ha = sorted(_hv48(x) for x in a)
    hb = sorted(_hv48(x) for x in b)
    sig_a, sig_b = set(ha[:k]), set(hb[:k])
    union_sketch = sorted(sig_a | sig_b)[:k]
    for h in union_sketch:
        assert (h in set(ha)) == (h in sig_a), (h, sorted(a))
        assert (h in set(hb)) == (h in sig_b), (h, sorted(b))
    a_only = sum(1 for h in union_sketch if h in sig_a and h not in sig_b)
    b_only = sum(1 for h in union_sketch if h in sig_b and h not in sig_a)
    both = sum(1 for h in union_sketch if h in sig_a and h in sig_b)
    assert a_only + b_only + both == len(union_sketch)


def _bloom_positions(con, ids):
    if not ids:
        return set()
    vals = ", ".join(f"({i})" for i in ids)
    sel = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql('md5(CAST(i AS VARCHAR))', s)} AS pos "
        f"FROM v" for s in range(_BLOOM_K)
    )
    return {
        r[0] for r in con.sql(f"WITH v(i) AS (VALUES {vals}) {sel}").fetchall()
    }


@FAST
@given(
    st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=25),
    st.sets(st.integers(min_value=0, max_value=10**6), min_size=0, max_size=10),
    st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=15),
)
def test_bloom_filter_monotone_and_no_false_negatives(s1, extra, probes):
    """Using the registered queries' OWN slice SQL (evaluated in DuckDB):
    every inserted key passes its filter (no false negatives), and
    growing the key set never turns a passing probe into a failing one
    (bits are monotone) — for ANY key/probe sets."""
    con = duckdb.connect()
    bits1 = _bloom_positions(con, s1)
    bits2 = _bloom_positions(con, s1 | extra)
    assert bits1 <= bits2

    def passes(bits, pid):
        pos = _bloom_positions(con, {pid})
        return pos <= bits

    for i in s1:
        assert passes(bits1, i), i
    for p in probes:
        if passes(bits1, p):
            assert passes(bits2, p), p


@FAST
@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=60))
def test_hll_rho_cross_engine_and_merge_associativity(ids):
    """DuckDB's length(bin(rest)) — the expression both HLL queries and
    the streaming twin ship — must equal python's bit_length for any
    48-bit hash rest, and max-register merge must be associative over any
    grouping (the events_daily_hll_rollup guarantee)."""
    con = duckdb.connect()
    rows = []
    for i in ids:
        hv = _hv48(str(i))
        bucket, rest = divmod(hv, _HLL_REST_MOD)
        rho_py = _HLL_MAX_RHO if rest == 0 else _HLL_MAX_RHO - rest.bit_length()
        (rho_db,) = con.sql(
            f"SELECT CASE WHEN {rest} = 0 THEN {_HLL_MAX_RHO} "
            f"ELSE {_HLL_MAX_RHO} - length(bin({rest})) END"
        ).fetchone()
        assert rho_db == rho_py, (rest, rho_db, rho_py)
        rows.append((bucket, rho_py))
    whole = {}
    for b, r in rows:
        whole[b] = max(whole.get(b, 0), r)
    # arbitrary 3-way grouping (by id mod 3) then merge-by-max
    parts: list[dict] = [{}, {}, {}]
    for idx, (b, r) in enumerate(rows):
        d = parts[idx % 3]
        d[b] = max(d.get(b, 0), r)
    merged: dict = {}
    for d in parts:
        for b, r in d.items():
            merged[b] = max(merged.get(b, 0), r)
    assert merged == whole


@FAST
@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=80)
)
def test_cms_f2_estimate_dominates_exact(keys):
    """The AMS theorem behind cms_selfjoin_size, with the shipped bucket
    SQL: for ANY key multiset, min over depth of sum(c^2) >= sum(f^2)
    (collisions only add cross terms; every per-row inner product is a
    sum of squared bucket totals that each contain the true f's)."""
    con = duckdb.connect()
    vals = ", ".join(f"({k})" for k in keys)
    branches = " UNION ALL ".join(
        f"SELECT {r} AS r, {_cms_bucket_sql('md5(CAST(k AS VARCHAR))', r)} AS b "
        f"FROM v" for r in range(_CMS_DEPTH)
    )
    (est,) = con.sql(
        f"""WITH v(k) AS (VALUES {vals}),
        cells AS (SELECT r, b, COUNT(*) AS c FROM ({branches}) GROUP BY r, b),
        ip AS (SELECT r, SUM(c * c) AS s FROM cells GROUP BY r)
        SELECT MIN(s) FROM ip"""
    ).fetchone()
    from collections import Counter

    exact = sum(f * f for f in Counter(keys).values())
    assert est >= exact, (est, exact)
