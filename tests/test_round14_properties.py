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


@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),          # user
            st.sampled_from(["view", "purchase"]),
            st.integers(0, 200_000),    # seconds offset
            st.integers(1, 10_000_000), # cents
        ),
        min_size=1,
        max_size=60,
    )
)
@FAST
def test_attribution_conserves_every_purchase_cent(events):
    """multi_touch_attribution's ledger law for ANY event stream: the
    largest-remainder split is exact integer arithmetic, so
    sum(attributed_cents) + sum(direct_cents) == sum(purchase cents),
    and per-purchase credits sum exactly to that purchase's value.
    Evaluated through the SAME SQL the oracle ships (DuckDB, relation
    built from the hypothesis rows)."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev(event_id BIGINT, user_id BIGINT, "
        "event_type VARCHAR, ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO ev VALUES (?, ?, ?, "
        "TIMESTAMP '2024-01-01 00:00:00' + to_seconds(?), ?)",
        [(i, u, t, s, c / 100.0) for i, (u, t, s, c) in enumerate(events)],
    )
    out = con.execute(
        """
        WITH p AS (
            SELECT event_id AS p_id, user_id, epoch_ns(ts) AS p_ns,
                   CAST(ROUND(value * 100.0) AS BIGINT) AS cents
            FROM ev WHERE event_type = 'purchase'
        ),
        v AS (
            SELECT event_id AS v_id, user_id, epoch_ns(ts) AS v_ns
            FROM ev WHERE event_type = 'view'
        ),
        j AS (
            SELECT p.p_id, p.user_id, p.cents, v.v_id, v.v_ns
            FROM p LEFT JOIN v
              ON p.user_id = v.user_id
             AND v.v_ns <= p.p_ns
             AND v.v_ns > p.p_ns - 86400000000000
        ),
        credited AS (
            SELECT user_id, p_id, cents,
                   ROW_NUMBER() OVER (
                       PARTITION BY p_id ORDER BY v_ns DESC, v_id) AS rk,
                   COUNT(*) OVER (PARTITION BY p_id) AS n
            FROM j WHERE v_id IS NOT NULL
        ),
        per_view AS (
            SELECT user_id, p_id, cents,
                   cents // n
                       + CASE WHEN rk = 1 THEN cents % n ELSE 0 END AS credit
            FROM credited
        )
        SELECT
            (SELECT COALESCE(SUM(credit), 0) FROM per_view)
              + (SELECT COALESCE(SUM(cents), 0) FROM j WHERE v_id IS NULL)
              AS ledger,
            (SELECT COALESCE(SUM(cents), 0) FROM p) AS total,
            (SELECT COUNT(*) FROM (
                SELECT p_id FROM per_view
                GROUP BY p_id, cents HAVING SUM(credit) <> cents)) AS broken
        """
    ).fetchone()
    ledger, total, broken = out
    assert ledger == total, (ledger, total)
    assert broken == 0


@given(
    st.lists(
        st.tuples(st.integers(89_000, 101_000), st.integers(1, 50)),
        min_size=1,
        max_size=80,
    )
)
@FAST
def test_skyline_decomposition_equals_brute_force(points):
    """pareto_frontier_parts' sort-based decomposition (running max over
    strictly-cheaper rows, prefix-scanned across $1 buckets, plus the
    equal-price group max) must equal definitional NOT-EXISTS dominance
    for ANY point set — including duplicate points, equal-price chains,
    and cross-bucket dominance.  Evaluated via the same SQL formulas in
    DuckDB so each example costs milliseconds."""
    con = duckdb.connect()
    con.execute("CREATE TABLE pts(id BIGINT, price_cents BIGINT, sz INT)")
    con.executemany(
        "INSERT INTO pts VALUES (?, ?, ?)",
        [(i, p, s) for i, (p, s) in enumerate(points)],
    )
    brute = set(
        r[0]
        for r in con.execute(
            """
            SELECT id FROM pts p
            WHERE NOT EXISTS (
                SELECT 1 FROM pts q
                WHERE q.price_cents <= p.price_cents AND q.sz >= p.sz
                  AND (q.price_cents < p.price_cents OR q.sz > p.sz))
            """
        ).fetchall()
    )
    decomposed = set(
        r[0]
        for r in con.execute(
            """
            WITH b AS (SELECT *, price_cents // 100 AS bucket FROM pts),
            bmax AS (
                SELECT bucket, MAX(sz) AS bucket_max FROM b GROUP BY bucket
            ),
            prev AS (
                SELECT bucket,
                       MAX(bucket_max) OVER (
                           ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ) AS prev_bucket_max
                FROM bmax
            ),
            eq AS (
                SELECT price_cents, MAX(sz) AS eq_max FROM b GROUP BY 1
            ),
            scanned AS (
                SELECT b.id, b.sz, eq.eq_max,
                       GREATEST(
                           COALESCE(MAX(b.sz) OVER (
                               PARTITION BY b.bucket ORDER BY b.price_cents
                               RANGE BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING), -1),
                           COALESCE(prev.prev_bucket_max, -1)
                       ) AS cheaper_max
                FROM b
                JOIN prev ON b.bucket = prev.bucket
                JOIN eq ON b.price_cents = eq.price_cents
            )
            SELECT id FROM scanned
            WHERE cheaper_max < sz AND eq_max = sz
            """
        ).fetchall()
    )
    assert brute == decomposed


@given(
    st.lists(
        st.tuples(
            st.integers(1, 12),         # month
            st.integers(1, 10_000_00),  # cents
            st.integers(0, 99),         # key residue driving ins/del/base
        ),
        min_size=1,
        max_size=60,
    )
)
@FAST
def test_ivm_retraction_algebra_equals_recompute(rows):
    """incremental_rollup_maintenance's identity for ANY base/delta split:
    maintaining the rollup from signed-multiplicity deltas (+1 insert /
    -1 retraction of a base row) must equal the full recompute, and
    groups whose count reaches zero must vanish.  Evaluated through the
    same SQL shapes the oracle ships (base = r%17<>0, insert = r%17=0,
    delete = base AND r%23=0)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE o(k BIGINT, m INT, cents BIGINT)")
    con.executemany(
        "INSERT INTO o VALUES (?, ?, ?)",
        [(r, m, c) for m, c, r in rows],
    )
    out = con.execute(
        """
        WITH base AS (SELECT * FROM o WHERE k % 17 <> 0),
        delta AS (
            SELECT m, cents, 1 AS op FROM o WHERE k % 17 = 0
            UNION ALL
            SELECT m, cents, -1 FROM o WHERE k % 17 <> 0 AND k % 23 = 0
        ),
        base_mv AS (
            SELECT m, COUNT(*) AS n, SUM(cents) AS c FROM base GROUP BY m
        ),
        delta_mv AS (
            SELECT m, SUM(op) AS dn, SUM(op * cents) AS dc
            FROM delta GROUP BY m
        ),
        maintained AS (
            SELECT COALESCE(b.m, d.m) AS m,
                   COALESCE(b.n, 0) + COALESCE(d.dn, 0) AS n,
                   COALESCE(b.c, 0) + COALESCE(d.dc, 0) AS c
            FROM base_mv b FULL OUTER JOIN delta_mv d ON b.m = d.m
        ),
        truth AS (
            SELECT m, COUNT(*) AS n, SUM(cents) AS c
            FROM o WHERE k % 17 = 0 OR k % 23 <> 0 GROUP BY m
        )
        SELECT
          (SELECT COUNT(*) FROM maintained mt
           JOIN truth t ON mt.m = t.m
           WHERE mt.n <> t.n OR mt.c <> t.c) AS mismatched,
          (SELECT COUNT(*) FROM maintained WHERE n > 0
             AND m NOT IN (SELECT m FROM truth)) AS ghost_groups,
          (SELECT COUNT(*) FROM truth
           WHERE m NOT IN (SELECT m FROM maintained WHERE n > 0))
              AS missing_groups,
          (SELECT COUNT(*) FROM maintained WHERE n = 0 AND c <> 0)
              AS nonzero_dead
        """
    ).fetchone()
    assert out == (0, 0, 0, 0), out


@given(
    st.lists(
        st.sets(st.integers(0, 30), min_size=1, max_size=12),
        min_size=2,
        max_size=14,
    )
)
@FAST
def test_prefix_filter_is_complete_for_any_sets(sets):
    """jaccard_prefix_filter's pruning law for ANY set collection: with
    a global (df, token) rarity order and per-set prefix length
    |s| - ceil(t*|s|) + 1, every pair with J >= t shares a token inside
    BOTH prefixes — so prefix-only candidate generation loses nothing.
    Independent pure-python evaluation of the same integer formulas
    (t = 1/2 like the registered query)."""
    num, den = 1, 2
    from collections import Counter

    df = Counter()
    for s in sets:
        for tok in s:
            df[tok] += 1
    order = {tok: (df[tok], tok) for tok in df}

    def prefix(s):
        ordered = sorted(s, key=lambda tok: order[tok])
        plen = len(s) - (num * len(s) + den - 1) // den + 1
        return set(ordered[:plen])

    brute = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            inter = len(a & b)
            if inter * den >= num * (len(a) + len(b) - inter):
                brute.add((i, j))
    candidates = {
        (i, j)
        for i in range(len(sets))
        for j in range(i + 1, len(sets))
        if prefix(sets[i]) & prefix(sets[j])
    }
    assert brute <= candidates, (brute - candidates, sets)
    verified = {
        (i, j)
        for (i, j) in candidates
        if (lambda a, b: len(a & b) * den
            >= num * (len(a) + len(b) - len(a & b)))(sets[i], sets[j])
    }
    assert verified == brute
