"""Round-17 property pins: the Kolmogorov-Smirnov two-sample drift
screen (source_ks_drift) against a first-principles exact-Fraction ECDF
implementation with closed-form planted-shift checks; the two-proportion
A/B z-test (conversion_ab_ztest) against the textbook pooled-z and
Wilson-score formulas with planted-extreme and degenerate-pool cases;
and the chi-squared independence screen (event_dow_independence)
against the classic (o-e)^2/e evaluation with permutation-table (V=1),
balanced-grid (chi2=0), and single-type (dof=0) closed forms."""

from __future__ import annotations

from fractions import Fraction


def _ks_definition(lengths_by_source):
    """First-principles one-vs-rest KS: for each source, exact Fraction
    ECDFs at the merged distinct values, D = max |F_s - F_rest|."""
    out = {}
    all_vals = sorted({v for ls in lengths_by_source.values() for v in ls})
    for s, ls in lengths_by_source.items():
        rest = [v for o, lo in lengths_by_source.items() if o != s for v in lo]
        if not rest:
            out[s] = None
            continue
        d = Fraction(0)
        for v in all_vals:
            f1 = Fraction(sum(1 for x in ls if x <= v), len(ls))
            f2 = Fraction(sum(1 for x in rest if x <= v), len(rest))
            d = max(d, abs(f1 - f2))
        out[s] = d
    return out


def test_ks_drift_matches_definition_on_corpus(spark):
    """Every per-source D at sf0.001 equals the exact-Fraction
    definition: d_num / (n_docs * n_rest) == max |F_s - F_rest|."""
    from tests.conftest import SF0001
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_ks_drift,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import table

    docs = table(spark, SF0001, "documents").select("source", "n_chars").collect()
    by_source: dict[str, list[int]] = {}
    for r in docs:
        by_source.setdefault(r.source, []).append(r.n_chars)
    expect = _ks_definition(by_source)
    rows = source_ks_drift(spark, SF0001).collect()
    assert {r.source for r in rows} == set(by_source)
    for r in rows:
        assert r.n_docs == len(by_source[r.source])
        got = Fraction(int(r.d_num), r.n_docs * r.n_rest)
        assert got == expect[r.source], r.source
        assert 0.0 <= r.p_value <= 1.0


def test_ks_drift_planted_shift_and_identical(spark, tmp_path):
    """Closed forms: a source whose lengths are disjointly shifted above
    everything else has D = 1 exactly (p ~ 0); two sources drawn from
    the SAME length multiset both see the pooled rest differ only
    through the third source."""
    rows = []
    did = 0
    # sources "a" and "b": identical length multisets 10..29
    for src in ("a", "b"):
        for v in range(10, 30):
            rows.append((did, "x" * v, "en", src, v))
            did += 1
    # source "shift": disjoint support 1000..1019
    for v in range(1000, 1020):
        rows.append((did, "y" * v, "en", "shift", v))
        did += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_ks_drift,
    )

    got = {r.source: r for r in source_ks_drift(spark, str(tmp_path)).collect()}
    # shift vs rest: supports are disjoint -> D = 1, p ~ 0
    sh = got["shift"]
    assert sh.ks_d == 1.0 and int(sh.d_num) == sh.n_docs * sh.n_rest
    assert sh.p_value < 1e-6
    # a's rest = b + shift; b's rest = a + shift — by symmetry D_a == D_b
    assert got["a"].ks_d == got["b"].ks_d
    # a vs rest: within the shared support the gap is |F_a - (F_b + F_shift)/2|
    # = F_a/2 at the top of the shared support (F_shift = 0 there,
    # F_a = F_b = 1 at v = 29) -> D = 1/2
    assert got["a"].ks_d == 0.5


def test_ks_drift_single_source_is_null_not_crash(spark, tmp_path):
    """A corpus with ONE source has no rest distribution: ks_d and
    p_value are NULL in both engines, never a divide-by-zero."""
    spark.createDataFrame(
        [(0, "aaa", "en", "only", 3), (1, "bbbb", "en", "only", 4)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_ks_drift,
    )

    (row,) = source_ks_drift(spark, str(tmp_path)).collect()
    assert row.n_rest == 0 and row.ks_d is None and row.p_value is None


# --- conversion_ab_ztest pins ------------------------------------------------


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )


def test_ab_ztest_matches_textbook_on_corpus(spark):
    """The per-cohort cells and every derived statistic at sf0.001 equal
    a first-principles Python evaluation of the pooled two-proportion z
    and Wilson-score formulas on the exact integer (n, x) cells."""
    import math

    from tests.conftest import SF0001
    from walmart_e_commerce_sales_data_pipeline_spark.queries.events import (
        conversion_ab_ztest,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

    from walmart_e_commerce_sales_data_pipeline_spark.queries.events import (
        REPEAT_PURCHASE_MIN,
    )

    counts: dict[int, int] = {}
    for r in events(spark, SF0001).select("user_id", "event_type").collect():
        counts[r.user_id] = counts.get(r.user_id, 0) + int(
            r.event_type == "purchase"
        )
    per_user = {u: int(c >= REPEAT_PURCHASE_MIN) for u, c in counts.items()}
    cells = {"A": [0, 0], "B": [0, 0]}
    for uid, conv in per_user.items():
        c = "A" if uid % 2 == 0 else "B"
        cells[c][0] += 1
        cells[c][1] += conv
    (n1, x1), (n2, x2) = cells["A"], cells["B"]
    degenerate = (x1 + x2) in (0, n1 + n2)  # pooled variance zero
    rows = {r.cohort: r for r in conversion_ab_ztest(spark, SF0001).collect()}
    assert rows["A"].n_users == n1 and rows["A"].n_converted == x1
    assert rows["B"].n_users == n2 and rows["B"].n_converted == x2
    if degenerate:
        # sf0.001's dense event stream has every user purchasing —
        # exactly the NULL-guard case; the planted-extremes test below
        # covers a live z on synthetic cohorts
        assert rows["A"].z_score is None and rows["B"].z_score is None
    else:
        pool = (x1 + x2) / (n1 + n2)
        z = (x1 / n1 - x2 / n2) / math.sqrt(
            pool * (1 - pool) * (1 / n1 + 1 / n2)
        )
        assert abs(rows["A"].z_score - round(z, 4)) < 1e-9
    for c, (n, x) in cells.items():
        p = x / n
        half = 1.96 * math.sqrt(p * (1 - p) / n + 0.9604 / (n * n))
        lo = (p + 1.9208 / n - half) / (1 + 3.8416 / n)
        hi = (p + 1.9208 / n + half) / (1 + 3.8416 / n)
        assert abs(rows[c].wilson_lo - round(lo, 6)) < 1e-9, c
        assert abs(rows[c].wilson_hi - round(hi, 6)) < 1e-9, c
        assert 0.0 <= rows[c].wilson_lo <= rows[c].conv_rate <= rows[c].wilson_hi <= 1.0


def test_ab_ztest_planted_extremes(spark, tmp_path):
    """Every even user converts, no odd user does: z is large positive,
    verdict A-higher, and A's Wilson interval sits above B's."""
    import datetime as dt

    rows = []
    t = dt.datetime(2024, 1, 1, 10, 0)
    eid = 0
    for uid in range(100):
        et = "purchase" if uid % 2 == 0 else "view"
        for _ in range(14):  # REPEAT_PURCHASE_MIN events each
            rows.append((eid, t, uid, et, 1.0, "{}"))
            eid += 1
    _events_df(spark, rows).write.parquet(f"{tmp_path}/events.parquet")
    from walmart_e_commerce_sales_data_pipeline_spark.queries.events import (
        conversion_ab_ztest,
    )

    got = {r.cohort: r for r in conversion_ab_ztest(spark, str(tmp_path)).collect()}
    assert got["A"].conv_rate == 1.0 and got["B"].conv_rate == 0.0
    assert got["A"].verdict == "A-higher" and got["A"].z_score > 1.96
    assert got["A"].wilson_lo > got["B"].wilson_hi
    # Wilson never escapes [0,1] even at p = 0 / p = 1 (the Wald CI would)
    assert got["A"].wilson_hi <= 1.0 and got["B"].wilson_lo >= 0.0


def test_ab_ztest_degenerate_pools_are_null(spark, tmp_path):
    """All users converting (pooled variance zero) -> z and verdict NULL
    in both engines, never a divide-by-zero."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        (uid * 14 + j, t, uid, "purchase", 1.0, "{}")
        for uid in range(40)
        for j in range(14)
    ]
    _events_df(spark, rows).write.parquet(f"{tmp_path}/events.parquet")
    from walmart_e_commerce_sales_data_pipeline_spark.queries.events import (
        conversion_ab_ztest,
    )

    for r in conversion_ab_ztest(spark, str(tmp_path)).collect():
        assert r.conv_rate == 1.0
        assert r.z_score is None and r.verdict is None


# --- event_dow_independence pins -----------------------------------------------


def test_chi2_matches_textbook_on_corpus(spark):
    """chi2, dof, and Cramer's V at sf0.001 match a first-principles
    Python evaluation of the classic sum (o-e)^2/e over the full grid
    (the query's algebraic N*sum(o^2/rc) - N form is identical by
    expansion)."""
    import math

    from tests.conftest import SF0001
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        event_dow_independence,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import events

    cells: dict[tuple[str, int], int] = {}
    for r in events(spark, SF0001).select("event_type", "ts").collect():
        key = (r.event_type, r.ts.weekday())
        cells[key] = cells.get(key, 0) + 1
    rt: dict[str, int] = {}
    ct: dict[int, int] = {}
    for (t, d), o in cells.items():
        rt[t] = rt.get(t, 0) + o
        ct[d] = ct.get(d, 0) + o
    n = sum(cells.values())
    chi2 = sum(
        (cells.get((t, d), 0) - rt[t] * ct[d] / n) ** 2 / (rt[t] * ct[d] / n)
        for t in rt
        for d in ct
    )
    (row,) = event_dow_independence(spark, SF0001).collect()
    assert row.n_events == n
    assert row.n_types == len(rt) and row.n_dows == len(ct)
    assert row.dof == (len(rt) - 1) * (len(ct) - 1)
    assert abs(row.chi2 - chi2) < 1e-4
    v = math.sqrt(chi2 / (n * min(len(rt) - 1, len(ct) - 1)))
    assert abs(row.cramers_v - v) < 1e-4


def test_chi2_planted_dependence_and_independence(spark, tmp_path):
    """Closed forms: a perfectly balanced grid has chi2 = 0 exactly; a
    grid where each type fires on exactly one distinct weekday is a
    permutation table — maximal association, Cramer's V = 1."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0)  # a Monday
    rows, eid = [], 0
    # balanced: 3 types x 4 weekdays x 5 events each
    for ti in range(3):
        for d in range(4):
            for _ in range(5):
                rows.append(
                    (eid, base + dt.timedelta(days=d), eid, f"t{ti}", 1.0, "{}")
                )
                eid += 1
    _events_df(spark, rows).write.parquet(f"{tmp_path}/ev_indep/events.parquet")
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        event_dow_independence,
    )

    (ind,) = event_dow_independence(spark, f"{tmp_path}/ev_indep").collect()
    assert ind.chi2 == 0.0 and ind.cramers_v == 0.0
    assert ind.dof == (3 - 1) * (4 - 1)
    rows, eid = [], 0
    # permutation: type ti fires ONLY on weekday ti
    for ti in range(3):
        for _ in range(7):
            rows.append(
                (eid, base + dt.timedelta(days=ti), eid, f"t{ti}", 1.0, "{}")
            )
            eid += 1
    _events_df(spark, rows).write.parquet(f"{tmp_path}/ev_dep/events.parquet")
    (dep,) = event_dow_independence(spark, f"{tmp_path}/ev_dep").collect()
    # permutation table: chi2 = N * (min_dim - 1), V = 1
    assert dep.cramers_v == 1.0
    assert dep.chi2 == dep.n_events * (min(dep.n_types, dep.n_dows) - 1)


def test_chi2_single_type_degenerate(spark, tmp_path):
    """One event type: dof = 0, chi2 = 0 (row marginal == N), V NULL."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0)
    rows = [
        (i, base + dt.timedelta(days=i % 5), i, "only", 1.0, "{}")
        for i in range(20)
    ]
    _events_df(spark, rows).write.parquet(f"{tmp_path}/events.parquet")
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        event_dow_independence,
    )

    (row,) = event_dow_independence(spark, str(tmp_path)).collect()
    assert row.dof == 0 and row.chi2 == 0.0 and row.cramers_v is None


# --- source_psi_drift pins -----------------------------------------------------


def _psi_definition(lengths_by_source):
    """First-principles PSI: pooled exact-decile edges (edge_k = smallest
    length with cum*10 >= k*N), Laplace-smoothed (c+0.5)/(n+5) shares,
    one-vs-rest per source."""
    import math

    pooled = sorted(v for ls in lengths_by_source.values() for v in ls)
    n = len(pooled)
    from collections import Counter

    cnt = Counter(pooled)
    edges = []
    for k in range(1, 10):
        cf = 0
        for v in sorted(cnt):
            cf += cnt[v]
            if cf * 10 >= k * n:
                edges.append(v)
                break
    out = {}
    for s, ls in lengths_by_source.items():
        rest = [v for o, lo in lengths_by_source.items() if o != s for v in lo]
        if not rest:
            out[s] = None
            continue
        psi = 0.0
        for b in range(10):
            c_s = sum(1 for x in ls if sum(1 for e in edges if x > e) == b)
            c_r = sum(1 for x in rest if sum(1 for e in edges if x > e) == b)
            p = (c_s + 0.5) / (len(ls) + 5.0)
            q = (c_r + 0.5) / (len(rest) + 5.0)
            psi += (p - q) * math.log(p / q)
        out[s] = psi
    return out


def test_psi_matches_definition_on_corpus(spark):
    from tests.conftest import SF0001
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_psi_drift,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import table

    docs = table(spark, SF0001, "documents").select("source", "n_chars").collect()
    by_source: dict[str, list[int]] = {}
    for r in docs:
        by_source.setdefault(r.source, []).append(r.n_chars)
    expect = _psi_definition(by_source)
    rows = {r.source: r for r in source_psi_drift(spark, SF0001).collect()}
    assert set(rows) == set(by_source)
    for s, r in rows.items():
        assert r.n_docs == len(by_source[s])
        assert abs(r.psi - expect[s]) < 1e-5, s


def test_psi_planted_shift_and_stable(spark, tmp_path):
    """A source with a disjointly shifted length distribution reads
    'shifted' (PSI >> 0.25); two sources drawn from the same multiset
    read near-zero 'stable' against each other's pooled rest."""
    rows, did = [], 0
    for src in ("a", "b"):
        for v in range(10, 110):
            rows.append((did, "x" * v, "en", src, v))
            did += 1
    for v in range(5000, 5100):
        rows.append((did, "y" * v, "en", "shift", v))
        did += 1
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_psi_drift,
    )

    got = {r.source: r for r in source_psi_drift(spark, str(tmp_path)).collect()}
    assert got["shift"].verdict == "shifted" and got["shift"].psi > 0.25
    assert got["a"].psi == got["b"].psi  # symmetric construction
