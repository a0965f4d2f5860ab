"""Round-18 property pins: the cluster-keyed leakage-free split
(cluster_aware_split) — no near-duplicate cluster may straddle splits,
accounting totals close — and the duplication-corrected sampling
weights (cluster_sampling_weights) — per-cluster weights sum to exactly
1, so total weight equals the number of distinct contents.  Both on the
real corpus AND on a planted near-dup fixture that drives the clustered
path deterministically."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001

from walmart_e_commerce_sales_data_pipeline_spark.operators.components import (
    connected_components,
)
from walmart_e_commerce_sales_data_pipeline_spark.operators.dedup import (
    jaccard_pairs_from_docs,
)
from walmart_e_commerce_sales_data_pipeline_spark.queries.clusters import (
    cluster_aware_split,
    cluster_sampling_weights,
)
from walmart_e_commerce_sales_data_pipeline_spark.queries.dedup import (
    JACCARD_THRESHOLD,
)
from walmart_e_commerce_sales_data_pipeline_spark.queries.tables import table


def test_cluster_split_never_straddles_a_cluster(spark):
    """THE invariant the query exists for: recompute the doc-level
    (group, split) assignment the aggregate is built from and assert
    every near-dup cluster lands in exactly one split — per-doc hashing
    (train_val_test_split) does NOT satisfy this on the same corpus,
    which proves the fixture is live."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.splits import (
        portable_bucket_sql,
    )
    from walmart_e_commerce_sales_data_pipeline_spark.queries.clusters import (
        _CL_TRAIN_HI,
        _CL_VAL_HI,
    )

    docs = table(spark, SF0001, "documents")
    labels = connected_components(
        jaccard_pairs_from_docs(docs, JACCARD_THRESHOLD)
    ).withColumnRenamed("id", "doc_id")
    joined = docs.join(labels, "doc_id", "left").withColumn(
        "group_id", F.coalesce("component", "doc_id")
    )

    def split_of(key: str):
        b = F.expr(portable_bucket_sql(key, "STRING"))
        return (
            F.when(b < _CL_TRAIN_HI, "train")
            .when(b < _CL_VAL_HI, "val")
            .otherwise("test")
        )

    per_cluster = (
        joined.filter(F.col("component").isNotNull())
        .groupBy("group_id")
        .agg(
            F.countDistinct(split_of("group_id")).alias("n_cluster_splits"),
            F.countDistinct(split_of("doc_id")).alias("n_docwise_splits"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert per_cluster, "no near-dup clusters at sf0.001 — fixture dead"
    assert all(r["n_cluster_splits"] == 1 for r in per_cluster)
    # liveness: per-DOC hashing would have split at least one cluster
    assert any(
        r["n_docwise_splits"] > 1 for r in per_cluster if r["n"] > 1
    ), "per-doc hashing never straddles here — the guard is vacuous"


def test_cluster_split_accounting_closes(spark):
    """Totals close against the corpus: n_docs sums to the doc count,
    total_chars to the corpus char sum, and summed n_groups equals the
    number of distinct (group, source) combinations — a CLUSTER never
    splits across the split axis (the straddle test above), but it CAN
    span sources (cross-source duplicates are live in this corpus), so
    the per-(split, source) grid counts such a group once per source."""
    rows = cluster_aware_split(spark, SF0001).collect()
    docs = table(spark, SF0001, "documents")
    n_docs, n_chars = docs.agg(
        F.count(F.lit(1)), F.sum("n_chars")
    ).first()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_chars"] for r in rows) == n_chars
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    labels = connected_components(
        jaccard_pairs_from_docs(docs, JACCARD_THRESHOLD)
    ).withColumnRenamed("id", "doc_id")
    n_group_source = (
        docs.join(labels, "doc_id", "left")
        .select(
            F.coalesce("component", "doc_id").alias("group_id"), "source"
        )
        .distinct()
        .count()
    )
    assert sum(r["n_groups"] for r in rows) == n_group_source


def test_sampling_weights_sum_to_one_per_cluster(spark):
    """The defining law: each near-dup cluster's weights sum to exactly
    1 (size * round(1/size, 6) up to the 6-dp rounding), singletons
    weigh exactly 1.0, and total weight == number of distinct groups up
    to rounding — duplication carries no extra mass."""
    rows = cluster_sampling_weights(spark, SF0001).collect()
    docs_n = table(spark, SF0001, "documents").count()
    assert len(rows) == docs_n
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r["group_id"], []).append(r)
    assert any(len(v) > 1 for v in by_group.values()), "no clusters — dead"
    for gid, members in by_group.items():
        size = len(members)
        assert all(m["group_size"] == size for m in members)
        total = sum(m["weight"] for m in members)
        assert abs(total - 1.0) <= size * 5e-7, (gid, total)
        if size == 1:
            assert members[0]["weight"] == 1.0
    assert abs(sum(r["weight"] for r in rows) - len(by_group)) <= docs_n * 5e-7


def test_cluster_split_and_weights_on_planted_duplicates(spark, tmp_path):
    """Planted fixture: two verbatim copies + one unique doc.  The
    copies form one cluster — same group, same split, weight 0.5 each;
    the unique doc is its own group at weight 1.0."""
    dup = "the quick brown fox jumps over the lazy dog " * 8
    uniq = "entirely different content with no shared shingles at all " * 8
    spark.createDataFrame(
        [
            (1, dup, "en", "a", len(dup)),
            (2, dup, "en", "a", len(dup)),
            (3, uniq, "en", "b", len(uniq)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    w = {r["doc_id"]: r for r in cluster_sampling_weights(spark, str(tmp_path)).collect()}
    assert w[1]["group_id"] == w[2]["group_id"] == 1
    assert w[1]["group_size"] == w[2]["group_size"] == 2
    assert w[1]["weight"] == w[2]["weight"] == 0.5
    assert w[3]["group_size"] == 1 and w[3]["weight"] == 1.0
    rows = cluster_aware_split(spark, str(tmp_path)).collect()
    a = [r for r in rows if r["source"] == "a"]
    # both copies of the cluster land in ONE (split, source) cell
    assert len(a) == 1 and a[0]["n_docs"] == 2 and a[0]["n_groups"] == 1


# --- bigram_lm_quality pins ----------------------------------------------------


def _lm_reference(docs):
    """First-principles add-one bigram LM scorer over (doc_id, text)."""
    import math

    toks = {d: t.lower().split(" ") for d, t in docs}
    uni: dict[str, int] = {}
    bic: dict[tuple, int] = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for i in range(len(t) - 1):
            bic[(t[i], t[i + 1])] = bic.get((t[i], t[i + 1]), 0) + 1
    v = len(uni)
    out = {}
    for d, t in toks.items():
        if len(t) < 2:
            continue
        s = 0.0
        for i in range(len(t) - 1):  # position order — the query's fold
            s += math.log((bic[(t[i], t[i + 1])] + 1) / (uni[t[i]] + v))
        out[d] = (len(t) - 1, round(s / (len(t) - 1), 6))
    return out


def test_bigram_lm_matches_reference_and_ranks_garble_low(spark, tmp_path):
    """The per-doc score equals a first-principles python scorer on a
    planted corpus, and liveness: a natural doc built from corpus-common
    bigrams outscores a garbled doc of the same length made of
    never-repeated token transitions — exactly the separation the
    LM-quality filter exists to make (heuristic length/punct ratios
    can't see it: both docs have identical token counts)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.analysis import (
        bigram_lm_quality,
    )

    natural = "the cat sat on the mat " * 10 + "the cat sat on the mat"
    garbled = " ".join(f"tok{i} tok{i+40}" for i in range(0, 40, 2))
    docs = [
        (1, natural.strip()),
        (2, natural.strip()),
        (3, garbled),
        (4, "single"),  # one token -> no bigrams -> no row
    ]
    spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r["doc_id"]: r for r in bigram_lm_quality(spark, str(tmp_path)).collect()}
    ref = _lm_reference(docs)
    assert set(got) == set(ref) == {1, 2, 3}
    for d, (nb, avg) in ref.items():
        assert got[d]["n_bigrams"] == nb
        assert abs(got[d]["avg_logprob"] - avg) <= 1e-9, (d, got[d], avg)
        assert abs(got[d]["ppl_proxy"] - round(__import__("math").exp(-avg), 4)) <= 1e-9
    assert got[1]["avg_logprob"] > got[3]["avg_logprob"]
    assert got[1]["ppl_proxy"] < got[3]["ppl_proxy"]


def test_bigram_lm_scores_real_corpus(spark):
    """Sanity on the real corpus: every doc with >= 2 tokens gets a row,
    avg_logprob is negative (probabilities < 1), ppl_proxy > 1, and the
    smoothed model never assigns -inf."""
    import math

    from walmart_e_commerce_sales_data_pipeline_spark.queries.analysis import (
        bigram_lm_quality,
    )

    rows = bigram_lm_quality(spark, SF0001).collect()
    docs_n = table(spark, SF0001, "documents").count()
    assert 0 < len(rows) <= docs_n
    for r in rows:
        assert r["n_bigrams"] >= 1
        assert r["avg_logprob"] < 0 and math.isfinite(r["avg_logprob"])
        assert r["ppl_proxy"] > 1


# --- spearman_rank_corr pins ---------------------------------------------------


def test_spearman_matches_pandas_midrank_reference(spark):
    """rho at sf0.001 equals Pearson-on-average-ranks computed
    independently by pandas rank(method='average') + numpy."""
    import numpy as np
    import pandas as pd

    from walmart_e_commerce_sales_data_pipeline_spark.queries.analysis import (
        spearman_rank_corr,
    )

    (row,) = spearman_rank_corr(spark, SF0001).collect()
    pdf = (
        table(spark, SF0001, "lineitem")
        .select("l_quantity", "l_discount")
        .toPandas()
        .dropna()
    )
    ra = pdf["l_quantity"].rank(method="average").to_numpy()
    rb = pdf["l_discount"].rank(method="average").to_numpy()
    want = float(np.corrcoef(ra, rb)[0, 1])
    assert row["n"] == len(pdf)
    assert abs(row["spearman_rho"] - round(want, 6)) <= 2e-6, (row, want)


def test_spearman_closed_forms(spark, tmp_path):
    """Closed forms: a strictly increasing monotone relation has rho = 1
    exactly, strictly decreasing -1, and an all-tied column NULLs the
    statistic (zero variance) instead of dividing by zero."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.analysis import (
        spearman_rank_corr,
    )

    def run(pairs):
        import pyspark.sql.functions as SF

        cols = [
            "l_orderkey bigint, l_quantity double, l_discount double",
        ]
        spark.createDataFrame(
            [(i, float(a), float(b)) for i, (a, b) in enumerate(pairs)],
            cols[0],
        ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
        (row,) = spearman_rank_corr(spark, str(tmp_path)).collect()
        return row

    up = run([(q, q * q) for q in range(1, 9)])  # monotone, nonlinear
    assert up["spearman_rho"] == 1.0
    down = run([(q, -3 * q) for q in range(1, 9)])
    assert down["spearman_rho"] == -1.0
    tied = run([(q, 7) for q in range(1, 9)])
    assert tied["spearman_rho"] is None
    assert int(tied["var_b_num"]) == 0


# --- ngram_novelty_rate pins ---------------------------------------------------


def test_ngram_novelty_matches_reference_and_closed_forms(spark, tmp_path):
    """Planted corpus: the first doc is all-novel (novelty 1.0), a
    verbatim copy is all-seen (0.0), a half-spliced doc sits strictly
    between, and every value equals a first-principles dict scorer."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        ngram_novelty_rate,
    )

    fresh = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    docs = [
        (1, fresh),
        (2, fresh),                       # verbatim copy of doc 1
        (3, fresh + " " + other),         # half old, half new
        (4, "too short"),                 # 2 tokens -> no trigrams
    ]
    spark.createDataFrame(
        [(d, t, "en", "s", len(t)) for d, t in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    def ref():
        first: dict[str, int] = {}
        insts: dict[int, list[str]] = {}
        for d, t in sorted(docs):
            toks = t.lower().split(" ")
            gs = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
            insts[d] = gs
            for g in gs:
                first.setdefault(g, d)
        return {
            d: (len(gs), sum(1 for g in gs if first[g] == d))
            for d, gs in insts.items()
            if gs
        }

    got = {r["doc_id"]: r for r in ngram_novelty_rate(spark, str(tmp_path)).collect()}
    want = ref()
    assert set(got) == set(want) == {1, 2, 3}
    for d, (n, novel) in want.items():
        assert got[d]["n_grams"] == n and got[d]["n_novel"] == novel
        assert got[d]["novelty"] == round(novel / n, 6)
    assert got[1]["novelty"] == 1.0
    assert got[2]["novelty"] == 0.0
    assert 0.0 < got[3]["novelty"] < 1.0


def test_ngram_novelty_conservation_on_corpus(spark):
    """Conservation law at sf0.001: summed n_novel equals the total
    instance count of trigrams WITHIN their first document — i.e. every
    trigram's novelty mass is attributed exactly once, to its
    introducing document; and the minimum doc_id present always reads
    novelty 1.0 (nothing precedes it)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.curation import (
        ngram_novelty_rate,
    )

    rows = ngram_novelty_rate(spark, SF0001).collect()
    assert rows
    first_doc = min(r["doc_id"] for r in rows)
    by = {r["doc_id"]: r for r in rows}
    assert by[first_doc]["novelty"] == 1.0
    total_novel = sum(r["n_novel"] for r in rows)
    toks = (
        table(spark, SF0001, "documents")
        .select("doc_id", F.split(F.lower("text"), " ").alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("t") - 2)).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.element_at("t", F.col("i")),
                F.element_at("t", F.col("i") + 1),
                F.element_at("t", F.col("i") + 2),
            ).alias("g"),
        )
    )
    from pyspark.sql import Window as W

    expect = (
        toks.withColumn("first_doc", F.min("doc_id").over(W.partitionBy("g")))
        .filter(F.col("doc_id") == F.col("first_doc"))
        .count()
    )
    assert total_novel == expect
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"]


# --- source_length_kruskal pins ------------------------------------------------


def _kw_reference(groups):
    """First-principles Kruskal-Wallis on {group: [values]}: midranks,
    H, and the tie-corrected H, all in plain Python floats."""
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    # midrank of each distinct value
    from collections import Counter

    cnt = Counter(allv)
    mid, cum = {}, 0
    for v in sorted(cnt):
        c = cnt[v]
        mid[v] = cum + (c + 1) / 2
        cum += c
    sum_term = 0.0
    for g in sorted(groups):
        vs = groups[g]
        rg = sum(mid[v] for v in vs)
        sum_term += rg * rg / len(vs)
    h = 12.0 / (n * (n + 1)) * sum_term - 3.0 * (n + 1)
    tie = sum(c**3 - c for c in cnt.values())
    denom = 1.0 - tie / (n**3 - n)
    return h, (h / denom if denom > 0 else None), tie


def test_kruskal_planted_shift_and_closed_forms(spark, tmp_path):
    """A planted location shift between two sources produces the
    first-principles H (both raw and tie-corrected); a third singleton
    source exercises the unequal-n path."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_length_kruskal,
    )

    groups = {
        "a": [10, 12, 12, 15, 18],
        "b": [30, 31, 31, 35, 40, 44],
        "c": [12],
    }
    rows = [
        (i, "x", "en", src, v)
        for i, (src, v) in enumerate(
            (s, v) for s, vs in sorted(groups.items()) for v in vs
        )
    ]
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    got = source_length_kruskal(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    h, h_tied, tie = _kw_reference(groups)
    assert r["n_docs"] == 12 and r["n_sources"] == 3 and r["dof"] == 2
    assert int(r["tie_term"]) == tie
    assert abs(r["h"] - round(h, 6)) < 2e-6
    assert abs(r["h_tied"] - round(h_tied, 6)) < 2e-6
    # a clean two-group shift with no overlap drives H near its max
    assert r["h"] > 6.0


def test_kruskal_degenerate_cases(spark, tmp_path):
    """All-values-tied: H clamps to 0 and the tie correction divides by
    zero, so h_tied is NULL and tie_term equals N^3 - N exactly.  A
    single source: dof = 0 and H ~ 0 (clamped, never negative)."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_length_kruskal,
    )

    base = tmp_path / "tied"
    base.mkdir()
    spark.createDataFrame(
        [(i, "x", "en", f"s{i % 3}", 7) for i in range(9)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{base}/documents.parquet")
    r = source_length_kruskal(spark, str(base)).collect()[0]
    assert r["h"] == 0.0 and r["h_tied"] is None
    assert int(r["tie_term"]) == 9**3 - 9

    solo = tmp_path / "solo"
    solo.mkdir()
    spark.createDataFrame(
        [(i, "x", "en", "only", 10 + i) for i in range(5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{solo}/documents.parquet")
    r = source_length_kruskal(spark, str(solo)).collect()[0]
    assert r["n_sources"] == 1 and r["dof"] == 0
    assert r["h"] == 0.0 and r["h_tied"] == 0.0


def test_kruskal_rank_sum_conservation(spark):
    """On the real sf0.001 corpus the hidden doubled rank sums must
    conserve: sum over sources of s2_g = 2 * N(N+1)/2 = N(N+1); proven
    by recomputing the per-source rank sums from first principles and
    comparing against the emitted H via the reference scorer."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_length_kruskal,
    )

    docs = table(spark, SF0001, "documents").select("source", "n_chars").collect()
    groups = {}
    for row in docs:
        groups.setdefault(row["source"], []).append(row["n_chars"])
    h, h_tied, tie = _kw_reference(groups)
    r = source_length_kruskal(spark, SF0001).collect()[0]
    assert r["n_docs"] == sum(len(v) for v in groups.values())
    assert r["n_sources"] == len(groups)
    assert int(r["tie_term"]) == tie
    assert abs(r["h"] - h) < 1e-6
    assert abs(r["h_tied"] - h_tied) < 1e-6


# --- lang_id_precision_recall pins ---------------------------------------------


def test_lang_eval_planted_confusion_matrix(spark, tmp_path):
    """A planted corpus with a known confusion matrix: en 2/3 recall,
    one es->en confusion, a labeled-only class (zh: NULL precision) and
    a predicted-only class (und: NULL recall); P/R/F1 match hand
    arithmetic exactly."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.text import (
        lang_id_precision_recall,
    )

    docs = [
        (1, "the cat sat", "en"),        # predicted en  (tp)
        (2, "the dog ran", "en"),        # predicted en  (tp)
        (3, "xyzzy plugh", "en"),        # predicted und (miss)
        (4, "the tapas bar", "es"),      # predicted en  (es->en confusion)
        (5, "mystery words here", "zh"), # predicted und; zh never predicted
    ]
    spark.createDataFrame(
        [(d, t, l, "s", len(t)) for d, t, l in docs],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{tmp_path}/documents.parquet")

    rows = {r["lang"]: r for r in lang_id_precision_recall(spark, str(tmp_path)).collect()}
    assert set(rows) == {"en", "es", "zh", "und"}
    en = rows["en"]
    assert (en["support"], en["n_pred"], en["tp"]) == (3, 3, 2)
    assert en["precision"] == en["recall"] == round(2 / 3, 6)
    assert en["f1"] == round(2 * 2 / 6, 6)
    es = rows["es"]
    assert (es["support"], es["n_pred"], es["tp"]) == (1, 0, 0)
    assert es["precision"] is None and es["recall"] == 0.0 and es["f1"] == 0.0
    zh = rows["zh"]
    assert zh["precision"] is None and zh["recall"] == 0.0
    und = rows["und"]
    assert (und["support"], und["n_pred"]) == (0, 2)
    assert und["recall"] is None and und["precision"] == 0.0 and und["f1"] == 0.0


def test_lang_eval_consistent_with_confusion_matrix(spark):
    """On the real corpus the eval must be derivable from text_lang_id's
    confusion cells: supports sum to the corpus, predicted counts sum to
    the corpus, and each class's tp matches the diagonal."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.text import (
        lang_id_precision_recall,
        text_lang_id,
    )

    cm = text_lang_id(spark, SF0001).collect()
    ev = lang_id_precision_recall(spark, SF0001).collect()
    n_docs = sum(r["n"] for r in cm)
    assert sum(r["support"] for r in ev) == n_docs
    assert sum(r["n_pred"] for r in ev) == n_docs
    diag = {r["labeled_lang"]: r["n"] for r in cm
            if r["labeled_lang"] == r["predicted_lang"]}
    for r in ev:
        assert r["tp"] == diag.get(r["lang"], 0)


# --- score_lift_deciles pins ---------------------------------------------------


def test_lift_deciles_planted_predictive_score(spark, tmp_path):
    """A perfectly predictive planted score (all positives score above
    all negatives, 20% base rate) concentrates every positive in the top
    two deciles: lift = 5 there, 0 elsewhere, gains hit 1.0 at decile 2
    and the decile populations are exactly even."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        score_lift_deciles,
    )
    from datetime import datetime

    rows = []
    for i in range(100):
        # scores 100.00 down to 0.01; top 20 are purchases
        rows.append(
            (
                i,
                datetime(2024, 1, 1, 0, 0, i % 60),
                i,
                "purchase" if i < 20 else "view",
                float(100 - i),
                "{}",
            )
        )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.parquet(f"{tmp_path}/events.parquet")

    got = {r["decile"]: r for r in score_lift_deciles(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(1, 11))
    assert all(got[d]["n"] == 10 for d in got)
    assert got[1]["n_pos"] == 10 and got[1]["lift"] == 5.0
    assert got[2]["n_pos"] == 10 and got[2]["cum_pos_share"] == 1.0
    for d in range(3, 11):
        assert got[d]["n_pos"] == 0 and got[d]["lift"] == 0.0
        assert got[d]["cum_pos_share"] == 1.0
    # avg_score strictly decreases down the deciles (scores are cents)
    avgs = [got[d]["avg_score"] for d in range(1, 11)]
    assert avgs == sorted(avgs, reverse=True)


def test_lift_deciles_conservation_and_base_rate(spark):
    """On the real corpus: bin populations sum to the labeled corpus,
    positives sum to the purchase count, the population-weighted mean
    lift is exactly 1, and the gains curve is monotone to 1.0."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        score_lift_deciles,
    )

    rows = sorted(
        score_lift_deciles(spark, SF0001).collect(), key=lambda r: r["decile"]
    )
    lab = (
        table(spark, SF0001, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("event_type") == "purchase").cast("int")).alias("p"),
        )
        .first()
    )
    assert sum(r["n"] for r in rows) == lab["n"]
    assert sum(r["n_pos"] for r in rows) == lab["p"]
    # weighted mean lift = sum(n * lift)/N = sum(n_pos)*N/(N*P) = 1
    wmean = sum(r["n"] * r["n_pos"] / r["n"] for r in rows) / lab["p"]
    assert abs(wmean - 1.0) < 1e-12
    shares = [r["cum_pos_share"] for r in rows]
    assert shares == sorted(shares) and shares[-1] == 1.0
    # tied blocks never split: deciles within 1 of even population
    assert max(r["n"] for r in rows) - min(r["n"] for r in rows) <= max(
        1, lab["n"] // 50
    )


# --- source_length_levene pins -------------------------------------------------


def _bf_reference(groups):
    """First-principles Brown-Forsythe on {group: [values]}: deviations
    from the exact group median, one-way ANOVA F (scale-invariant, so
    computed on doubled deviations like the query)."""
    devs = {}
    for g, vs in groups.items():
        s = sorted(vs)
        n = len(s)
        m2 = s[(n - 1) // 2] + s[n // 2]
        devs[g] = [abs(2 * v - m2) for v in vs]
    allv = [d for ds in devs.values() for d in ds]
    n, k = len(allv), len(devs)
    gm = sum(allv) / n
    between = sum(len(ds) * (sum(ds) / len(ds) - gm) ** 2 for ds in devs.values())
    within = sum((d - sum(ds) / len(ds)) ** 2 for ds in devs.values() for d in ds)
    if k < 2 or n <= k or within <= 0:
        return None
    return ((n - k) * between) / ((k - 1) * within)


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        [(i, "x", "en", src, v) for i, (src, v) in enumerate(rows)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.parquet(f"{path}/documents.parquet")


def test_levene_planted_spread_and_closed_forms(spark, tmp_path):
    """Two sources with equal medians but very different spreads drive a
    large F that equals the first-principles scorer; the exact DOUBLED
    deviation cells match hand arithmetic."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_length_levene,
    )

    groups = {
        "tight": [100, 101, 102, 103, 104],
        "wide": [10, 60, 102, 150, 200],
    }
    _write_docs(
        spark, tmp_path, [(s, v) for s, vs in sorted(groups.items()) for v in vs]
    )
    r = source_length_levene(spark, str(tmp_path)).collect()[0]
    assert r["n_docs"] == 10 and r["n_sources"] == 2
    assert r["df1"] == 1 and r["df2"] == 8
    # doubled deviations: tight median 102 -> m2=204; wide median 102 -> 204
    want_s = sum(abs(2 * v - 204) for vs in groups.values() for v in vs)
    assert r["sum_dev2"] == want_s
    f = _bf_reference(groups)
    assert abs(r["f_bf"] - round(f, 6)) < 2e-6
    # far above the F(1,8) 5% critical value (~5.32): spread detected
    assert r["f_bf"] > 5.32


def test_levene_degenerate_cases(spark, tmp_path):
    """Constant deviations within every group (within_ss = 0) and a
    single source (df1 = 0) both NULL-guard F; an even-sized group
    exercises the two-position doubled median."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_length_levene,
    )

    const = tmp_path / "const"
    const.mkdir()
    # each group: two values equidistant from the median midpoint ->
    # every doubled deviation identical within the group
    _write_docs(spark, const, [("a", 10), ("a", 20), ("b", 5), ("b", 45)])
    r = source_length_levene(spark, str(const)).collect()[0]
    assert r["f_bf"] is None  # within_ss == 0
    # doubled medians: a -> 30, b -> 50; deviations a: |20-30|=10,|40-30|=10
    assert r["sum_dev2"] == 10 + 10 + 40 + 40

    solo = tmp_path / "solo"
    solo.mkdir()
    _write_docs(spark, solo, [("only", v) for v in (1, 5, 9, 13)])
    r = source_length_levene(spark, str(solo)).collect()[0]
    assert r["n_sources"] == 1 and r["df1"] == 0 and r["f_bf"] is None


def test_levene_matches_reference_on_corpus(spark):
    """On the real sf0.001 corpus the emitted F equals the
    first-principles scorer over the exact per-source medians."""
    from walmart_e_commerce_sales_data_pipeline_spark.queries.diagnostics import (
        source_length_levene,
    )

    docs = table(spark, SF0001, "documents").select("source", "n_chars").collect()
    groups = {}
    for row in docs:
        groups.setdefault(row["source"], []).append(row["n_chars"])
    f = _bf_reference(groups)
    r = source_length_levene(spark, SF0001).collect()[0]
    assert r["n_docs"] == sum(len(v) for v in groups.values())
    assert abs(r["f_bf"] - f) < 1e-6
