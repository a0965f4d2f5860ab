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
