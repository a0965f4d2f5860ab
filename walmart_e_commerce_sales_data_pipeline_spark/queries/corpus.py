"""The capstone training-data query: the composed corpus-cleaning pipeline.

exact dedup (normalized-text hash group-by) → near-dup clustering on the
survivors (exact Jaccard pairs → connected components) → representative
picking (min doc_id per cluster) → per-source accounting.  This is the
shape of a real pretraining-data cleaning stage, and every step is the
oracle-checked operator built earlier — the query proves they compose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.components import connected_components
from ..operators.dedup import jaccard_pairs, normalize_text, shingle_sets
from .dedup import _SHINGLE_CTE, JACCARD_THRESHOLD
from .registry import register
from .tables import table


@register(
    "corpus_clean_pipeline",
    oracle=f"""
    WITH RECURSIVE
    norm AS (
        SELECT doc_id, source,
               array_to_string(string_split(lower(text), ' '), ' ') AS nt
        FROM documents
    ),
    exact_reps AS (SELECT MIN(doc_id) AS doc_id FROM norm GROUP BY nt),
    s1 AS (SELECT n.doc_id, n.source FROM norm n
           JOIN exact_reps r ON n.doc_id = r.doc_id),
    {_SHINGLE_CTE},
    sh1 AS (SELECT sh.* FROM sh JOIN s1 ON sh.id = s1.doc_id),
    sizes1 AS (SELECT id, COUNT(*) AS n_sh FROM sh1 GROUP BY id),
    inter AS (
        SELECT a.id AS x, b.id AS y, COUNT(*) AS n_inter
        FROM sh1 a JOIN sh1 b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT x, y FROM inter
        JOIN sizes1 sa ON sa.id = x JOIN sizes1 sb ON sb.id = y
        WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= {JACCARD_THRESHOLD}
    ),
    edges AS (SELECT x, y FROM pairs UNION SELECT y, x FROM pairs),
    walk(id, lab) AS (
        SELECT x, x FROM edges
        UNION
        SELECT e.x, w.lab FROM edges e JOIN walk w ON e.y = w.id
    ),
    comp AS (SELECT id, MIN(lab) AS component FROM walk GROUP BY id),
    removed AS (SELECT id FROM comp WHERE id != component)
    SELECT d.source,
           COUNT(*) AS docs,
           COUNT(s1.doc_id) AS after_exact,
           COUNT(CASE WHEN s1.doc_id IS NOT NULL AND removed.id IS NULL
                      THEN 1 END) AS after_neardup
    FROM documents d
    LEFT JOIN s1 ON d.doc_id = s1.doc_id
    LEFT JOIN removed ON d.doc_id = removed.id
    GROUP BY d.source
    ORDER BY d.source
    """,
    description="composed corpus-cleaning pipeline: exact dedup → near-dup "
    "clustering (Jaccard ≥ 0.5 + connected components) → representative "
    "picking → per-source survivor accounting; proves the dedup operators "
    "compose end-to-end",
    tags=("dedup", "pipeline", "flagship"),
)
def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")

    normed = normalize_text(docs)
    exact_reps = normed.groupBy("_norm").agg(F.min("doc_id").alias("doc_id"))
    s1 = normed.join(exact_reps, "doc_id", "left_semi").select("doc_id", "source")

    sh1 = shingle_sets(docs).join(
        s1.select(F.col("doc_id").alias("id")), "id", "left_semi"
    )
    pairs = jaccard_pairs(sh1, JACCARD_THRESHOLD)
    comp = connected_components(pairs)
    removed = comp.filter(F.col("id") != F.col("component")).select("id")

    return (
        docs.join(s1.select(F.col("doc_id"), F.lit(1).alias("_s1")), "doc_id", "left")
        .join(
            removed.select(F.col("id").alias("doc_id"), F.lit(1).alias("_rm")),
            "doc_id",
            "left",
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.count("_s1").alias("after_exact"),
            F.count(
                F.when(F.col("_s1").isNotNull() & F.col("_rm").isNull(), 1)
            ).alias("after_neardup"),
        )
        .orderBy("source")
    )
