"""Hybrid retrieval (extension surface, SURVEY.md §2.11): lexical + dense
rank fusion.

Training-data curation pipelines retrieve targeted subsets two ways at
once — a lexical scorer (BM25) catches exact terminology, a dense
embedding scorer catches paraphrase — and fuse the rank lists with
reciprocal-rank fusion (RRF, Cormack & Clarke SIGIR'09):

    rrf(d) = Σ_lists 1 / (60 + rank_list(d))

RRF needs only the RANKS, never the incomparable raw scores, which is
what makes it the standard hybrid fusion — and what makes it exactly
oracle-checkable here: the fused score is a sum of reciprocals of small
integers, bit-identical in any engine.

The lexical list reuses the registered BM25 scorer
(``queries.curation.bm25_scores`` / ``BM25_SCORED_CTES``); the dense list
ranks the corpus by cosine against a fixed probe vector (vec_id 0,
``documents``/``embeddings`` share the id domain per TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from .curation import BM25_SCORED_CTES, bm25_scores
from .registry import register
from .tables import table

_RRF_POOL = 20  # per-list candidate pool
_RRF_K = 60  # the standard RRF damping constant
_RRF_TOP = 10
_RRF_QUERY_ID = 0  # probe vector id for the dense list


@register(
    "rrf_hybrid_retrieval",
    oracle=f"""
    WITH {BM25_SCORED_CTES},
    lex AS (
        SELECT doc_id AS id, CAST(rk AS INTEGER) AS lex_rank
        FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
            FROM scored
        ) WHERE rk <= {_RRF_POOL}
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_RRF_QUERY_ID}),
    dscored AS (
        SELECT e.vec_id,
               list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS sim
        FROM embeddings e, q
        WHERE e.vec_id <> {_RRF_QUERY_ID}
    ),
    dense AS (
        SELECT vec_id AS id, CAST(rk AS INTEGER) AS dense_rank
        FROM (
            SELECT vec_id,
                   ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rk
            FROM dscored
        ) WHERE rk <= {_RRF_POOL}
    ),
    fused AS (
        SELECT COALESCE(lex.id, dense.id) AS id,
               lex.lex_rank, dense.dense_rank,
               COALESCE(CAST(1.0 AS DOUBLE) / (60 + lex.lex_rank), 0)
                   + COALESCE(CAST(1.0 AS DOUBLE) / (60 + dense.dense_rank),
                              0) AS rrf_raw
        FROM lex FULL OUTER JOIN dense ON lex.id = dense.id
    )
    SELECT id, lex_rank, dense_rank,
           ROUND(rrf_raw, 6) AS rrf_score,
           CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT fused.*, ROW_NUMBER() OVER (ORDER BY rrf_raw DESC, id) AS rk
        FROM fused
    )
    WHERE rk <= {_RRF_TOP}
    ORDER BY rk
    """,
    description="reciprocal-rank fusion of a lexical (BM25, reused "
    "queries.curation.bm25_scores) and a dense (cosine vs the vec_id-0 "
    "probe) top-20 list: rrf = sum over lists of 1/(60+rank), top-10 "
    "fused — the standard hybrid-retrieval combiner (Cormack & Clarke "
    "SIGIR'09), exactly oracle-checkable because fusion consumes only "
    "integer RANKS, never the incomparable raw scores.  Scale shape: "
    "each list is a global top-k (TakeOrderedAndProject, k-row "
    "per-partition state — never a full sort) ranked by a window over "
    "the k survivors; the fusion join touches two <= 20-row frames; the "
    "1-row corpus stats and probe vector broadcast (whitelisted 1-row "
    "BNLJ class); at 100 TB the dense pool would come from ivf_topk's "
    "cell equi-join exactly as retrieve_rerank_topk documents, with the "
    "fusion stage unchanged",
    tags=("retrieval", "similarity", "text", "flagship"),
)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")

    lex_top = (
        bm25_scores(docs)
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_POOL)
    )
    lex = lex_top.select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("bm25").desc(), "doc_id"))
        .alias("lex_rank"),
    )

    qv = emb.filter(F.col("vec_id") == _RRF_QUERY_ID).select(
        F.col("embedding").alias("qv")
    )
    dense_top = (
        emb.filter(F.col("vec_id") != _RRF_QUERY_ID)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", cosine(F.col("qv"), F.col("embedding")).alias("sim"))
        .orderBy(F.col("sim").desc(), "vec_id")
        .limit(_RRF_POOL)
    )
    dense = dense_top.select(
        F.col("vec_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), "vec_id"))
        .alias("dense_rank"),
    )

    # RRF consumes only the integer ranks: 1.0/(60+rank) is a reciprocal
    # of an exact small integer — identical doubles in both engines.
    rrf_raw = F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(
        F.lit(1.0) / (F.lit(_RRF_K) + F.col("dense_rank")), F.lit(0.0)
    )
    fused = (
        lex.join(dense, "id", "full_outer")
        .withColumn("rrf_raw", rrf_raw)
    )
    return (
        fused.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.col("rrf_raw").desc(), "id")),
        )
        .filter(F.col("rk") <= _RRF_TOP)
        .select(
            "id",
            "lex_rank",
            "dense_rank",
            F.round("rrf_raw", 6).alias("rrf_score"),
            "rk",
        )
        .orderBy("rk")
    )
