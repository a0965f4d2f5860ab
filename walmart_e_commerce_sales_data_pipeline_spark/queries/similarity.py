"""Similarity-search queries over ``embeddings`` (extension surface,
SURVEY.md §2.11): brute-force cosine threshold pairs and top-k as the
correctness baseline, hyperplane-LSH as the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ivf_topk,
    train_ivf_centroids,
    block_cosine_pairs,
    cosine_pairs,
    lsh_bucketed_pairs,
    quantize_int8,
    rerank_topk,
    topk_neighbors,
)
from .registry import register
from .tables import table

COSINE_THRESHOLD = 0.45
TOPK_QUERY_LIMIT = 20
TOPK_K = 3

_PAIRS_SQL = f"""
    SELECT a.vec_id AS x, b.vec_id AS y,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS sim_r
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= {COSINE_THRESHOLD}
    ORDER BY x, y
"""


@register(
    "similarity_pairs",
    oracle=_PAIRS_SQL,
    description="brute-force cosine near-neighbor pairs ≥ 0.45 over the "
    "64-d float embeddings (operators.similarity.cosine_pairs; zip_with + "
    "aggregate fold, no UDFs)",
    tags=("similarity",),
)
def similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        cosine_pairs(emb, threshold=COSINE_THRESHOLD)
        .select("x", "y", F.round("sim", 4).alias("sim_r"))
        .orderBy("x", "y")
    )


@register(
    "similarity_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < {TOPK_QUERY_LIMIT}),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS sim
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id
    FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rk
        FROM scored
    )
    WHERE rk <= {TOPK_K}
    ORDER BY query_id, rk
    """,
    description="exact top-3 cosine neighbors for the first 20 vectors "
    "(operators.similarity.topk_neighbors: brute-force + per-query window)",
    tags=("similarity", "topk"),
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_LIMIT)
    return (
        topk_neighbors(emb, queries, k=TOPK_K)
        .select("query_id", F.col("rank").alias("rk"), "neighbor_id")
        .orderBy("query_id", "rk")
    )


@register(
    "similarity_pairs_blocked",
    oracle=_PAIRS_SQL,
    description="exact cosine pairs via broadcast block-matrix GEMM "
    "(operators.similarity.block_cosine_pairs) — the high-throughput path "
    "when the corpus fits a broadcast; must equal the brute-force oracle",
    tags=("similarity", "blocked"),
)
def similarity_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        block_cosine_pairs(emb, threshold=COSINE_THRESHOLD)
        .select("x", "y", F.round("sim", 4).alias("sim_r"))
        .orderBy("x", "y")
    )


@register(
    "similarity_lsh",
    oracle=_PAIRS_SQL,
    description="random-hyperplane LSH near-neighbor pairs with exact "
    "cosine re-ranking (operators.similarity.lsh_bucketed_pairs) — must "
    "reproduce the brute-force oracle at ≥ 0.45 with the default "
    "(16 planes, 4 chunks) banding",
    tags=("similarity", "lsh"),
)
def similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        lsh_bucketed_pairs(emb, threshold=COSINE_THRESHOLD)
        .select("x", "y", F.round("sim", 4).alias("sim_r"))
        .orderBy("x", "y")
    )


_IVF_CELLS = 8


@register(
    "similarity_topk_ivf",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
               WHERE vec_id < {TOPK_QUERY_LIMIT}),
    scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])) AS sim
        FROM q JOIN embeddings e ON e.vec_id <> q.query_id
    )
    SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id
    FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rk
        FROM scored
    )
    WHERE rk <= {TOPK_K}
    ORDER BY query_id, rk
    """,
    description="IVF top-k ANN (operators.similarity.ivf_topk): spherical "
    "k-means coarse cells trained on a driver sample, expression-only cell "
    "assignment, cell-key probe join, exact cosine re-rank.  Probed at "
    "nprobe == n_cells here so the result is provably the brute-force "
    "top-k (same oracle as similarity_topk); recall at nprobe < n_cells "
    "is measured on clustered data in tests/test_dedup_similarity.py",
    tags=("similarity", "topk", "ann", "ivf"),
)
def similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_LIMIT)
    cents = train_ivf_centroids(emb, n_cells=_IVF_CELLS, sample=1024)
    return (
        ivf_topk(emb, queries, cents, k=TOPK_K, nprobe=_IVF_CELLS)
        .select("query_id", F.col("rank").alias("rk"), "neighbor_id")
        .orderBy("query_id", "rk")
    )


@register(
    "quantize_embeddings",
    oracle="""
    WITH s AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings
    )
    SELECT vec_id, scale,
           array_to_string(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / scale) AS BIGINT)),
               ',') AS q_csv,
           CAST(list_sum(list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / scale) AS BIGINT)))
               AS BIGINT) AS q_sum,
           list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)
                        - FLOOR(CAST(x AS DOUBLE) * 127.0 / scale)
                          * scale / 127.0))) AS recon_err_max
    FROM s
    WHERE scale > 0
    ORDER BY vec_id
    """,
    description="symmetric per-vector int8 quantization "
    "(operators.similarity.quantize_int8): scale = max|x|, q = "
    "floor(x*127/scale) — the embedding-storage compression step before "
    "ANN indexing at 100 TB scale; pure array HOFs, zero shuffles, "
    "oracle verifies every quantized element plus exact integer checksum "
    "and max dequantization error (floor, never ROUND, so no cross-engine "
    "tie divergence); the quantized vector is emitted as a ','-joined "
    "string (q_csv) because the external harness canonicalizer hashes "
    "scalar cells — a raw array<bigint> column is unhashable there "
    "(round-3 red row), and the int→string rendering is exact in both "
    "engines so per-element verification strength is unchanged",
    tags=("similarity", "quantization", "storage"),
)
def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return (
        quantize_int8(emb)
        .select(
            F.col("id").alias("vec_id"),
            "scale",
            F.array_join(F.transform("q", lambda x: x.cast("string")), ",").alias(
                "q_csv"
            ),
            "q_sum",
            "recon_err_max",
        )
        .orderBy("vec_id")
    )


@register(
    "label_centroid_similarity",
    oracle="""
    WITH pos AS (
        SELECT label,
               CAST(u.i AS INTEGER) AS pos,
               CAST(u.v AS DOUBLE) AS v
        FROM (
            SELECT label,
                   unnest(list_transform(range(0, len(embedding)),
                          i -> {'i': i, 'v': embedding[i + 1]})) AS u
            FROM embeddings
        )
    ),
    cent AS (SELECT label, pos, AVG(v) AS c FROM pos GROUP BY label, pos),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               SUM(a.c * b.c) AS dot,
               SUM(a.c * a.c) AS na,
               SUM(b.c * b.c) AS nb
        FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT label_a, label_b,
           ROUND(dot / SQRT(na * nb), 6) AS centroid_cosine
    FROM pairs
    ORDER BY label_a, label_b
    """,
    description="inter-class embedding drift map: per-label centroid "
    "(dimension-wise mean via posexplode + one map-side-combined "
    "aggregation keyed on the label×dim domain) and the pairwise cosine "
    "between every two label centroids — the class-separability / "
    "domain-drift diagnostic run before training a classifier head or "
    "choosing contrastive negatives.  Scale shape: the only data-sized "
    "stage is the (label, dim)-keyed partial aggregate over N×D exploded "
    "rows (map-side combine collapses each partition to |labels|×D rows "
    "before the shuffle); the centroid table itself is |labels|×D rows — "
    "config-sized — so the pairwise self-join is a broadcast-scale "
    "equi-join on dim, never quadratic in N.  Cosine is rounded to 6 dp "
    "on both engines (double sums are order-dependent at the last ulp)",
    tags=("similarity", "profiling"),
)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    cent = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    a, b = cent.alias("a"), cent.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.pos") == F.col("b.pos"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.sum(F.col("a.c") * F.col("b.c")).alias("dot"),
            F.sum(F.col("a.c") * F.col("a.c")).alias("na"),
            F.sum(F.col("b.c") * F.col("b.c")).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.col("dot") / F.sqrt(F.col("na") * F.col("nb")), 6).alias(
            "centroid_cosine"
        ),
    ).orderBy("label_a", "label_b")


_RERANK_POOL = 10


@register(
    "retrieve_rerank_topk",
    oracle=f"""
    WITH sc AS (
        SELECT vec_id, embedding,
               list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) AS scale
        FROM embeddings
    ),
    qz AS (
        SELECT vec_id, embedding,
               list_transform(embedding,
                   x -> FLOOR(CAST(x AS DOUBLE) * 127.0 / scale)) AS q
        FROM sc WHERE scale > 0
    ),
    qry AS (
        SELECT vec_id AS query_id, embedding AS qv, q AS qq
        FROM qz WHERE vec_id < {TOPK_QUERY_LIMIT}
    ),
    coarse AS (
        SELECT qry.query_id, e.vec_id AS neighbor_id, qry.qv,
               e.embedding AS cv,
               CAST(list_dot_product(qry.qq, e.q) AS BIGINT) AS cscore
        FROM qry JOIN qz e ON e.vec_id <> qry.query_id
    ),
    pool AS (
        SELECT query_id, neighbor_id, qv, cv,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cscore DESC, neighbor_id)
                   AS coarse_rk
        FROM coarse
    ),
    rer AS (
        SELECT query_id, neighbor_id, CAST(coarse_rk AS INTEGER) AS coarse_rk,
               list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                      CAST(cv AS DOUBLE[])) AS sim
        FROM pool WHERE coarse_rk <= {_RERANK_POOL}
    )
    SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, coarse_rk,
           ROUND(sim, 4) AS sim_r
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id) AS rk
        FROM rer
    )
    WHERE rk <= {TOPK_K}
    ORDER BY query_id, rk
    """,
    description="two-stage retrieve-then-rerank top-3 "
    "(operators.similarity.rerank_topk): int8-quantized integer dot "
    "product retrieves a deterministic 10-candidate pool per query, exact "
    "float cosine reranks the pool only — the cross-encoder-shaped "
    "pipeline (cheap retriever + expensive scorer on candidates) with "
    "every stage closed-form, so unlike recall-bound ANN the full "
    "composition has an EXACT oracle; coarse_rk in the output surfaces "
    "how far the rerank moved each hit",
    tags=("similarity", "topk", "rerank"),
)
def retrieve_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERY_LIMIT)
    return (
        rerank_topk(emb, queries, k=TOPK_K, candidates=_RERANK_POOL)
        .select(
            "query_id",
            F.col("rank").alias("rk"),
            "neighbor_id",
            F.col("coarse_rank").alias("coarse_rk"),
            F.round("sim", 4).alias("sim_r"),
        )
        .orderBy("query_id", "rk")
    )
