"""Similarity search over embedding columns (``array<float>``).

Two paths:

- ``cosine_pairs`` / ``topk_neighbors``: brute-force — correct baseline,
  quadratic candidate space.  Fine up to ~10^5 vectors per side; at 100 TB
  this is the *verifier*, not the index.
- ``lsh_bucketed_pairs``: random-hyperplane LSH — signatures from
  deterministic seeded pseudo-hyperplanes (no stored model), bucket join on
  signature chunks.  This is the scale path: the shuffle key is the bucket,
  candidate sets are tiny, and exact cosine re-ranks only candidates.

Everything is built-in expressions (``zip_with``/``aggregate`` folds);
the hyperplanes are derived per (plane, dimension) from ``xxhash64`` so
every executor computes identical planes without broadcasting state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def cosine_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
) -> DataFrame:
    """All pairs (x < y) with cosine similarity ≥ threshold (brute force)."""
    a = embeddings.select(F.col(id_col).alias("x"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("y"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("x") < F.col("y"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("x", "y", "sim")
    )


def topk_neighbors(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (brute force +
    per-query window).  Ties broken by neighbor id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _plane_projection_sign(vec_col: str, plane: int, dims: int) -> F.Column:
    """Sign of the projection onto one deterministic pseudo-random
    hyperplane.  The plane's weight for dimension d is a centered hash of
    (plane, d) — identical on every executor, no model state to ship.

    NB: all lambdas take exactly one parameter — PySpark passes the element
    index as a second positional arg to 2-param lambdas, so a default-arg
    capture (``lambda d, p=p``) would silently bind the index.
    """
    weights = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: (F.pmod(F.xxhash64(F.lit(plane), d), F.lit(2001)) - 1000).cast("double")
        / 1000.0,
    )
    proj = F.aggregate(
        F.zip_with(F.col(vec_col), weights, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (proj >= 0).cast("long")


def lsh_bucketed_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    rows_per_table: int = 2,
    tables: int = 24,
    dims: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH near-neighbor pairs, exactly re-ranked.

    ``tables`` independent hash tables of ``rows_per_table`` planes each;
    a pair becomes a candidate when it agrees on *all* planes of *any*
    table, then exact cosine filters the candidates.  For cosine s the
    per-plane agreement is p = 1 − arccos(s)/π, so
    P(candidate) = 1 − (1 − p^r)^L — at s = 0.45, r=2, L=24 the miss
    probability is ≈ 2e-6 (and deterministic for a fixed dataset, since
    the planes are seeded hashes).  The shuffle key is (table, bucket);
    candidate verification touches only the bucket-collision set.
    """
    bucket_cols = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for r in range(rows_per_table):
            bit = _plane_projection_sign(vec_col, t * rows_per_table + r, dims)
            bucket = bucket.bitwiseOR(F.shiftleft(bit, r))
        bucket_cols.append(
            F.struct(F.lit(t).alias("table_idx"), bucket.alias("bucket")).alias(f"t{t}")
        )
    sigs = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.array(*bucket_cols).alias("bs")
    )
    pieces = sigs.select("id", "v", F.explode("bs").alias("p")).select(
        "id", "v", "p.table_idx", "p.bucket"
    )
    a = pieces.select(F.col("id").alias("x"), F.col("v").alias("va"), "table_idx", "bucket")
    b = pieces.select(F.col("id").alias("y"), F.col("v").alias("vb"), "table_idx", "bucket")
    cands = (
        a.join(b, ["table_idx", "bucket"])
        .filter(F.col("x") < F.col("y"))
        .select("x", "y", "va", "vb")
        .dropDuplicates(["x", "y"])
    )
    return (
        cands.withColumn("sim", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("x", "y", "sim")
    )
