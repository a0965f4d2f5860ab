"""Deterministic dataset splitting for training pipelines.

``hash_split`` assigns every row to a named split (train/val/test…) from a
seeded xxhash64 of its key — the assignment is a pure function of
(key, seed, weights), so it is reproducible across runs, machines,
cluster sizes, and re-partitioning, and rows added later never reshuffle
existing assignments (unlike ``randomSplit``, whose outcome depends on
partitioning).  This is the property training-data pipelines actually
need: a document's split membership is stable for the lifetime of the
corpus.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def split_column(key: Column | str, weights: dict[str, float], seed: int = 42) -> Column:
    """Column expression assigning a split name per the weight ranges."""
    total = sum(weights.values())
    k = F.col(key) if isinstance(key, str) else key
    bucket = F.pmod(F.xxhash64(k, F.lit(seed)), F.lit(_BUCKETS))
    expr: Column | None = None
    upper = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        upper += w / total * _BUCKETS
        cond = bucket < F.lit(int(upper))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    return (expr.otherwise(last) if expr is not None else F.lit(last)).alias("split")


def hash_split(
    df: DataFrame, key: str, weights: dict[str, float], seed: int = 42
) -> dict[str, DataFrame]:
    """Partition ``df`` into named splits by hashed key.

    Returns {name: DataFrame}; the frames are disjoint and their union is
    the input.  Proportions converge to ``weights`` with the usual
    hash-uniformity error (~1/sqrt(n) relative).
    """
    tagged = df.withColumn("split", split_column(key, weights, seed))
    return {name: tagged.filter(F.col("split") == name).drop("split") for name in weights}


_HEX = "0123456789abcdef"
PORTABLE_BUCKETS = 65536


def portable_bucket_sql(key_expr: str, str_type: str = "STRING") -> str:
    """SQL expression for a deterministic bucket in [0, 65536) from the
    first 4 hex chars of ``md5(key)``.

    Unlike ``split_column``'s xxhash64 (Spark-only), every term here —
    md5, substring, instr — exists with identical semantics in any ANSI-ish
    engine, so the *same* expression can drive a sampling decision in Spark
    and reproduce it bit-for-bit in an external verifier (the DuckDB oracle
    uses ``str_type="VARCHAR"``; Spark parses ``"STRING"``).  Like
    ``hash_split``, membership is a pure function of the key: stable across
    runs, partitioning, and engine.
    """
    h = f"md5(CAST({key_expr} AS {str_type}))"
    terms = " + ".join(
        f"(instr('{_HEX}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (3 - i)}"
        for i in range(4)
    )
    return f"({terms})"


def portable_hex_value_sql(
    key_expr: str, n_chars: int = 12, str_type: str = "STRING"
) -> str:
    """SQL expression for the first ``n_chars`` hex chars of ``md5(key)``
    as a BIGINT in [0, 16^n_chars) — ``portable_bucket_sql`` generalized
    to an order-preserving hash VALUE (hex-prefix order == numeric order).

    The engine-portable uniform hash primitive behind the KMV distinct
    sketch: both Spark and the DuckDB oracle evaluate the identical
    md5/substring/instr fold, so order statistics over the hash values —
    and estimators derived from them — agree bit-for-bit across engines.
    12 hex chars = 48 bits: comfortably inside BIGINT, collision odds on
    a Zipf vocabulary negligible (and identical in both engines if one
    ever occurs, since the hash is the same md5).
    """
    assert 1 <= n_chars <= 15  # 16 chars would touch the BIGINT sign bit
    h = f"md5(CAST({key_expr} AS {str_type}))"
    terms = " + ".join(
        f"(instr('{_HEX}', substring({h}, {i + 1}, 1)) - 1)"
        f" * CAST({16 ** (n_chars - 1 - i)} AS BIGINT)"
        for i in range(n_chars)
    )
    return f"({terms})"


_AES_SCALE = float(1 << 48)


def aes_key_column(
    key_expr: str, weight: Column, salt: str | int | None = None
) -> Column:
    """Efraimidis–Spirakis (A-ES) weighted-sampling key: ln(u) / w with
    u = (h + 1) / 2^48 from the portable 48-bit md5 hash of ``key_expr``
    (optionally salted — pass an int literal or a bare column identifier
    to draw an independent sample per salt; anything else raises, see
    below).

    Taking the top-k rows by this key (descending) is a weight-
    proportional sample WITHOUT replacement: maximizing ln(u)/w is
    maximizing u^(1/w), the A-ES exponential-race construction, so
    P(rank 1 = i) = w_i / Σw exactly, and each subsequent rank is drawn
    proportionally from the remainder.  This is the standard way a
    training-data pipeline samples documents proportional to quality or
    length scores.

    Deterministic and engine-portable: a pure function of
    (key, salt, weight) built from the same md5 fold as the split and
    sketch operators, so a DuckDB oracle evaluating the identical SQL
    reproduces the sample bit-for-bit — no RNG, no partitioning
    dependence, and a document's sample membership is stable under
    re-runs and cluster resizes (same property as ``hash_split``).

    ``weight`` must be strictly positive; ln(u) ≤ 0, so larger weights
    pull the key toward 0 (better rank).  At 100 TB this is a pure
    map-side expression; per-group top-k over it plans as
    WindowGroupLimit (per-partition k-row group limits), never a full
    per-group sort.
    """
    if salt is None:
        expr = key_expr
    else:
        # The salt lands inside a SQL expression string, so it must be an
        # int literal or a bare column identifier — never free-form text
        # (a salt like "round-1" would parse as arithmetic and silently
        # change the hash input; ADVICE r11 injection hardening).  Use an
        # int, or materialize the salt as a column first.
        if isinstance(salt, bool) or not isinstance(salt, (int, str)):
            raise TypeError(f"salt must be int or column name, got {salt!r}")
        if isinstance(salt, str) and not re.fullmatch(
            r"[A-Za-z_][A-Za-z0-9_]*", salt
        ):
            raise ValueError(
                f"string salt must be a bare column identifier, got "
                f"{salt!r}; pass an int for a literal salt"
            )
        expr = f"concat(CAST({key_expr} AS STRING), '#', CAST({salt} AS STRING))"
    hv = F.expr(portable_hex_value_sql(expr, 12, "STRING"))
    u = (hv + F.lit(1)).cast("double") / F.lit(_AES_SCALE)
    return F.log(u) / weight
