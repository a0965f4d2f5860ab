"""Text-analysis queries over ``documents`` (extension surface, SURVEY.md
§2.11): corpus statistics, quality scoring, language ID, fingerprinting.
All pure Catalyst expressions (functions.text) with exact SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_PATTERN,
    LANG_MARKERS,
    bpe_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)
from .registry import register
from .stable import int_avg, int_avg_sql
from .tables import table

_TOKENS_SQL = "string_split(lower(text), ' ')"
_TOKEN_CNT_SQL = f"len({_TOKENS_SQL})"


@register(
    "text_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           {int_avg_sql("n_chars", "avg_chars")},
           {int_avg_sql(_TOKEN_CNT_SQL, "avg_tokens")},
           CAST(MAX({_TOKEN_CNT_SQL}) AS INTEGER) AS max_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    description="corpus statistics per language: doc count, avg chars, "
    "avg/max token count (functions.text.token_count)",
    tags=("text",),
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("tc", token_count("text"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            int_avg("n_chars", "avg_chars"),
            int_avg("tc", "avg_tokens"),
            F.max("tc").alias("max_tokens"),
        )
        .orderBy("lang")
    )


# Quality score mirrored term-by-term (same operation order → same bits).
_QUALITY_SQL = f"""(
    LEAST(len({_TOKENS_SQL}) / 100.0, 1.0) * 0.4
    + (1.0 - len(list_filter({_TOKENS_SQL},
            x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) / len({_TOKENS_SQL})) * 0.3
    + LEAST(n_chars / 500.0, 1.0) * 0.3
)"""


@register(
    "text_quality_buckets",
    oracle=f"""
    SELECT source,
           CAST(FLOOR({_QUALITY_SQL} * 10) AS INTEGER) AS quality_bucket,
           COUNT(*) AS n
    FROM documents
    GROUP BY source, quality_bucket
    ORDER BY source, quality_bucket
    """,
    description="heuristic quality scoring (length/stopword-density/char "
    "ratios, functions.text.quality_score) bucketed per source",
    tags=("text", "quality"),
)
def text_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    bucket = F.floor(quality_score(F.col("text"), F.col("n_chars")) * 10).cast("int")
    return (
        docs.groupBy("source", bucket.alias("quality_bucket"))
        .agg(F.count("*").alias("n"))
        .orderBy("source", "quality_bucket")
    )


def _marker_sql(lang: str) -> str:
    quoted = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_filter({_TOKENS_SQL}, x -> x IN ({quoted}))) > 0"


@register(
    "text_lang_id",
    oracle=f"""
    SELECT lang AS labeled_lang,
           CASE WHEN {_marker_sql("en")} THEN 'en'
                WHEN {_marker_sql("es")} THEN 'es'
                WHEN {_marker_sql("de")} THEN 'de'
                WHEN {_marker_sql("fr")} THEN 'fr'
                ELSE 'und' END AS predicted_lang,
           COUNT(*) AS n
    FROM documents
    GROUP BY labeled_lang, predicted_lang
    ORDER BY labeled_lang, predicted_lang
    """,
    description="stopword-marker language ID (functions.text.lang_id) "
    "cross-tabulated against the labeled lang column",
    tags=("text", "langid"),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.col("lang").alias("labeled_lang"), lang_id("text").alias("predicted_lang")
        )
        .agg(F.count("*").alias("n"))
        .orderBy("labeled_lang", "predicted_lang")
    )


@register(
    "lang_id_precision_recall",
    oracle=f"""
    WITH cells AS (
        SELECT lang AS labeled,
               CASE WHEN {_marker_sql("en")} THEN 'en'
                    WHEN {_marker_sql("es")} THEN 'es'
                    WHEN {_marker_sql("de")} THEN 'de'
                    WHEN {_marker_sql("fr")} THEN 'fr'
                    ELSE 'und' END AS predicted,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1, 2
    ),
    sup AS (SELECT labeled AS lang, CAST(SUM(n) AS BIGINT) AS support
            FROM cells GROUP BY 1),
    prd AS (SELECT predicted AS lang, CAST(SUM(n) AS BIGINT) AS n_pred
            FROM cells GROUP BY 1),
    tp AS (SELECT labeled AS lang, CAST(SUM(n) AS BIGINT) AS tp
           FROM cells WHERE labeled = predicted GROUP BY 1),
    cls AS (
        SELECT COALESCE(sup.lang, prd.lang) AS lang,
               COALESCE(sup.support, 0) AS support,
               COALESCE(prd.n_pred, 0) AS n_pred
        FROM sup FULL OUTER JOIN prd ON sup.lang = prd.lang
    )
    SELECT cls.lang, cls.support, cls.n_pred,
           COALESCE(tp.tp, 0) AS tp,
           CASE WHEN cls.n_pred > 0 THEN
               ROUND(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / cls.n_pred, 6)
           END AS "precision",
           CASE WHEN cls.support > 0 THEN
               ROUND(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / cls.support, 6)
           END AS recall,
           ROUND(2.0 * COALESCE(tp.tp, 0) / (cls.support + cls.n_pred), 6)
               AS f1
    FROM cls LEFT JOIN tp ON cls.lang = tp.lang
    ORDER BY cls.lang
    """,
    description="per-class precision / recall / F1 of the stopword-marker "
    "language classifier against the labeled lang column — the "
    "classifier-eval layer over text_lang_id's confusion matrix (the "
    "threshold-free companion to quality_score_auc's ranking eval): the "
    "class list is the FULL OUTER union of labeled and predicted "
    "classes, so 'und' (predicted-only, support 0) appears with NULL "
    "recall and labeled-only classes appear with NULL precision — the "
    "NULL guards a model-eval harness needs for absent classes.  "
    "Exactness: support / n_pred / tp are pure BIGINT confusion-cell "
    "sums; precision and recall are one exact-integer division each, "
    "rounded once; F1 uses the algebraic single-division form "
    "2*tp/(support + n_pred) — identical to 2PR/(P+R) when both are "
    "defined, and never 0/0 because every class appears on at least "
    "one side.  Scale shape: one shuffle on the (labeled, predicted) "
    "cell key — bounded by the 5x5 language domain, never corpus size; "
    "the marginal full-outer join and the tp left join run on "
    "domain-sized frames; per-doc work is one codegen marker scan",
    tags=("text", "langid", "evaluation"),
)
def lang_id_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        F.col("lang").alias("labeled"), lang_id("text").alias("predicted")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    sup = cells.groupBy(F.col("labeled").alias("lang")).agg(
        F.sum("n").cast("long").alias("support")
    )
    prd = cells.groupBy(F.col("predicted").alias("lang")).agg(
        F.sum("n").cast("long").alias("n_pred")
    )
    tp = (
        cells.filter(F.col("labeled") == F.col("predicted"))
        .groupBy(F.col("labeled").alias("lang"))
        .agg(F.sum("n").cast("long").alias("tp"))
    )
    cls = (
        sup.join(prd, "lang", "full_outer")
        .select(
            "lang",
            F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            F.coalesce("n_pred", F.lit(0)).cast("long").alias("n_pred"),
        )
    )
    tpc = F.coalesce("tp", F.lit(0)).cast("long")
    return (
        cls.join(tp, "lang", "left")
        .select(
            "lang",
            "support",
            "n_pred",
            tpc.alias("tp"),
            F.when(
                F.col("n_pred") > 0,
                F.round(tpc.cast("double") / F.col("n_pred"), 6),
            ).alias("precision"),
            F.when(
                F.col("support") > 0,
                F.round(tpc.cast("double") / F.col("support"), 6),
            ).alias("recall"),
            F.round(
                F.lit(2.0) * tpc / (F.col("support") + F.col("n_pred")), 6
            ).alias("f1"),
        )
        .orderBy("lang")
    )


@register(
    "doc_fingerprint",
    oracle="""
    WITH fp AS (
        SELECT source,
               md5(array_to_string(string_split(lower(text), ' '), ' ')) AS f
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT f) AS distinct_fingerprints,
           MIN(f) AS min_fingerprint
    FROM fp
    GROUP BY source
    ORDER BY source
    """,
    description="content fingerprinting via md5 over the canonical token "
    "join (functions.text.fingerprint; rolling-hash variant is Spark-only)",
    tags=("text", "fingerprint"),
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.withColumn("f", fingerprint("text"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("f").alias("distinct_fingerprints"),
            F.min("f").alias("min_fingerprint"),
        )
        .orderBy("source")
    )


_BPE_SQL_PATTERN = BPE_PATTERN.replace("'", "''")


@register(
    "text_bpe_tokens",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)
                AS BIGINT) AS ws_tokens,
           CAST(SUM(LENGTH(regexp_extract_all(text, '{_BPE_SQL_PATTERN}')))
                AS BIGINT) AS bpe_tokens,
           CAST(SUM(LENGTH(regexp_extract_all(text, '{_BPE_SQL_PATTERN}'))) AS DOUBLE)
               / SUM(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1) AS bpe_per_ws
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    description="corpus token budgeting per source: whitespace tokens vs "
    "GPT-2-style BPE pre-tokenizer counts (functions.text.bpe_token_count, "
    "pure regexp_count — JVM-side, no UDF); ratio is one exact-int IEEE "
    "division so both engines emit identical bits",
    tags=("text", "tokens"),
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count("text")).alias("ws_tokens"),
            F.sum(bpe_token_count("text")).alias("bpe_tokens"),
        )
        .withColumn(
            "bpe_per_ws",
            F.col("bpe_tokens").cast("double") / F.col("ws_tokens"),
        )
        .orderBy("source")
    )


@register(
    "text_repetition",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS t
        FROM documents
    ),
    sh AS (
        SELECT doc_id, source,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    per_doc AS (
        SELECT doc_id, source,
               COUNT(*) AS total_ng,
               COUNT(DISTINCT shingle) AS distinct_ng
        FROM sh GROUP BY doc_id, source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(total_ng - distinct_ng) AS BIGINT) AS dup_ngrams,
           CAST(SUM(total_ng) AS BIGINT) AS total_ngrams,
           CAST(SUM(total_ng - distinct_ng) AS BIGINT)
               / CAST(SUM(total_ng) AS BIGINT) AS dup_ratio
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    description="within-document repetition (Gopher/C4-style quality "
    "signal): fraction of duplicated 3-gram occurrences per source — "
    "per-doc total vs distinct shingle counts aggregate to exact integer "
    "numerator/denominator, so the ratio is one deterministic IEEE "
    "division (queries/stable.py analysis); docs shorter than 3 tokens "
    "contribute no shingles, identical to the oracle's empty UNNEST range",
    tags=("text", "quality", "dedup"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize, word_shingles
    from ..operators.dedup import _spread_narrow

    docs = table(spark, sf_dir, "documents")
    # Fully MAP-SIDE per-doc stats (round 8; the earlier explode + groupBy
    # paid a (doc, shingle) shuffle for counts the row can compute alone).
    # Shape notes:
    # - The per-row formulation originally lost 4.6 s to a pushdown trap:
    #   a post-hoc `total_ng > 0` filter was pushed BELOW the spreading
    #   repartition, inlining the entire shingle transform into a
    #   predicate evaluated serially on the single input partition.  The
    #   equivalent TOKEN-count pre-filter (≥ 3 tokens ⇔ ≥ 1 shingle,
    #   matching the oracle's empty UNNEST semantics) is a cheap
    #   independent predicate, so the trap cannot re-arm — same fix as
    #   operators/dedup.py's profile.
    # - tokens materialize into a column before shingling (no CSE inside
    #   HOF lambdas, SCALE.md §4); the shingle array materializes once per
    #   row and codegen CSEs it across the two size() references.
    per_doc = (
        _spread_narrow(docs)
        .select("source", tokenize("text").alias("_t"))
        .filter(F.size("_t") >= 3)
        .select("source", word_shingles(F.col("_t"), 3).alias("_sh"))
        .select(
            "source",
            F.size("_sh").alias("total_ng"),
            F.size(F.array_distinct("_sh")).alias("distinct_ng"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("total_ng") - F.col("distinct_ng")).alias("dup_ngrams"),
            F.sum("total_ng").alias("total_ngrams"),
        )
        .withColumn(
            "dup_ratio", F.col("dup_ngrams") / F.col("total_ngrams")
        )
        .orderBy("source")
    )


_CONTEXT_TOKENS = 2048


@register(
    "pack_context_segments",
    oracle=f"""
    WITH t AS (
        SELECT source, doc_id,
               len(string_split(lower(text), ' ')) AS tok
        FROM documents
    ),
    c AS (
        SELECT source, doc_id, tok,
               COALESCE(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS cum_before
        FROM t
    )
    SELECT source,
           CAST(cum_before // {_CONTEXT_TOKENS} AS BIGINT) AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS seg_tokens
    FROM c
    GROUP BY source, segment
    ORDER BY source, segment
    """,
    description="sequence-packing plan for training: documents assigned "
    "in stable doc_id order to fixed 2048-token context segments by the "
    "exact integer cumsum of their token counts (a doc belongs to the "
    "segment where it starts; boundary docs overflow into the next — the "
    "streaming-packing approximation).  One shuffle on the shard key; "
    "segment id uses integer `div`, not double division, because a "
    "per-shard token cumsum exceeds 2^53 long before 100 TB",
    tags=("text", "packing", "training"),
)
def pack_context_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = docs.select(
        "source",
        "doc_id",
        token_count("text").alias("tok"),
    ).withColumn(
        "cum_before", F.coalesce(F.sum("tok").over(w), F.lit(0).cast("long"))
    )
    return (
        c.withColumn("segment", F.expr(f"cum_before div {_CONTEXT_TOKENS}"))
        .groupBy("source", "segment")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("seg_tokens"))
        .orderBy("source", "segment")
    )


@register(
    "pack_greedy_bins",
    oracle=f"""
    WITH RECURSIVE t AS (
        SELECT source, doc_id,
               len(string_split(lower(text), ' ')) AS tok,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ),
    walk AS (
        SELECT source, rn, tok, 0 AS bin, tok AS fill FROM t WHERE rn = 1
        UNION ALL
        SELECT t.source, t.rn, t.tok,
               CASE WHEN w.fill + t.tok <= {_CONTEXT_TOKENS}
                    THEN w.bin ELSE w.bin + 1 END,
               CASE WHEN w.fill + t.tok <= {_CONTEXT_TOKENS}
                    THEN w.fill + t.tok ELSE t.tok END
        FROM walk w JOIN t ON t.source = w.source AND t.rn = w.rn + 1
    )
    SELECT source,
           CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS bin_tokens
    FROM walk
    GROUP BY source, bin
    ORDER BY source, bin
    """,
    description="greedy NON-splitting sequence packing: docs in stable "
    "doc_id order fill 2048-token bins; a doc that would overflow starts "
    "the next bin (an oversized doc gets a bin alone).  Inherently "
    "sequential per shard, so this is the applyInPandas-for-stateful-"
    "iteration pattern — one Arrow batch per shard group, plain Python "
    "fold inside — externally verified by a recursive-CTE oracle walking "
    "the identical fill recurrence.  Contrast with pack_context_segments, "
    "whose splitting-allowed assignment stays a pure window expression",
    tags=("text", "packing", "training", "pandas-udf"),
)
def pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    docs = table(spark, sf_dir, "documents")
    toks = docs.select("source", "doc_id", token_count("text").alias("tok"))
    out_schema = StructType(
        [
            StructField("source", StringType()),
            StructField("bin", LongType()),
            StructField("tok", IntegerType()),
        ]
    )
    limit = _CONTEXT_TOKENS

    # Self-contained closure (workers may not have this package importable).
    def pack(pdf):
        pdf = pdf.sort_values("doc_id")
        bins = []
        bin_id, fill, first = 0, 0, True
        for tok in pdf["tok"]:
            if first:
                fill, first = tok, False
            elif fill + tok <= limit:
                fill += tok
            else:
                bin_id += 1
                fill = tok
            bins.append(bin_id)
        return pdf.assign(bin=bins)[["source", "bin", "tok"]]

    packed = toks.groupBy("source").applyInPandas(pack, schema=out_schema)
    return (
        packed.groupBy("source", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("bin_tokens"))
        .orderBy("source", "bin")
    )


@register(
    "vocab_top_ngrams",
    oracle=f"""
    WITH bg AS (
        SELECT unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS ngram
        FROM (SELECT {_TOKENS_SQL} AS t FROM documents)
        WHERE len(t) >= 2
    )
    SELECT ngram, COUNT(*) AS n
    FROM bg
    GROUP BY ngram
    ORDER BY n DESC, ngram
    LIMIT 20
    """,
    description="corpus-wide top-20 most frequent bigrams — the "
    "vocabulary-building / stop-phrase-mining sweep a tokenizer-training "
    "pipeline runs over the whole corpus: explode bigrams (pure array "
    "HOFs, guarded so single-token docs contribute nothing), hash-agg "
    "with map-side partials on the ngram key, then a 0-byte-shuffle "
    "global top-k (TakeOrderedAndProject); count-desc + ngram tiebreak "
    "makes the cut deterministic in both engines",
    tags=("text", "vocab", "topk"),
)
def vocab_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize, word_shingles
    from ..operators.dedup import _spread_narrow

    docs = table(spark, sf_dir, "documents")
    # Same shape discipline as text_repetition: spread the single-file
    # scan across cores, materialize the token array into a column before
    # shingling (Catalyst does no CSE inside HOF lambdas — inlining the
    # split re-tokenizes per reference; measured 4.1 s → sub-second), and
    # word_shingles' size guard keeps <2-token docs at zero rows.
    return (
        _spread_narrow(docs)
        .select(tokenize("text").alias("_t"))
        .select(F.explode(word_shingles(F.col("_t"), 2)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "ngram")
        .limit(20)
    )


@register(
    "quality_percentile_filter",
    oracle=f"""
    WITH scored AS (
        SELECT lang, n_chars,
               CAST(len({_TOKENS_SQL}) AS INTEGER) AS tc,
               PERCENT_RANK() OVER (
                   PARTITION BY lang ORDER BY {_QUALITY_SQL} DESC
               ) AS pr
        FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           {int_avg_sql("n_chars", "avg_chars")},
           CAST(MAX(tc) AS INTEGER) AS max_tokens
    FROM scored
    WHERE pr <= 0.5
    GROUP BY lang
    ORDER BY lang
    """,
    description="per-language quality-percentile gating: keep the top "
    "half of each language by heuristic quality score (percent_rank over "
    "the per-lang partition — one shuffle on lang), then summarize the "
    "survivors; the score is mirrored term-by-term so both engines rank "
    "identical doubles, and percent_rank's (rank-1)/(N-1) is an exact "
    "rational of ints so the 0.5 cut cannot diverge; the per-lang "
    "curation step a corpus pipeline runs before mixing",
    tags=("text", "quality", "window"),
)
def quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("q"))
    return (
        docs.select(
            "lang",
            "n_chars",
            token_count("text").alias("tc"),
            quality_score(F.col("text"), F.col("n_chars")).alias("q"),
        )
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.5)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            int_avg("n_chars", "avg_chars"),
            F.max("tc").alias("max_tokens"),
        )
        .orderBy("lang")
    )


# Content-defined chunking: a position is a chunk boundary when the
# rolling 3-gram at that position hashes into bucket ≡ 0 (mod 16) —
# Rabin/Gear-style CDC with an expected chunk length of 16 tokens.
# Boundaries depend only on local content, so an insertion early in a
# document shifts at most one chunk (the property that makes CDC the
# standard prep for chunk-level dedup of near-identical documents).
_CDC_MOD = 16


def _cdc_boundary_sql(shingle_expr: str) -> str:
    from ..operators.splits import portable_bucket_sql

    return f"({portable_bucket_sql(shingle_expr, 'VARCHAR')}) % {_CDC_MOD} = 0"


@register(
    "cdc_chunk_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
    ),
    sh AS (
        SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    bnd AS (
        SELECT doc_id,
               SUM(CASE WHEN {_cdc_boundary_sql("s")} THEN 1 ELSE 0 END) AS nb
        FROM sh GROUP BY doc_id
    ),
    per_doc AS (
        SELECT d.source,
               CAST(len({_TOKENS_SQL}) AS INTEGER) AS tc,
               COALESCE(b.nb, 0) AS nb
        FROM documents d LEFT JOIN bnd b ON d.doc_id = b.doc_id
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(tc) AS BIGINT) AS total_tokens,
           CAST(SUM(nb + 1) AS BIGINT) AS total_chunks,
           CAST(SUM(tc) AS BIGINT) / CAST(SUM(nb + 1) AS BIGINT)
               AS avg_chunk_tokens
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    description="content-defined chunking statistics: Rabin-style chunk "
    "boundaries wherever the rolling 3-gram's engine-portable md5 bucket "
    "is ≡ 0 (mod 16) — boundaries are a pure function of local content "
    "(insertion-shift-resistant), the prep step for chunk-level dedup of "
    "near-identical documents; per-source doc/token/chunk accounting with "
    "one exact integer division for the mean chunk length; docs shorter "
    "than one 3-gram form a single chunk (LEFT join keeps them)",
    tags=("text", "dedup", "chunking"),
)
def cdc_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize, word_shingles
    from ..operators.dedup import _spread_narrow
    from ..operators.splits import portable_bucket_sql

    docs = _spread_narrow(table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", "source", tokenize("text").alias("_t")
    ).select("doc_id", "source", F.size("_t").alias("tc"), "_t")
    boundaries = (
        base.select("doc_id", F.explode(word_shingles(F.col("_t"), 3)).alias("_s"))
        .select(
            "doc_id",
            (F.expr(portable_bucket_sql("_s", "STRING")) % _CDC_MOD == 0)
            .cast("int")
            .alias("_b"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_b").alias("nb"))
    )
    per_doc = (
        base.drop("_t")
        .join(boundaries, "doc_id", "left")
        .select("source", "tc", F.coalesce("nb", F.lit(0)).alias("nb"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tc").alias("total_tokens"),
            F.sum(F.col("nb") + 1).alias("total_chunks"),
            (F.sum("tc") / F.sum(F.col("nb") + 1)).alias("avg_chunk_tokens"),
        )
        .orderBy("source")
    )


_FILL_BUDGET = 10_000  # tokens per source


@register(
    "token_budget_fill",
    oracle=f"""
    WITH scored AS (
        SELECT source, doc_id,
               CAST(len({_TOKENS_SQL}) AS INTEGER) AS tc,
               {_QUALITY_SQL} AS q
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, tc, q,
               SUM(tc) OVER (PARTITION BY source
                             ORDER BY q DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
        FROM scored
    )
    SELECT source,
           COUNT(*) AS n_kept,
           CAST(SUM(tc) AS BIGINT) AS tokens_kept,
           MIN(q) AS min_quality_kept
    FROM ranked
    WHERE cum <= {_FILL_BUDGET}
    GROUP BY source
    ORDER BY source
    """,
    description="token-budget fill: per source, keep the highest-quality "
    "documents until a 10k-token budget is exhausted (quality-desc cumsum "
    "window with doc_id tiebreak — the 'fill N tokens from the best data' "
    "selection step of corpus curation); one shuffle on source, exact "
    "integer cumsum (explicit ROWS frame, unique ordering), and the "
    "term-mirrored quality score makes MIN(q) a comparison over "
    "bit-identical doubles",
    tags=("text", "quality", "sampling"),
)
def token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("q"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            "source",
            "doc_id",
            token_count("text").alias("tc"),
            quality_score(F.col("text"), F.col("n_chars")).alias("q"),
        )
        .withColumn("cum", F.sum("tc").over(w))
        .filter(F.col("cum") <= _FILL_BUDGET)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_kept"),
            F.sum("tc").alias("tokens_kept"),
            F.min("q").alias("min_quality_kept"),
        )
        .orderBy("source")
    )


from ..functions.text import PII_PATTERNS, redact_pii  # noqa: E402

_EMAIL_RE, _EMAIL_TOK = PII_PATTERNS["email"]
_PHONE_RE, _PHONE_TOK = PII_PATTERNS["phone"]
_IP_RE, _IP_TOK = PII_PATTERNS["ipv4"]


@register(
    "pii_redaction_stats",
    oracle=f"""
    WITH enriched AS (
        SELECT source,
               text || ' contact user' || doc_id || '@example.com phone 555-'
                    || lpad(CAST(doc_id % 100 AS VARCHAR), 4, '0')
                    || '-4321 ip 10.0.' || (doc_id % 256) || '.7' AS t
        FROM documents
    ),
    counted AS (
        SELECT source, t,
               len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_email,
               len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phone
        FROM enriched
    ),
    redacted AS (
        SELECT source, n_email, n_phone,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(t, '{_EMAIL_RE}', '{_EMAIL_TOK}', 'g'),
                       '{_PHONE_RE}', '{_PHONE_TOK}', 'g'),
                   '{_IP_RE}', '{_IP_TOK}', 'g') AS rt,
               len(t) AS raw_len
        FROM counted
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(n_email) AS BIGINT) AS emails,
           CAST(SUM(n_phone) AS BIGINT) AS phones,
           CAST(SUM(len(rt) - len(replace(rt, '<IP>', ''))) / len('<IP>')
                AS BIGINT) AS ips,
           CAST(SUM(raw_len - len(rt)) AS BIGINT) AS chars_removed
    FROM redacted GROUP BY source ORDER BY source
    """,
    description="PII redaction scrub (functions.text.redact_pii — the "
    "pre-training privacy stage): emails/phones/IPv4 replaced by typed "
    "placeholders via chained regexp_replace in email→phone→ip order "
    "(an unredacted address would leave digit runs behind; an IP-first "
    "pass could consume part of a dot-separated phone adjacent to other "
    "dotted digits).  The phone pattern covers NANP layouts — "
    "(555) 123-4567, 555-123-4567, 555.123.4567 — plus the corpus's "
    "3-4-4 contact-line form.  The synthetic "
    "corpus carries no natural PII, so a deterministic contact line "
    "derived from doc_id is appended first — constructed identically in "
    "the oracle — making every count nonzero and the transform "
    "equality real, not vacuous.  Patterns are restricted to the "
    "Java/RE2-common regex subset so both engines redact "
    "byte-identically; IP hits are counted from the redacted text "
    "(placeholder occurrences) because Spark's regexp_count and RE2 "
    "handle the overlapping phone/IP digit runs identically only "
    "after the earlier passes.  Pure whole-stage-codegen expressions, "
    "zero Python, one shuffle (the final per-source aggregate)",
    tags=("text", "privacy", "curation"),
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com phone 555-"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 4, "0"),
        F.lit("-4321 ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    enriched = docs.select("source", t.alias("t"))
    counted = enriched.select(
        "source",
        "t",
        F.regexp_count("t", F.lit(_EMAIL_RE)).alias("n_email"),
        F.regexp_count("t", F.lit(_PHONE_RE)).alias("n_phone"),
    )
    red = counted.select(
        "source",
        "n_email",
        "n_phone",
        redact_pii("t").alias("rt"),
        F.length("t").alias("raw_len"),
    )
    ip_hits = (
        F.length("rt") - F.length(F.replace(F.col("rt"), F.lit("<IP>")))
    ) / F.lit(len("<IP>"))
    return (
        red.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("docs"),
            F.sum("n_email").cast("long").alias("emails"),
            F.sum("n_phone").cast("long").alias("phones"),
            F.sum(ip_hits).cast("long").alias("ips"),
            F.sum(F.col("raw_len") - F.length("rt")).cast("long").alias(
                "chars_removed"
            ),
        )
        .orderBy("source")
    )
