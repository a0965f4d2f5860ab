"""Corpus-curation analytics (extension surface, SURVEY.md §2.11):
lexical retrieval, domain-mixture divergence, event-rate anomaly gating.

These are the selection/diagnostic operators a training-data pipeline runs
*after* dedup and quality scoring: BM25 retrieval ranks documents against
probe terms (targeted subset mining / decontamination spot-checks),
Jensen–Shannon divergence quantifies how far each source's unigram
distribution sits from the corpus mixture (the signal behind mixture
re-weighting), and event-rate z-score anomalies flag collection-pipeline
incidents (a burst hour usually means a scraper loop, not real traffic).

Cross-engine float parity follows the house rules (queries/stable.py):
every arithmetic expression is mirrored term-by-term with identical
association so both engines produce bit-identical doubles, and the only
rounding happens once at the end on values far from decimal ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokenize
from .registry import register
from .stable import unit_sum, unit_sum_sql
from .tables import table

# BM25 probe terms: engine-domain words guaranteed present in the synthetic
# corpus vocabulary (TESTDATA.md).  Okapi defaults k1=1.2, b=0.75.
_BM25_TERMS = ("spark", "join", "window")
_K1 = 1.2
_B = 0.75
_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)

# The BM25 scoring pipeline as reusable CTEs: bm25_doc_retrieval's oracle
# is WITH <these> SELECT top-10; rrf_hybrid_retrieval (queries/retrieval.py)
# appends a dense-retrieval CTE and fuses the two rank lists.
BM25_SCORED_CTES = f"""tok AS (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
    stats AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS tot, COUNT(*) AS n_docs FROM dl
    ),
    tf AS (
        SELECT doc_id, token, COUNT(*) AS tf
        FROM tok WHERE token IN ({_TERMS_SQL}) GROUP BY 1, 2
    ),
    idf AS (
        SELECT token, COUNT(DISTINCT doc_id) AS df
        FROM tok WHERE token IN ({_TERMS_SQL}) GROUP BY 1
    ),
    scored AS (
        SELECT tf.doc_id,
               ROUND(SUM(
                   LN((CAST(stats.n_docs - idf.df AS DOUBLE) + 0.5)
                      / (CAST(idf.df AS DOUBLE) + 0.5) + 1)
                   * tf.tf * 2.2
                   / (tf.tf + 1.2 * (1 - 0.75 + 0.75
                       * (dl.dl / (stats.tot / stats.n_docs))))
               ), 4) AS bm25
        FROM tf
        JOIN idf ON tf.token = idf.token
        JOIN dl ON tf.doc_id = dl.doc_id, stats
        GROUP BY tf.doc_id
    )"""


def bm25_scores(docs: DataFrame) -> DataFrame:
    """``(doc_id, bm25)`` Okapi scores of every probe-term-matching doc —
    the Spark mirror of ``BM25_SCORED_CTES``, shared by
    ``bm25_doc_retrieval`` and ``rrf_hybrid_retrieval``."""
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.sum("dl").cast("bigint").alias("tot"), F.count("*").alias("n_docs")
    )
    hits = tok.filter(F.col("token").isin(*_BM25_TERMS))
    tf = hits.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    idf = hits.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    avgdl = F.col("tot") / F.col("n_docs")
    # Term-by-term mirror of the oracle expression (identical association
    # → identical doubles before the single ROUND).
    idf_expr = F.log(
        ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
        + F.lit(1)
    )
    denom = F.col("tf") + F.lit(1.2) * (
        F.lit(1) - F.lit(0.75) + F.lit(0.75) * (F.col("dl") / avgdl)
    )
    return (
        tf.join(F.broadcast(idf), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf_expr * F.col("tf") * F.lit(2.2) / denom), 4).alias("bm25"))
    )


@register(
    "bm25_doc_retrieval",
    oracle=f"""
    WITH {BM25_SCORED_CTES}
    SELECT doc_id, bm25, CAST(rk AS INTEGER) AS rk
    FROM (
        SELECT doc_id, bm25,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
        FROM scored
    )
    WHERE rk <= 10
    ORDER BY rk
    """,
    description="Okapi BM25 top-10 documents for fixed probe terms "
    "(k1=1.2, b=0.75): targeted subset retrieval over the corpus. Scale "
    "shape: the token explode shuffles once on (doc_id, token); the "
    "3-term df table and the 1-row corpus stats broadcast; the global "
    "top-10 runs as orderBy+limit (TakeOrderedAndProject, k-row "
    "per-partition state) before a 10-row ranking window",
    tags=("text", "retrieval", "curation"),
)
def bm25_doc_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scored = bm25_scores(docs)
    top = scored.orderBy(F.col("bm25").desc(), "doc_id").limit(10)
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return (
        top.withColumn("rk", F.row_number().over(w))
        .select("doc_id", "bm25", "rk")
        .orderBy("rk")
    )


@register(
    "source_unigram_divergence",
    oracle="""
    WITH tok AS (
        SELECT source, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    sc AS (SELECT source, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS tot_s FROM sc GROUP BY 1),
    cc AS (SELECT token, CAST(SUM(c) AS BIGINT) AS ct FROM sc GROUP BY 1),
    gt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tot FROM cc),
    grid AS (
        SELECT st.source, st.tot_s, cc.token, cc.ct, gt.tot,
               COALESCE(sc.c, 0) AS c
        FROM st CROSS JOIN cc CROSS JOIN gt
        LEFT JOIN sc ON sc.source = st.source AND sc.token = cc.token
    ),
    contrib AS (
        SELECT source, tot_s,
               (c / tot_s) AS p, (ct / tot) AS q
        FROM grid
    )
    SELECT source,
           MAX(tot_s) AS n_tokens,
           ROUND(SUM(
               0.5 * (CASE WHEN p > 0 THEN p * LN(p / ((p + q) / 2))
                           ELSE 0 END)
               + 0.5 * (q * LN(q / ((p + q) / 2)))
           ), 6) AS jsd
    FROM contrib
    GROUP BY source
    ORDER BY source
    """,
    description="Jensen-Shannon divergence of each source's unigram "
    "distribution vs the corpus mixture — the domain-shift signal behind "
    "mixture re-weighting (a source with high JSD is under-represented "
    "by uniform sampling). Scale shape: one shuffle on (source, token) "
    "for counts; the (vocab x sources) probability grid is Zipf-bounded "
    "(vocab grows ~log with corpus size), built by cross-joining the "
    "broadcast per-source totals with the token marginals; probabilities "
    "are exact-integer ratios so both engines emit identical doubles",
    tags=("text", "mixture", "curation"),
)
def source_unigram_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokenize("text")).alias("token"))
    sc = tok.groupBy("source", "token").agg(F.count("*").alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").cast("bigint").alias("tot_s"))
    cc = sc.groupBy("token").agg(F.sum("c").cast("bigint").alias("ct"))
    gt = cc.agg(F.sum("ct").cast("bigint").alias("tot"))
    grid = (
        st.crossJoin(F.broadcast(cc))
        .crossJoin(F.broadcast(gt))
        .join(sc, ["source", "token"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
    )
    p = F.col("c") / F.col("tot_s")
    q = F.col("ct") / F.col("tot")
    m = (p + q) / F.lit(2)
    contrib = F.lit(0.5) * F.when(p > 0, p * F.log(p / m)).otherwise(
        F.lit(0)
    ) + F.lit(0.5) * (q * F.log(q / m))
    return (
        grid.groupBy("source")
        .agg(
            F.max("tot_s").alias("n_tokens"),
            F.round(F.sum(contrib), 6).alias("jsd"),
        )
        .orderBy("source")
    )


_Q19_SQL_PRED = """(
       (p_brand = 'Brand#2'  AND p_size BETWEEN 1  AND 15
                             AND l_quantity BETWEEN 1  AND 20)
    OR (p_brand = 'Brand#17' AND p_size BETWEEN 10 AND 30
                             AND l_quantity BETWEEN 10 AND 40)
    OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1  AND 50
                             AND l_quantity BETWEEN 20 AND 50)
)"""


@register(
    "disjunctive_predicate_revenue",
    oracle=f"""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {unit_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {_Q19_SQL_PRED}
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    description="TPC-H Q19-style disjunctive predicate join: revenue per "
    "brand under an OR of (brand, size-band, quantity-band) conjunctions "
    "that each span BOTH join sides, so the whole predicate cannot be "
    "pushed below the join. What survives at scale (verified in the "
    "executed plan): Catalyst's CNF extraction pushes BOTH single-side "
    "residues — the brand/size disjunction into the part scan AND the "
    "quantity-band disjunction into the lineitem scan — the part side "
    "broadcasts, and only the cross-side conjunct mix evaluates "
    "post-join; the disjuncts are mutually exclusive by brand so the "
    "per-brand grouping needs no branch tagging",
    tags=("tpch", "disjunction", "pushdown"),
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    branch = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#17")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    ) | (
        (F.col("p_brand") == "Brand#4")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(20, 50)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(branch)
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            unit_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
        .orderBy("p_brand")
    )


@register(
    "events_rolling_engagement",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    dau AS (SELECT d, COUNT(*) AS dau FROM du GROUP BY d),
    wau AS (
        SELECT days.d, COUNT(DISTINCT du.user_id) AS wau
        FROM days JOIN du
          ON du.d <= days.d AND du.d >= days.d - INTERVAL 6 DAY
        GROUP BY days.d
    )
    SELECT dau.d AS day, dau.dau AS dau, wau.wau AS wau,
           (dau.dau / wau.wau) AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    ORDER BY day
    """,
    description="rolling engagement: daily active users, trailing-7-day "
    "active users, and DAU/WAU stickiness. Neither engine supports "
    "COUNT(DISTINCT) over a window frame, and a literal range join "
    "compiles to a nested-loop (O(days x pairs) comparisons), so the "
    "Spark side uses the explode-to-equi-join rewrite: each distinct "
    "(day, user) pair generates its 7 anchor days via sequence(), the "
    "anchor grid joins on day EQUALITY (hash join, broadcastable day "
    "list), and the fan-out is exactly 7x the (day, user) table with "
    "the shuffle keyed on the anchor day. Stickiness is an "
    "exact-integer IEEE division, bit-identical across engines without "
    "rounding; the DuckDB oracle states the same semantics as a plain "
    "range join",
    tags=("events", "engagement", "curation"),
)
def events_rolling_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.col("ts")).alias("d"), "user_id"
    ).distinct()
    days = du.select("d").distinct()
    dau = du.groupBy("d").agg(F.count("*").alias("dau"))
    anchor = days.select(F.col("d").alias("day"))
    # A (d, user) pair is inside the trailing-7-day window of anchors
    # d .. d+6; generate those anchors and keep the observed ones.
    fanned = du.select(
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
        ).alias("day"),
        "user_id",
    )
    wau = (
        fanned.join(F.broadcast(anchor), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.withColumnRenamed("d", "day")
        .join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            (F.col("dau") / F.col("wau")).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "events_hourly_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               COUNT(*) AS n_h,
               CAST(SUM(c) AS BIGINT) AS sum_c,
               CAST(SUM(c * c) AS BIGINT) AS sum_c2
        FROM hourly GROUP BY 1
    ),
    z AS (
        SELECT hourly.event_type, hourly.h, hourly.c,
               (hourly.c - (stats.sum_c / stats.n_h))
               / SQRT((stats.sum_c2 / stats.n_h)
                      - (stats.sum_c / stats.n_h) * (stats.sum_c / stats.n_h))
               AS zval,
               (stats.sum_c2 / stats.n_h)
               - (stats.sum_c / stats.n_h) * (stats.sum_c / stats.n_h) AS var
        FROM hourly JOIN stats ON hourly.event_type = stats.event_type
    )
    SELECT event_type, h AS hour, CAST(c AS BIGINT) AS n,
           ROUND(zval, 4) AS z
    FROM z
    WHERE var > 0 AND ABS(zval) >= 2
    ORDER BY event_type, hour
    """,
    description="event-rate anomaly detection: hourly counts per event "
    "type, z-scored against that type's own hourly mean/variance "
    "(population moments from exact integer sums — both engines compute "
    "identical doubles without a stddev builtin, whose internal "
    "accumulation order differs between engines); |z| >= 2 flags burst "
    "or outage hours. Scale shape: one shuffle to (type, hour) counts — "
    "cardinality is hours x types, tiny vs the event stream — then a "
    "broadcast join of the 1-row-per-type moments back onto the hourly "
    "series",
    tags=("events", "anomaly", "curation"),
)
def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("c"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("n_h"),
        F.sum("c").cast("bigint").alias("sum_c"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2"),
    )
    mean = F.col("sum_c") / F.col("n_h")
    var = (F.col("sum_c2") / F.col("n_h")) - mean * mean
    zval = (F.col("c") - mean) / F.sqrt(var)
    return (
        hourly.join(F.broadcast(stats), "event_type")
        .withColumn("var", var)
        .withColumn("zval", zval)
        .filter((F.col("var") > 0) & (F.abs(F.col("zval")) >= 2))
        .select(
            "event_type",
            F.col("h").alias("hour"),
            F.col("c").cast("bigint").alias("n"),
            F.round("zval", 4).alias("z"),
        )
        .orderBy("event_type", "hour")
    )


_COMMON_SHINGLE_DF = 3


@register(
    "common_shingle_fraction",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    sh AS (SELECT DISTINCT doc_id AS id,
                  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
           FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)),
    tagged AS (
        SELECT id, COUNT(*) OVER (PARTITION BY shingle) AS df
        FROM sh
    )
    SELECT id AS doc_id,
           COUNT(*) AS n_sh,
           CAST(SUM(CASE WHEN df >= {_COMMON_SHINGLE_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_common,
           CAST(SUM(CASE WHEN df >= {_COMMON_SHINGLE_DF} THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS common_frac
    FROM tagged
    GROUP BY id
    ORDER BY doc_id
    """,
    description="cross-document repetition diagnostic: per document, the "
    "count and fraction of its distinct 3-gram shingles whose corpus "
    "document-frequency is >= 3 — the per-doc view of the boilerplate "
    "mass that dedup's max_shingle_df pre-filter drops (a doc that is "
    "mostly corpus-common n-grams is template/boilerplate, the classic "
    "pre-training removal rule). Scale shape: ONE shuffle on the shingle "
    "key computes the document frequency as a window count (no "
    "self-join, no second pass over the corpus), then the per-doc "
    "aggregation; the fraction is a single integer division so both "
    "engines emit identical doubles",
    tags=("text", "dedup", "curation"),
)
def common_shingle_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_sets

    docs = table(spark, sf_dir, "documents")
    sh = shingle_sets(docs)
    tagged = sh.withColumn(
        "df", F.count("*").over(Window.partitionBy("shingle"))
    )
    common = F.sum(
        F.when(F.col("df") >= _COMMON_SHINGLE_DF, 1).otherwise(0)
    ).cast("long")
    return (
        tagged.groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_sh"),
            common.alias("n_common"),
            (common.cast("double") / F.count("*")).alias("common_frac"),
        )
        .orderBy("doc_id")
    )


_VOCAB_TOP = 10


@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT source, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    freq AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
    vocab AS (SELECT token FROM freq ORDER BY c DESC, token LIMIT {_VOCAB_TOP})
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oov,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS oov_rate
    FROM tok LEFT JOIN vocab v ON tok.token = v.token
    GROUP BY source
    ORDER BY source
    """,
    description=f"tokenizer-vocabulary coverage: per source, the fraction "
    f"of token occurrences outside the top-{_VOCAB_TOP} corpus vocabulary "
    "(count-desc, token-asc ties) — the out-of-vocabulary-rate analysis "
    "run before committing to a tokenizer/vocab size. Scale shape: the "
    "vocabulary is a global TakeOrderedAndProject over the token-frequency "
    "aggregate and broadcasts to tag the token stream map-side; the only "
    "full shuffles are the two token aggregations",
    tags=("text", "tokenizer", "curation"),
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(tokenize("text")).alias("token"))
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(_VOCAB_TOP)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    tagged = tok.join(F.broadcast(vocab), "token", "left")
    oov = F.sum(
        F.when(F.col("_in_vocab").isNull(), 1).otherwise(0)
    ).cast("long")
    return (
        tagged.groupBy("source")
        .agg(
            F.count("*").alias("n_tokens"),
            oov.alias("n_oov"),
            (oov.cast("double") / F.count("*")).alias("oov_rate"),
        )
        .orderBy("source")
    )


_PREFIX_TOKENS = 8


@register(
    "prefix_dup_groups",
    oracle=f"""
    WITH pref AS (
        SELECT doc_id,
               array_to_string(string_split(lower(text), ' ')[1:{_PREFIX_TOKENS}],
                               ' ') AS prefix
        FROM documents
    )
    SELECT prefix,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM pref
    GROUP BY prefix
    HAVING COUNT(*) >= 2
    ORDER BY min_doc_id
    """,
    description=f"prefix-duplicate grouping: documents sharing an "
    f"identical first-{_PREFIX_TOKENS}-token prefix, grouped with count "
    "and id range — the cheap crawl-artifact detector (mirror pages, "
    "template heads, truncation twins) run before the expensive "
    "shingle-based near-dup pass. Scale shape: one hash aggregation on "
    "the prefix key; the prefix is computed map-side from the scan with "
    "no explode, so shuffle volume is one short string per document",
    tags=("text", "dedup", "curation"),
)
def prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id",
        F.concat_ws(" ", F.slice(tokenize("text"), 1, _PREFIX_TOKENS)).alias(
            "prefix"
        ),
    )
    return (
        pref.groupBy("prefix")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("min_doc_id")
    )


@register(
    "text_token_entropy",
    oracle="""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS distinct_tokens,
           ROUND(LN(SUM(c)) - SUM(c * LN(c)) / SUM(c), 6) AS entropy_nats
    FROM tc
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    description="per-document unigram token entropy (nats) — the classic "
    "repetition/gibberish quality signal: near-zero entropy means a "
    "degenerate repeated-token document, entropy ≈ ln(n_tokens) means "
    "all-distinct tokens.  Algebraic identity H = ln(n) − Σ c·ln(c)/n "
    "turns the per-token probability fold into two plain aggregates, so "
    "no per-document probability vector is ever materialized.  Scale "
    "shape: one shuffle on (doc_id, token) for counts, then a per-doc "
    "aggregation over the distinct-token rows (Zipf-bounded per doc); "
    "everything map-side-combinable, no windows, no broadcast state.  "
    "Terms mirror the oracle exactly; the sum of c·ln(c) doubles rounds "
    "once at 6 dp (house JSD precedent)",
    tags=("text", "quality", "curation"),
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    tc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    return (
        tc.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("distinct_tokens"),
            F.round(
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
                6,
            ).alias("entropy_nats"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    tc AS (SELECT doc_id, token, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    cc AS (SELECT token, CAST(SUM(c) AS BIGINT) AS ct FROM tc GROUP BY 1),
    gt AS (SELECT CAST(SUM(ct) AS BIGINT) AS tot FROM cc)
    SELECT t.doc_id,
           CAST(SUM(t.c) AS BIGINT) AS n_tokens,
           ROUND(SUM(t.c * (LN(gt.tot) - LN(cc.ct))) / SUM(t.c), 6)
               AS mean_surprisal
    FROM tc t JOIN cc ON cc.token = t.token CROSS JOIN gt
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    description="per-document mean corpus-model surprisal: average "
    "−ln p(token) over the document's token occurrences, where p is the "
    "corpus unigram distribution — the cheap perplexity proxy used for "
    "quality filtering and importance sampling (documents of common "
    "words score low, rare-token documents score high).  Scale shape: "
    "the corpus unigram model is Zipf-bounded (vocab grows ~log with "
    "corpus size) so it joins as a BROADCAST onto the per-doc token "
    "counts — no corpus-wide shuffle beyond the (doc_id, token) count; "
    "ln(tot)−ln(ct) mirrors the oracle term-by-term and the final mean "
    "rounds once at 6 dp",
    tags=("text", "quality", "curation", "sampling"),
)
def doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokenize("text")).alias("token"))
    tc = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    cc = tc.groupBy("token").agg(F.sum("c").cast("long").alias("ct"))
    gt = cc.agg(F.sum("ct").cast("long").alias("tot"))
    surp = F.col("c") * (F.log(F.col("tot")) - F.log(F.col("ct")))
    return (
        tc.join(F.broadcast(cc), "token")
        .crossJoin(F.broadcast(gt))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(F.sum(surp) / F.sum("c"), 6).alias("mean_surprisal"),
        )
        .orderBy("doc_id")
    )


_KMV_K = 64
_KMV_HEX_CHARS = 12
_KMV_SCALE = float(16 ** _KMV_HEX_CHARS)  # 2^48 as an exact double


def _kmv_hash_sql(str_type: str) -> str:
    from ..operators.splits import portable_hex_value_sql

    return portable_hex_value_sql("shingle", _KMV_HEX_CHARS, str_type)


@register(
    "kmv_distinct_sketch",
    oracle=f"""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    h AS (SELECT DISTINCT source, {_kmv_hash_sql("VARCHAR")} AS hv FROM sh),
    r AS (
        SELECT source, hv,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv) AS rk
        FROM h
    ),
    mink AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS m,
               MAX(hv) AS kth_hv
        FROM r WHERE rk <= {_KMV_K}
        GROUP BY source
    ),
    ex AS (
        SELECT source, CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_exact
        FROM sh GROUP BY source
    )
    SELECT ex.source, ex.n_exact,
           CASE WHEN mink.m < {_KMV_K} THEN CAST(mink.m AS DOUBLE)
                ELSE ROUND(({_KMV_K} - 1) * {_KMV_SCALE!r} / mink.kth_hv, 4)
           END AS kmv_estimate,
           CASE WHEN mink.m < {_KMV_K} THEN 0.0
                ELSE ROUND(ABS(({_KMV_K} - 1) * {_KMV_SCALE!r} / mink.kth_hv
                               - ex.n_exact) / ex.n_exact, 4)
           END AS rel_err
    FROM ex JOIN mink ON mink.source = ex.source
    ORDER BY ex.source
    """,
    description="KMV (k-minimum-values) distinct-3-gram sketch per source, "
    "k=64 over a 48-bit engine-portable md5 hash "
    "(operators.splits.portable_hex_value_sql) — the mergeable "
    "cardinality sketch a 100 TB pipeline keeps per shard instead of "
    "exact distinct state; DV ≈ (k−1)/F(h₍ₖ₎), with the exact count "
    "carried alongside so the oracle verifies BOTH the estimator "
    "arithmetic and its error, bit-for-bit (the hash is the identical "
    "md5 fold in both engines — a deterministic sketch CAN share an "
    "exact oracle, unlike approx_count_distinct's HLL; shingles rather "
    "than unigrams so the per-group cardinality actually exceeds k and "
    "the estimator branch is exercised, asserted in "
    "tests/test_curation.py).  Scale shape: the k smallest hashes per "
    "group come from a rank-filter window the optimizer rewrites to "
    "per-partition group limits (WindowGroupLimit, plan-asserted), so "
    "no group's full hash set ever sorts in one place; groups with "
    "fewer than k values fall back to their exact count, as standard",
    tags=("sketch", "text", "distinct", "portable"),
)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles
    from ..operators.dedup import _spread_narrow

    docs = table(spark, sf_dir, "documents")
    # The shingle stream feeds BOTH the sketch branch and the exact-count
    # branch, but no persist is needed: both consumers sit in ONE final
    # DAG reading the identical distinct-aggregation subtree, so Catalyst
    # reuses the exchange (ReusedExchange, plan-asserted in
    # tests/test_plans.py) and the tokenize→explode pipeline runs once.
    sh = (
        _spread_narrow(docs)
        .select("source", tokenize("text").alias("_t"))
        .select("source", F.explode(word_shingles(F.col("_t"), 3)).alias("shingle"))
        .distinct()
    )
    h = sh.select("source", F.expr(_kmv_hash_sql("STRING")).alias("hv")).distinct()
    w = Window.partitionBy("source").orderBy("hv")
    mink = (
        h.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _KMV_K)
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("m"),
            F.max("hv").alias("kth_hv"),
        )
    )
    # sh is distinct by construction, so the exact cardinality is a plain
    # count — countDistinct here would re-run a whole distinct-aggregation
    # phase over rows that are already unique.
    ex = sh.groupBy("source").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    est = F.lit(_KMV_K - 1) * F.lit(_KMV_SCALE) / F.col("kth_hv")
    return (
        ex.join(mink, "source")
        .select(
            "source",
            "n_exact",
            F.when(F.col("m") < _KMV_K, F.col("m").cast("double"))
            .otherwise(F.round(est, 4))
            .alias("kmv_estimate"),
            F.when(F.col("m") < _KMV_K, F.lit(0.0))
            .otherwise(F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4))
            .alias("rel_err"),
        )
        .orderBy("source")
    )


# HyperLogLog geometry over the same 48-bit portable hash: the top
# _HLL_B bits pick one of 2^_HLL_B registers, the remaining 40 bits feed
# the leading-zero rank, so rho ranges 1..41 (41 = all rest bits zero).
_HLL_B = 8
_HLL_M = 1 << _HLL_B  # 256 registers
_HLL_REST_MOD = 1 << (48 - _HLL_B)  # 2^40
_HLL_MAX_RHO = (48 - _HLL_B) + 1  # 41
# alpha_256 * m^2, spelled identically in both engines (double literals
# parse to the same IEEE value; every subexpression is a double op).
_HLL_ALPHA_SQL = (
    "(CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE)"
    " / CAST(256 AS DOUBLE)))"
)


@register(
    "hll_distinct_sketch",
    oracle=f"""
    WITH toks AS (
        SELECT source, string_split(lower(text), ' ') AS t FROM documents
    ),
    sh AS (
        SELECT DISTINCT source,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    h AS (SELECT source, {_kmv_hash_sql("VARCHAR")} AS hv FROM sh),
    br AS (
        SELECT source, hv // {_HLL_REST_MOD} AS bucket,
               hv % {_HLL_REST_MOD} AS rest
        FROM h
    ),
    reg AS (
        SELECT source, bucket,
               MAX(CASE WHEN rest = 0 THEN {_HLL_MAX_RHO}
                        ELSE {_HLL_MAX_RHO} - length(bin(rest)) END) AS m_j
        FROM br GROUP BY source, bucket
    ),
    g AS (
        SELECT source, COUNT(*) AS cnt,
               SUM(CAST(1 AS DOUBLE) / (CAST(1 AS BIGINT) << m_j))
                   AS s_present
        FROM reg GROUP BY source
    ),
    raw AS (
        SELECT source,
               CAST({_HLL_M} - cnt AS BIGINT) AS empty_registers,
               {_HLL_ALPHA_SQL} * CAST({_HLL_M * _HLL_M} AS DOUBLE)
                   / (s_present + ({_HLL_M} - cnt)) AS e_raw
        FROM g
    ),
    fin AS (
        SELECT source, empty_registers,
               CASE WHEN e_raw <= {2.5 * _HLL_M!r} AND empty_registers > 0
                    THEN CAST({_HLL_M} AS DOUBLE)
                         * ln(CAST({_HLL_M} AS DOUBLE) / empty_registers)
                    ELSE e_raw END AS est
        FROM raw
    ),
    ex AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM sh GROUP BY source
    )
    SELECT ex.source, ex.n_exact, fin.empty_registers,
           ROUND(fin.est, 4) AS hll_estimate,
           ROUND(ABS(fin.est - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM ex JOIN fin ON fin.source = ex.source
    ORDER BY ex.source
    """,
    description="HyperLogLog distinct-3-gram sketch per source over the "
    "SAME portable 48-bit md5 hash and shingle stream as "
    "kmv_distinct_sketch — the fixed-width register-array counterpart to "
    "KMV's k-set: 256 registers, rho = leading-zero rank of the low 40 "
    "bits (via length(bin(x)), identical unpadded semantics in both "
    "engines), registers mergeable by MAX.  The harmonic sum uses "
    "1/(1<<rho) rather than pow() so every term is an exact dyadic "
    "double and the sum (<= 50 significand bits) is order-independent — "
    "which is what lets a randomized estimator share a bit-exact DuckDB "
    "oracle, branch decisions included (raw vs linear-counting small- "
    "range correction; the 48-bit space makes the large-range branch "
    "unreachable).  Exact count carried alongside so the oracle pins the "
    "estimator arithmetic AND its error.  Scale shape: two map-side- "
    "combinable shuffles — (source, bucket) max then a 256-rows-per- "
    "group fold; per-group state is 256 bytes-ish forever, the reason "
    "HLL (not exact distinct) is what a 100 TB pipeline ships between "
    "shards",
    tags=("sketch", "text", "distinct", "portable"),
)
def hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles
    from ..operators.dedup import _spread_narrow

    docs = table(spark, sf_dir, "documents")
    # One distinct shingle stream feeds the sketch and the exact branch;
    # Catalyst reuses the distinct-aggregation exchange (same shape as
    # kmv_distinct_sketch, plan-asserted there).
    sh = (
        _spread_narrow(docs)
        .select("source", tokenize("text").alias("_t"))
        .select(
            "source", F.explode(word_shingles(F.col("_t"), 3)).alias("shingle")
        )
        .distinct()
    )
    h = sh.select("source", F.expr(_kmv_hash_sql("STRING")).alias("hv"))
    br = h.select(
        "source",
        F.expr(f"hv DIV {_HLL_REST_MOD}").alias("bucket"),
        (F.col("hv") % _HLL_REST_MOD).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(_HLL_MAX_RHO)).otherwise(
        F.lit(_HLL_MAX_RHO) - F.length(F.expr("bin(rest)"))
    )
    reg = (
        br.withColumn("rho", rho)
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    g = reg.groupBy("source").agg(
        F.count("*").alias("cnt"),
        F.sum(
            F.expr("CAST(1 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), m_j)")
        ).alias("s_present"),
    )
    v = (F.lit(_HLL_M) - F.col("cnt")).cast("long")
    s = F.col("s_present") + (F.lit(_HLL_M) - F.col("cnt"))
    e_raw = F.expr(_HLL_ALPHA_SQL) * F.lit(float(_HLL_M * _HLL_M)) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * _HLL_M)) & (v > 0),
        F.lit(float(_HLL_M)) * F.log(F.lit(float(_HLL_M)) / v),
    ).otherwise(e_raw)
    prof = g.select(
        "source", v.alias("empty_registers"), est.alias("est")
    )
    ex = sh.groupBy("source").agg(F.count("*").cast("long").alias("n_exact"))
    return (
        ex.join(prof, "source")
        .select(
            "source",
            "n_exact",
            "empty_registers",
            F.round(F.col("est"), 4).alias("hll_estimate"),
            F.round(
                F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact"), 4
            ).alias("rel_err"),
        )
        .orderBy("source")
    )


# --- count-min frequency sketch -------------------------------------------
# Depth 4 x width 256: four 8-bit buckets sliced from DISJOINT hex spans of
# ONE portable md5 per shingle (positions 1-2, 3-4, 5-6, 7-8) -- a single
# hash evaluation per row, identical text in both engines, derived rows
# independent enough for the CMS min-estimate guarantee in practice.
_CMS_DEPTH = 4
_CMS_WIDTH = 256
_CMS_TOPK = 10


def _cms_bucket_sql(h_expr: str, r: int) -> str:
    hexd = "0123456789abcdef"
    p = 2 * r + 1
    return (
        f"((instr('{hexd}', substring({h_expr}, {p}, 1)) - 1) * 16"
        f" + (instr('{hexd}', substring({h_expr}, {p + 1}, 1)) - 1))"
    )


def cms_cells(occ: DataFrame, item_col: str = "shingle") -> DataFrame:
    """Count-min counter matrix (r, b, c) for an occurrence stream — one
    md5 per row, buckets from disjoint hex slices, partial aggregation
    collapsing every partition to ≤ depth·width rows before the shuffle.
    Sketches MERGE by elementwise cell addition (pinned in
    tests/test_curation.py), which is what makes per-shard sketches
    unionable at 100 TB."""
    hashed = occ.withColumn("h", F.md5(F.col(item_col).cast("string")))
    return (
        hashed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            F.expr(_cms_bucket_sql("h", r)).alias("b"),
                        )
                        for r in range(_CMS_DEPTH)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.r", "cell.b")
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
        SELECT string_split(lower(text), ' ') AS t FROM documents
    ),
    occ AS (
        SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    hashed AS (SELECT shingle, md5(CAST(shingle AS VARCHAR)) AS h FROM occ),
    cells AS (
        {" UNION ALL ".join(
            f"SELECT {r} AS r, {_cms_bucket_sql('h', r)} AS b, COUNT(*) AS c "
            "FROM hashed GROUP BY 1, 2"
            for r in range(_CMS_DEPTH)
        )}
    ),
    ex AS (
        SELECT shingle, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM occ GROUP BY shingle
        ORDER BY n_exact DESC, shingle LIMIT {_CMS_TOPK}
    ),
    probes AS (
        SELECT e.shingle, e.n_exact, cells.r,
               MIN(cells.c) AS cell
        FROM ex e
        JOIN cells
          ON cells.b = CASE cells.r
              {" ".join(
                  f"WHEN {r} THEN "
                  + _cms_bucket_sql("md5(CAST(e.shingle AS VARCHAR))", r)
                  for r in range(_CMS_DEPTH)
              )}
              END
        GROUP BY e.shingle, e.n_exact, cells.r
    )
    SELECT shingle, n_exact,
           CAST(MIN(cell) AS BIGINT) AS cms_est,
           CAST(MIN(cell) - n_exact AS BIGINT) AS overest
    FROM probes
    GROUP BY shingle, n_exact
    ORDER BY n_exact DESC, shingle
    """,
    description="count-min frequency sketch, depth 4 x width 256, over the "
    "corpus 3-gram occurrence stream — the THIRD sketch family beside KMV "
    "and HLL (those estimate cardinality; CMS estimates per-item "
    "FREQUENCY, the heavy-hitter primitive a 100 TB pipeline uses instead "
    "of an exact group-by on an unbounded key domain).  Buckets are four "
    "disjoint 8-bit slices of ONE portable md5 (identical fold text both "
    "engines), so the sketch is deterministic and the oracle verifies the "
    "estimator cell-for-cell: est = min over rows of the probed counter, "
    "always >= the exact count (overest >= 0, asserted in "
    "tests/test_curation.py along with register mergeability).  Scale "
    "shape: the counter matrix is 1,024 cells, so the sketch aggregation "
    "map-side-combines each partition to <= 1,024 rows before a tiny "
    "shuffle — per-partition sketches ARE the merge, the property that "
    "lets every shard keep one and union them",
    tags=("sketch", "text", "frequency", "portable"),
)
def cms_heavy_hitters(
    spark: SparkSession, sf_dir: str, sketch_only: bool = False
) -> DataFrame:
    """``sketch_only=True`` returns the maintained production artifact —
    the depth x width counter matrix itself — and skips the exact-truth
    branch (full per-shingle count + top-k + probe join) that exists for
    the oracle readout.  A production shard only ever pays the one
    map-side-combining cells aggregate; estimates are probed on demand.
    Default off; bench.py measures both tiers."""
    from ..functions.text import word_shingles
    from ..operators.dedup import _spread_narrow

    docs = table(spark, sf_dir, "documents")
    occ = (
        _spread_narrow(docs)
        .select(tokenize("text").alias("_t"))
        .select(F.explode(word_shingles(F.col("_t"), 3)).alias("shingle"))
    )
    cells = cms_cells(occ)
    if sketch_only:
        return cells.orderBy("r", "b")
    ex = (
        occ.groupBy("shingle")
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "shingle")
        .limit(_CMS_TOPK)
        .withColumn("h", F.md5(F.col("shingle").cast("string")))
    )
    probes = ex.select(
        "shingle",
        "n_exact",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.expr(_cms_bucket_sql("h", r)).alias("b"),
                    )
                    for r in range(_CMS_DEPTH)
                ]
            )
        ).alias("probe"),
    ).select("shingle", "n_exact", "probe.r", "probe.b")
    return (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("shingle", "n_exact")
        .agg(
            F.min("c").cast("long").alias("cms_est"),
            (F.min("c") - F.col("n_exact")).cast("long").alias("overest"),
        )
        .orderBy(F.col("n_exact").desc(), "shingle")
    )


# --- vocabulary coverage estimators: Chao1 + Good-Turing ----------------------


@register(
    "vocab_coverage_estimators",
    oracle="""
    WITH tok AS (
        SELECT UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY token
    ),
    foff AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
               CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        FROM cnt
    )
    SELECT n_tokens, vocab, f1, f2,
           ROUND(vocab + CAST(f1 AS DOUBLE) * (f1 - 1) / (2 * (f2 + 1)), 4)
               AS chao1,
           ROUND(CAST(f1 AS DOUBLE) / n_tokens, 6) AS unseen_mass,
           ROUND(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS coverage
    FROM foff
    """,
    description="vocabulary coverage estimators over the corpus token "
    "stream: Chao1 species-richness (Chao 1984, bias-corrected form "
    "V + F1(F1-1)/(2(F2+1)) — how many word types EXIST given how many "
    "were seen once vs twice) and the Good-Turing unseen-probability "
    "mass P0 = F1/N with its complement, Good's (1953) sample coverage "
    "— the pretraining-corpus questions 'how much vocabulary is this "
    "sample missing' and 'what probability mass will the next shard's "
    "novel types carry', answered from the frequency-of-frequencies "
    "alone.  All inputs are exact BIGINT (V, N, F1, F2 from one token "
    "count + one counts-of-counts fold); the estimators are single "
    "IEEE divisions of exact integers rounded at 4/6 dp, so both "
    "engines emit identical bits — the tokenizer is the module-contract "
    "lowercase space split shared by every text query.  Scale shape: "
    "two stacked map-side-combining aggregates (token counts, then the "
    "4-cell frequency profile); no window, no join, nothing retained "
    "beyond the token-count table that bm25/tfidf already build",
    tags=("text", "profiling", "estimator", "corpus"),
)
def vocab_coverage_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    tok = (
        table(spark, sf_dir, "documents")
        .select(F.explode(tokenize("text")).alias("token"))
    )
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("f"))
    foff = cnt.agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    return foff.select(
        "n_tokens",
        "vocab",
        "f1",
        "f2",
        # f1 cast to DOUBLE before the product (the Gini-denominator
        # lesson): f1^2 wraps a BIGINT once singletons pass ~3e9
        F.round(
            F.col("vocab")
            + F.col("f1").cast("double")
            * (F.col("f1") - 1)
            / (2 * (F.col("f2") + 1)),
            4,
        ).alias("chao1"),
        F.round(F.col("f1").cast("double") / F.col("n_tokens"), 6).alias(
            "unseen_mass"
        ),
        F.round(
            F.lit(1.0) - F.col("f1").cast("double") / F.col("n_tokens"), 6
        ).alias("coverage"),
    )


# --- deterministic negative sampling for training pairs -----------------------

# 8 candidates drawn per customer, 4 negatives kept after the history
# anti-join — the (candidates, kept) ratio leaves headroom for collision
# losses without a second drawing round at this corpus's density.
_NEG_DRAWS = 8
_NEG_KEEP = 4


def _neg_hash_sql(str_type: str) -> str:
    from ..operators.splits import portable_hex_value_sql

    return portable_hex_value_sql(
        f"CONCAT(CAST(o_custkey AS {str_type}), '#', CAST(i AS {str_type}))",
        12,
        str_type,
    )


@register(
    "training_negative_samples",
    oracle=f"""
    WITH hist AS (
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    pk AS (SELECT CAST(MAX(p_partkey) + 1 AS BIGINT) AS n_parts FROM part),
    custs AS (SELECT DISTINCT o_custkey FROM orders),
    cand AS (
        SELECT c.o_custkey, u.i,
               CAST(({_neg_hash_sql('VARCHAR')}) % pk.n_parts AS BIGINT)
                   AS cand_pk
        FROM custs c, pk, UNNEST(range(0, {_NEG_DRAWS})) AS u(i)
    ),
    real_ AS (
        SELECT cand.o_custkey, cand.i, cand.cand_pk
        FROM cand JOIN part p ON p.p_partkey = cand.cand_pk
    ),
    uniq AS (
        SELECT o_custkey, cand_pk, MIN(i) AS i
        FROM real_ GROUP BY o_custkey, cand_pk
    ),
    neg AS (
        SELECT r.o_custkey, r.i, r.cand_pk,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY r.o_custkey ORDER BY r.i) AS INT) AS rk
        FROM uniq r
        WHERE NOT EXISTS (
            SELECT 1 FROM hist h
            WHERE h.o_custkey = r.o_custkey AND h.l_partkey = r.cand_pk
        )
    )
    SELECT o_custkey, rk, cand_pk AS neg_partkey,
           CAST(i AS INT) AS draw_index
    FROM neg WHERE rk <= {_NEG_KEEP}
    ORDER BY o_custkey, rk
    """,
    description="deterministic NEGATIVE SAMPLING for training pairs: for "
    "every customer, {draws} candidate parts drawn by the portable md5 "
    "of (custkey, draw-index) mod the part keyspace, validated against "
    "the part dim, anti-joined against the customer's ACTUAL purchase "
    "history, deduplicated per (customer, part) at the minimum draw "
    "index (two draws can collide mod the keyspace; a training batch "
    "must not hold duplicate negatives for one user), and the first "
    "{keep} survivors kept by draw order — the "
    "(user, item-not-interacted) pair generator every two-tower / "
    "matrix-factorization / contrastive training pipeline runs beside "
    "its positive pairs (Mikolov et al. 2013 negative sampling; "
    "uniform-item variant).  Deterministic like weighted_sample_aes and "
    "priority_sample_subsetsum: no RNG state, the same negatives "
    "assemble on any engine/run/partitioning — which is what makes a "
    "SAMPLING operator oracle-checkable row for row AND what a "
    "reproducible training run wants (resuming a job regenerates "
    "identical pairs).  Scale shape: the candidate explode is "
    "draws-per-customer bounded; existence check and history rejection "
    "are keyed joins (broadcast part dim at this scale, shuffle "
    "hash-join at 100 TB — the (custkey, partkey) anti-join key is "
    "exactly how the positive-pair table is already partitioned); the "
    "rank window is partitioned per customer over <= {draws} rows; "
    "nothing all-pairs anywhere".format(draws=_NEG_DRAWS, keep=_NEG_KEEP),
    tags=("sampling", "curation", "portable", "training"),
)
def training_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    hist = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    part = table(spark, sf_dir, "part").select("p_partkey")
    pk = part.agg((F.max("p_partkey") + 1).cast("long").alias("n_parts"))
    custs = orders.select("o_custkey").distinct()
    cand = (
        custs.crossJoin(F.broadcast(pk))
        .select(
            "o_custkey",
            "n_parts",
            F.explode(F.sequence(F.lit(0), F.lit(_NEG_DRAWS - 1))).alias("i"),
        )
        .select(
            "o_custkey",
            "i",
            (F.expr(_neg_hash_sql("STRING")) % F.col("n_parts"))
            .cast("long")
            .alias("cand_pk"),
        )
    )
    real = cand.join(
        F.broadcast(part), F.col("p_partkey") == F.col("cand_pk")
    ).select("o_custkey", "i", "cand_pk")
    # Two draw indices can hash to the same cand_pk mod n_parts; without
    # this dedup both would survive the anti-join and the emitted training
    # pairs would contain duplicate negatives for one customer.  Keep the
    # MINIMUM draw index so the draw-order ranking below is unchanged for
    # collision-free customers.
    real = real.groupBy("o_custkey", "cand_pk").agg(F.min("i").alias("i"))
    neg = real.join(
        hist,
        (hist["o_custkey"] == real["o_custkey"])
        & (hist["l_partkey"] == real["cand_pk"]),
        "left_anti",
    )
    w = Window.partitionBy("o_custkey").orderBy("i")
    return (
        neg.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _NEG_KEEP)
        .select(
            "o_custkey",
            "rk",
            F.col("cand_pk").alias("neg_partkey"),
            F.col("i").cast("int").alias("draw_index"),
        )
        .orderBy("o_custkey", "rk")
    )


# --- Zipf slope fit over the counts-of-counts table ----------------------------


@register(
    "zipf_slope_fit",
    oracle="""
    WITH tok AS (
        SELECT UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY token
    ),
    cc AS (
        SELECT f, CAST(COUNT(*) AS BIGINT) AS c
        FROM cnt GROUP BY f
    ),
    blocks AS (
        SELECT f, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY f DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS r_prev
        FROM cc
    ),
    pts AS (
        SELECT f, c,
               ln(CAST(r_prev AS DOUBLE) + (CAST(c AS DOUBLE) + 1.0) / 2.0)
                   AS x,
               ln(CAST(f AS DOUBLE)) AS y
        FROM blocks
    ),
    cum AS (
        SELECT f,
               SUM(c) OVER w AS sw,
               SUM(c * f) OVER w AS stok,
               SUM(c * x) OVER w AS sx,
               SUM(c * y) OVER w AS sy,
               SUM(c * x * x) OVER w AS sxx,
               SUM(c * x * y) OVER w AS sxy,
               SUM(c * y * y) OVER w AS syy,
               ROW_NUMBER() OVER (ORDER BY f ASC) AS rn
        FROM pts
        WINDOW w AS (ORDER BY f DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(sw AS BIGINT) AS n_types,
           CAST(stok AS BIGINT) AS n_tokens,
           CASE WHEN CAST(sw AS DOUBLE) * sxx - sx * sx != 0
                THEN ROUND((CAST(sw AS DOUBLE) * sxy - sx * sy)
                     / (CAST(sw AS DOUBLE) * sxx - sx * sx), 4)
           END AS zipf_slope,
           CASE WHEN CAST(sw AS DOUBLE) * sxx - sx * sx != 0
                THEN ROUND((sy * sxx - sx * sxy)
                     / (CAST(sw AS DOUBLE) * sxx - sx * sx), 4)
           END AS log_intercept,
           CASE WHEN CAST(sw AS DOUBLE) * sxx - sx * sx != 0
                     AND CAST(sw AS DOUBLE) * syy - sy * sy != 0
                THEN ROUND((CAST(sw AS DOUBLE) * sxy - sx * sy)
                     * (CAST(sw AS DOUBLE) * sxy - sx * sy)
                     / ((CAST(sw AS DOUBLE) * sxx - sx * sx)
                        * (CAST(sw AS DOUBLE) * syy - sy * sy)), 4)
           END AS r2
    FROM cum WHERE rn = 1
    """,
    description="Zipf slope fit over the corpus rank-frequency curve "
    "(Zipf 1949: word frequency ~ C * rank^-s; natural text reads "
    "s ~ 1) — the corpus-profiling screen beside Chao1/Good-Turing "
    "(vocab_coverage_estimators) that catches template-heavy or "
    "boilerplate-stuffed shards by their bent log-log line.  "
    "Scale-safe formulation: fitting log f on log rank NEVER ranks "
    "tokens globally — every type with frequency f shares the tied "
    "MIDRANK r_prev + (c_f+1)/2 computable from the counts-of-counts "
    "table's prefix sum, so the weighted OLS over per-type points "
    "(ln midrank, ln f) x c_f collapses onto the counts-of-counts "
    "table, <= sqrt(2N) rows by construction (d distinct frequency "
    "values satisfy d(d+1)/2 <= N — ngram_distribution_profile's "
    "bound).  Exactness: f, c, and the rank prefix are exact BIGINT; "
    "ln() of integer-valued doubles is deterministic; the OLS "
    "sufficient statistics accumulate as f-DESC-ordered window sums "
    "(identical IEEE sequence in both engines — the "
    "revenue_trend_slope discipline adapted to where logs force "
    "doubles) and the slope/intercept/r2 emit once, rounded.  Pinned "
    "against numpy.polyfit over the expanded per-type point set and "
    "an exact f = C/r construction with known slope -1 "
    "(tests/test_round16_properties.py).  Scale shape: two stacked "
    "map-side-combining aggregates (token counts -> counts-of-counts) "
    "then ALL window work on the bounded counts-of-counts table; no "
    "global token sort, no join",
    tags=("text", "profiling", "regression", "corpus"),
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokenize

    tok = table(spark, sf_dir, "documents").select(
        F.explode(tokenize("text")).alias("token")
    )
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("f"))
    cc = cnt.groupBy("f").agg(F.count(F.lit(1)).cast("long").alias("c"))
    before = (
        Window.orderBy(F.col("f").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = cc.select(
        "f",
        "c",
        F.coalesce(F.sum("c").over(before), F.lit(0))
        .cast("long")
        .alias("r_prev"),
    )
    pts = blocks.select(
        "f",
        "c",
        F.log(
            F.col("r_prev").cast("double")
            + (F.col("c").cast("double") + F.lit(1.0)) / F.lit(2.0)
        ).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    w = (
        Window.orderBy(F.col("f").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pts.select(
        "f",
        F.sum("c").over(w).alias("sw"),
        F.sum(F.col("c") * F.col("f")).over(w).alias("stok"),
        F.sum(F.col("c") * F.col("x")).over(w).alias("sx"),
        F.sum(F.col("c") * F.col("y")).over(w).alias("sy"),
        F.sum(F.col("c") * F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("c") * F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("c") * F.col("y") * F.col("y")).over(w).alias("syy"),
        F.row_number().over(Window.orderBy(F.col("f").asc())).alias("rn"),
    )
    swd = F.col("sw").cast("double")
    den = swd * F.col("sxx") - F.col("sx") * F.col("sx")
    num = swd * F.col("sxy") - F.col("sx") * F.col("sy")
    # den = 0 when the counts-of-counts table has ONE row (every token
    # shares a frequency — e.g. an all-unique-token corpus): the slope
    # is undefined, and ANSI Spark would raise DIVIDE_BY_ZERO where
    # IEEE DuckDB emits inf/NaN.  NULL in both engines instead.
    sse = swd * F.col("syy") - F.col("sy") * F.col("sy")
    return cum.filter(F.col("rn") == 1).select(
        F.col("sw").cast("long").alias("n_types"),
        F.col("stok").cast("long").alias("n_tokens"),
        F.when(den != 0, F.round(num / den, 4)).alias("zipf_slope"),
        F.when(
            den != 0,
            F.round(
                (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
                / den,
                4,
            ),
        ).alias("log_intercept"),
        F.when(
            (den != 0) & (sse != 0),
            F.round(num * num / (den * sse), 4),
        ).alias("r2"),
    )


# --- Heaps' law fit over per-source shards -------------------------------------


@register(
    "heaps_law_fit",
    oracle="""
    WITH tok AS (
        SELECT source, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    shard AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(COUNT(DISTINCT token) AS BIGINT) AS vocab
        FROM tok GROUP BY source
    ),
    pts AS (
        SELECT source, n_tokens, vocab,
               ln(CAST(n_tokens AS DOUBLE)) AS x,
               ln(CAST(vocab AS DOUBLE)) AS y
        FROM shard
    ),
    cum AS (
        SELECT SUM(1.0) OVER w AS m,
               SUM(x) OVER w AS sx,
               SUM(y) OVER w AS sy,
               SUM(x * x) OVER w AS sxx,
               SUM(x * y) OVER w AS sxy,
               SUM(y * y) OVER w AS syy,
               ROW_NUMBER() OVER (ORDER BY source DESC) AS rn
        FROM pts
        WINDOW w AS (ORDER BY source
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CAST(m AS BIGINT) AS n_shards,
           CASE WHEN m * sxx - sx * sx != 0
                THEN ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 4)
           END AS beta,
           CASE WHEN m * sxx - sx * sx != 0
                THEN ROUND((sy * sxx - sx * sxy) / (m * sxx - sx * sx), 4)
           END AS log_k,
           CASE WHEN m * sxx - sx * sx != 0
                THEN ROUND(exp((sy * sxx - sx * sxy)
                     / (m * sxx - sx * sx)), 4)
           END AS heaps_k,
           CASE WHEN m * sxx - sx * sx != 0 AND m * syy - sy * sy != 0
                THEN ROUND((m * sxy - sx * sy) * (m * sxy - sx * sy)
                     / ((m * sxx - sx * sx) * (m * syy - sy * sy)), 4)
           END AS r2
    FROM cum WHERE rn = 1
    """,
    description="Heaps' law fit V = K * N^beta over per-source corpus "
    "shards (Heaps 1978; Herdan 1960): each source contributes one "
    "(ln N_tokens, ln vocab) point and the OLS beta estimates how fast "
    "vocabulary grows with corpus size — natural text reads beta ~ "
    "0.4-0.6, and a bent or flat line flags template/boilerplate "
    "sources exactly like zipf_slope_fit's rank-frequency screen (the "
    "two are the classic corpus-profiling pair: Zipf within a shard, "
    "Heaps across shard sizes — they are asymptotically equivalent, "
    "beta ~ 1/s).  Exactness: N and V are exact BIGINTs from one "
    "map-side-combining token aggregate + one distinct count per "
    "shard; ln() of integer-valued doubles is deterministic, and the "
    "OLS sufficient statistics accumulate as source-ORDERED window "
    "sums over the config-bounded shard table (one row per corpus "
    "source — the mixture_sampling_plan window class), so both "
    "engines run the identical IEEE sequence before the one rounded "
    "emit.  Pinned against numpy.polyfit over the same per-shard "
    "points (tests/test_round16_properties.py).  Scale shape: two "
    "corpus-sized keyed aggregates, then everything on the one-row-"
    "per-source table; no global sort, no join",
    tags=("text", "profiling", "regression", "corpus"),
)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import tokenize

    tok = table(spark, sf_dir, "documents").select(
        "source", F.explode(tokenize("text")).alias("token")
    )
    shard = tok.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.count_distinct("token").cast("long").alias("vocab"),
    )
    pts = shard.select(
        "source",
        F.log(F.col("n_tokens").cast("double")).alias("x"),
        F.log(F.col("vocab").cast("double")).alias("y"),
    )
    w = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    cum = pts.select(
        F.sum(F.lit(1.0)).over(w).alias("m"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
        F.row_number()
        .over(Window.orderBy(F.col("source").desc()))
        .alias("rn"),
    )
    den = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    icept = (
        F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    ) / den
    # den = 0 for a one-source corpus (or equal-sized shards): the fit
    # is undefined — NULL in both engines instead of an ANSI
    # DIVIDE_BY_ZERO (Spark) diverging from inf (DuckDB).
    sse = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    return cum.filter(F.col("rn") == 1).select(
        F.col("m").cast("long").alias("n_shards"),
        F.when(den != 0, F.round(num / den, 4)).alias("beta"),
        F.when(den != 0, F.round(icept, 4)).alias("log_k"),
        F.when(den != 0, F.round(F.exp(icept), 4)).alias("heaps_k"),
        F.when(
            (den != 0) & (sse != 0),
            F.round(num * num / (den * sse), 4),
        ).alias("r2"),
    )


# --- per-source token diversity indices ----------------------------------------


@register(
    "source_token_diversity",
    oracle="""
    WITH tok AS (
        SELECT source, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
    ),
    tc AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS f
        FROM tok GROUP BY source, token
    )
    SELECT source,
           CAST(SUM(f) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab,
           ROUND(LN(SUM(f)) - SUM(f * LN(f)) / SUM(f), 6) AS shannon_nats,
           CASE WHEN COUNT(*) > 1
                THEN ROUND((LN(SUM(f)) - SUM(f * LN(f)) / SUM(f))
                     / LN(CAST(COUNT(*) AS DOUBLE)), 6)
           END AS evenness,
           CAST(SUM(CAST(f AS DECIMAL(38,0)) * (f - 1)) AS DOUBLE)
               AS simpson_num,
           CASE WHEN SUM(f) > 1
                THEN ROUND(CAST(SUM(CAST(f AS DECIMAL(38,0)) * (f - 1))
                           AS DOUBLE)
                     / (CAST(SUM(f) AS DOUBLE) * (SUM(f) - 1)), 6)
           END AS simpson_concentration
    FROM tc
    GROUP BY source
    ORDER BY source
    """,
    description="per-source token diversity indices — Shannon entropy "
    "(nats), Pielou evenness H/ln(V), and the unbiased Simpson "
    "concentration sum f(f-1) / (N(N-1)) (Simpson 1949; Hurlbert's PIE "
    "complement) — the corpus-mixture screen beside zipf_slope_fit / "
    "heaps_law_fit / vocab_coverage_estimators: a source whose evenness "
    "collapses or whose Simpson concentration spikes is template- or "
    "boilerplate-dominated even when its raw token count looks healthy.  "
    "Exactness: Simpson rides PURE BIGINT sufficient statistics "
    "(sum f(f-1) and N(N-1) — order-independent integer aggregation) "
    "with one rounded division; Shannon uses the same algebraic "
    "identity H = ln(N) - sum f*ln(f) / N as text_token_entropy, whose "
    "per-group double fold rounds at 6 dp (house precedent — the "
    "per-source folds are vocabulary-sized).  Scale shape: one shuffle "
    "on (source, token) for counts, then a per-source aggregation over "
    "vocabulary-sized rows; everything map-side-combinable, no "
    "windows, no broadcast state",
    tags=("text", "profiling", "curation", "corpus"),
)
def source_token_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokenize

    tok = table(spark, sf_dir, "documents").select(
        "source", F.explode(tokenize("text")).alias("token")
    )
    tc = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    h = F.log(F.sum("f")) - F.sum(F.col("f") * F.log("f")) / F.sum("f")
    return (
        tc.groupBy("source")
        .agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.round(h, 6).alias("shannon_nats"),
            # vocab = 1 would divide by ln(1) = 0 — ANSI Spark raises
            # while IEEE DuckDB emits inf; NULL in both instead (a
            # single-token source has no defined evenness).
            F.when(
                F.count(F.lit(1)) > 1,
                F.round(
                    h / F.log(F.count(F.lit(1)).cast("double")), 6
                ),
            ).alias("evenness"),
            # DECIMAL(38,0) accumulator (the HHI ssq precedent): a
            # boilerplate type repeated ~3e9 times in one source would
            # wrap the BIGINT sum of f(f-1); emitted as DOUBLE (exact
            # integer-valued until 2^53, and the one consumer divides)
            F.sum(F.col("f").cast("decimal(38,0)") * (F.col("f") - 1))
            .cast("double")
            .alias("simpson_num"),
            # N = 1 (a single-token source) makes N(N-1) = 0 — NULL in
            # both engines, like the evenness guard above
            F.when(
                F.sum("f") > 1,
                F.round(
                    F.sum(
                        F.col("f").cast("decimal(38,0)") * (F.col("f") - 1)
                    ).cast("double")
                    / (F.sum("f").cast("double") * (F.sum("f") - 1)),
                    6,
                ),
            ).alias("simpson_concentration"),
        )
        .orderBy("source")
    )


@register(
    "ngram_novelty_rate",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS t
        FROM documents
    ),
    inst AS (
        SELECT doc_id, source,
               t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
        FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    ),
    first AS (SELECT g, MIN(doc_id) AS first_doc FROM inst GROUP BY g),
    per AS (
        SELECT i.doc_id, i.source,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN f.first_doc = i.doc_id THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_novel
        FROM inst i JOIN first f USING (g)
        GROUP BY i.doc_id, i.source
    )
    SELECT doc_id, source, n_grams, n_novel,
           ROUND(CAST(n_novel AS DOUBLE) / n_grams, 6) AS novelty
    FROM per
    ORDER BY doc_id
    """,
    description="per-document n-gram novelty: the fraction of each "
    "document's word-trigram INSTANCES whose trigram first appears in "
    "THIS document under the doc_id ingestion order (first_doc = min "
    "doc_id over the corpus) — the new-content-per-document curve a "
    "curation pipeline watches while ingesting a crawl: novelty near 1 "
    "means fresh text, near 0 means the document is assembled from "
    "already-seen n-grams (template/boilerplate/near-dup tail), the "
    "instance-level complement to substring_dup_coverage's verbatim "
    "islands and heaps_law_fit's corpus-level vocabulary curve.  "
    "Repeats WITHIN the first document containing a trigram count as "
    "novel (the document introduced them); docs under 3 tokens have no "
    "trigram instances and no row, in both engines.  Exactness: counts "
    "are pure BIGINT, one exact integer ratio rounded once.  Scale "
    "shape: one shuffle keyed on the trigram for the min-doc aggregate "
    "(map-side combining; the same shingle-keyed shape every dedup "
    "operator here ships), one shuffle for the instance join back on "
    "the trigram, one map-side-combined per-doc rollup; no window, no "
    "driver collect",
    tags=("text", "curation", "dedup", "profiling"),
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", tokenize("text").alias("t"))
    # sequence(1, 0) DESCENDS in Spark — exclude sub-trigram docs first
    inst = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.size("t") - 2)).alias("i"),
            "t",
        )
        .select(
            "doc_id",
            "source",
            F.concat_ws(
                " ",
                F.element_at("t", F.col("i")),
                F.element_at("t", F.col("i") + 1),
                F.element_at("t", F.col("i") + 2),
            ).alias("g"),
        )
    )
    first = inst.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per = (
        inst.join(first, "g")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "source",
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel").cast("double") / F.col("n_grams"), 6).alias(
            "novelty"
        ),
    ).orderBy("doc_id")
