"""Python UDTF (user-defined table function) API coverage.

Spark 4's arrow-optimized UDTFs are the table-valued cousin of Pandas
UDFs: one input row → many output rows, with the schema declared up
front.  Like all Python-boundary APIs in this engine they are NOT a hot
path (the explode/HOF expression form of the same computation stays
JVM-side and is the one registered queries use) — this test pins the API
family and proves the UDTF output equals the expression formulation, so
a user porting a UDTF-based pipeline knows both forms agree.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_udtf_matches_explode_expression(spark):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.lower().split(" ")):
                    yield tok, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    got = {
        (r["token"], r["pos"])
        for r in spark.sql(
            "SELECT token, pos FROM tokenize_udtf('The fast Key ORDER sort')"
        ).collect()
    }
    want = {
        (r["token"], r["pos"])
        for r in (
            spark.range(1)
            .select(lit("The fast Key ORDER sort").alias("t"))
            .select(
                F.posexplode(F.split(F.lower("t"), " ")).alias("pos", "token")
            )
            .select("token", "pos")
        ).collect()
    }
    assert got == want and len(got) == 5


def test_udtf_lateral_join_over_table(spark):
    """UDTF in a LATERAL join position — the row-multiplying shape that
    actually matters (per-document expansion), asserted equal to the
    explode plan on real testdata."""
    from pyspark.sql.functions import udtf

    from tests.conftest import SF0001

    @udtf(returnType="tok: string")
    class FirstTokens:
        def eval(self, text: str):
            # `is not None`, not truthiness: ''.split(' ') == [''] exactly
            # like F.split, so empty docs emit one empty token in BOTH
            # formulations instead of silently diverging
            if text is not None:
                for tok in text.lower().split(" ")[:3]:
                    yield (tok,)

    spark.udtf.register("first_tokens", FirstTokens)
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").limit(50)
    docs.createOrReplaceTempView("_udtf_docs")
    got = (
        spark.sql(
            "SELECT d.doc_id, t.tok FROM _udtf_docs d, "
            "LATERAL first_tokens(d.text) t"
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("tok")).alias("toks"))
    )
    want = (
        docs.select(
            "doc_id",
            F.explode(F.slice(F.split(F.lower("text"), " "), 1, 3)).alias("tok"),
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("tok")).alias("toks"))
    )
    g = {r["doc_id"]: r["toks"] for r in got.collect()}
    w = {r["doc_id"]: r["toks"] for r in want.collect()}
    assert g == w and len(g) > 0
