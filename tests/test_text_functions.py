"""Unit tests for the text-analysis expression library (functions.text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from walmart_e_commerce_sales_data_pipeline_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    rolling_fingerprint,
    token_count,
    tokenize,
    word_shingles,
)


def test_tokenize_and_count(spark):
    df = spark.createDataFrame([("The Quick brown Fox",)], "text: string")
    row = df.select(
        tokenize("text").alias("t"), token_count("text").alias("n")
    ).first()
    assert row["t"] == ["the", "quick", "brown", "fox"]
    assert row["n"] == 4


def test_word_shingles_basic_and_short_doc(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text: string")
    rows = df.select(word_shingles(tokenize("text")).alias("s")).collect()
    assert rows[0]["s"] == ["a b c", "b c d"]
    assert rows[1]["s"] == []  # < n tokens → empty, not bogus windows


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("el gato que",), ("der hund und",), ("xyz qqq",)],
        "text: string",
    )
    langs = [r[0] for r in df.select(lang_id("text")).collect()]
    assert langs == ["en", "es", "de", "und"]


def test_quality_score_range(spark):
    df = spark.createDataFrame(
        [("word " * 200 + "word", 1005), ("the a of", 8)],
        "text: string, n_chars: long",
    )
    scores = [r[0] for r in df.select(quality_score(F.col("text"), F.col("n_chars"))).collect()]
    assert all(0.0 <= s <= 1.0 for s in scores)
    assert scores[0] > scores[1]  # long/dense doc beats stopword-only doc


def test_fingerprint_is_normalization_invariant(spark):
    df = spark.createDataFrame(
        [("Hello World", "hello world"), ("abc def", "abc xyz")],
        "a: string, b: string",
    )
    rows = df.select(
        (fingerprint("a") == fingerprint("b")).alias("same_md5"),
        (rolling_fingerprint("a") == rolling_fingerprint("b")).alias("same_roll"),
    ).collect()
    assert rows[0]["same_md5"] and rows[0]["same_roll"]  # case-normalized equal
    assert not rows[1]["same_md5"] and not rows[1]["same_roll"]


def test_bpe_token_count_known_strings(spark):
    from walmart_e_commerce_sales_data_pipeline_spark.functions.text import (
        bpe_token_count,
    )

    df = spark.createDataFrame(
        [("it's 42 tokens, right?",), ("hello world",), ("",)], "text string"
    )
    got = [r[0] for r in df.select(bpe_token_count("text")).collect()]
    # "it" "'s" " 42" " tokens" "," " right" "?"  /  "hello" " world"  /  ""
    assert got == [7, 2, 0]


def test_redact_pii_order_and_coverage(spark):
    """Redaction order matters: the email pass must run before the
    phone/IP passes (an address's digit runs must vanish with the
    address), and a redacted phone must not re-trigger the IP pattern.
    Crafted strings pin each case plus the no-PII identity."""
    from pyspark.sql import functions as F

    from walmart_e_commerce_sales_data_pipeline_spark.functions.text import (
        redact_pii,
    )

    cases = [
        # (input, expected)
        ("mail me at a.b-c_9@sub.example.org today",
         "mail me at <EMAIL> today"),
        ("call 555-0199-4321 now", "call <PHONE> now"),
        # standard NANP layouts (ADVICE r11: 3-4-4 alone leaked these)
        ("call 555-123-4567 now", "call <PHONE> now"),
        ("call (555) 123-4567 now", "call <PHONE> now"),
        ("call (555)123-4567 now", "call <PHONE> now"),
        ("call 555.123.4567 now", "call <PHONE> now"),
        ("call 555 123 4567 now", "call <PHONE> now"),
        # phone-before-ip ordering: adjacent dotted digits must not let
        # the IP pass break a dotted phone apart
        ("v2.5.555.123.4567 build", "v2.5.<PHONE> build"),
        ("host 192.168.1.254 down", "host <IP> down"),
        # an address containing dotted digit runs redacts as ONE email —
        # no <IP> shrapnel left behind
        ("contact 10.0.0.7@example.com please",
         "contact <EMAIL> please"),
        # phone and IP side by side: each pass hits its own target
        ("p 555-0100-4321 ip 10.0.3.7", "p <PHONE> ip <IP>"),
        # no PII: byte-identical passthrough
        ("plain text 1234 with no identifiers",
         "plain text 1234 with no identifiers"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "t: string")
    got = [r["r"] for r in df.select(redact_pii("t").alias("r")).collect()]
    assert got == [e for _, e in cases]
