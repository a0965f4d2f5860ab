"""Text-analysis building blocks — all built-in Catalyst expressions.

No Python UDFs anywhere in this module: tokenization, shingling, language
ID, quality scoring, and fingerprinting are pure column expressions, so
they run JVM-side inside whole-stage codegen and scale to 100 TB without a
serialization boundary.

Tokenization contract: ``split(lower(text), ' ')`` — single-space word
splitting, chosen because it is reproducible bit-for-bit in any SQL engine
(the DuckDB oracles mirror it with ``string_split``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword markers per language for the heuristic language ID.  A real
# deployment would swap in a char-n-gram model (e.g. fastText) via a Pandas
# UDF; the heuristic keeps the pipeline dependency-free and oracle-checkable.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "les", "une", "est"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def tokenize(col: Column | str) -> Column:
    """Lowercase single-space word split (see module contract)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """n-word shingles as strings, 1-based windows over the token array.

    Guarded for short documents: Spark's ``sequence(1, 0)`` would *descend*
    ([1, 0]) rather than be empty, so documents with < n tokens explicitly
    yield an empty shingle array.
    """
    idx = F.when(
        F.size(tokens) >= n, F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    parts = lambda i: [F.element_at(tokens, i + j) for j in range(n)]  # noqa: E731
    return F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))


def stopword_ratio(tokens: Column) -> Column:
    """Fraction of tokens that are stopwords (double, deterministic)."""
    hits = F.size(F.filter(tokens, lambda t: t.isin(*STOPWORDS)))
    return hits / F.size(tokens)


def quality_score(text: Column | str, n_chars: Column | str) -> Column:
    """Heuristic document quality in [0, 1].

    0.4 · min(tokens/100, 1)  — enough content
    0.3 · (1 − stopword_ratio) — lexical density
    0.3 · min(chars/500, 1)   — raw length

    Pure double arithmetic in a fixed order so any SQL engine reproduces
    the exact bits.
    """
    toks = tokenize(text)
    nc = F.col(n_chars) if isinstance(n_chars, str) else n_chars
    return (
        F.least(F.size(toks) / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - stopword_ratio(toks)) * 0.3
        + F.least(nc / F.lit(500.0), F.lit(1.0)) * 0.3
    )


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    # NB: the lambda must take exactly one parameter — PySpark passes the
    # element index as a second positional arg to 2-param lambdas, so the
    # usual default-arg capture trick silently binds the index instead.
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id(text: Column | str) -> Column:
    """First-match stopword-marker language guess (deterministic priority
    en → es → de → fr, else 'und')."""
    toks = tokenize(text)
    guess: Column = F.lit("und")
    for lang in reversed(("en", "es", "de", "fr")):
        guess = F.when(_marker_hits(toks, LANG_MARKERS[lang]) > 0, F.lit(lang)).otherwise(guess)
    return guess


def fingerprint(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 over the canonical token join.

    md5 of UTF-8 is identical in every engine, making this the
    oracle-checkable fingerprint; ``rolling_fingerprint`` below is the
    cheap streaming-friendly variant.
    """
    return F.md5(F.concat_ws(" ", tokenize(text)))


def rolling_fingerprint(text: Column | str, mod: int = (1 << 31) - 1) -> Column:
    """Polynomial rolling hash over token hashes (Spark-only; xxhash64 has
    no cross-engine equivalent).  acc = (acc * 31 + h(tok)) mod p."""
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.pmod(F.xxhash64(t), F.lit(mod))) % F.lit(mod),
    )


# GPT-2-style pre-tokenizer pattern, restricted to ASCII classes and no
# lookahead so the Java (Spark) and RE2 (DuckDB oracle) regex dialects
# agree: contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, then residual whitespace runs.
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """Token count under a BPE-ish pre-tokenization (the unit that matters
    when budgeting a training corpus — whitespace counts undercount
    punctuation-heavy text).  Pure ``regexp_count`` expression; the actual
    merge-table lookup of a real BPE belongs in a dictionary join, not
    here."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PATTERN))


# ---------------------------------------------------------------------------
# PII redaction — the scrub stage every LLM-corpus pipeline runs before
# training.  Patterns are deliberately restricted to the regex subset Java
# (Spark) and RE2 (DuckDB) evaluate identically — no backreferences, no
# lookaround — so the DuckDB oracle can mirror the redaction exactly.
# ---------------------------------------------------------------------------

PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # Three alternatives, tried leftmost-first identically by Java and
    # RE2: (1) parenthesized NANP "(555) 123-4567" (paren included in the
    # match so no "(<PHONE>" shrapnel), (2) separator-delimited NANP
    # 555-123-4567 / 555.123.4567 / 555 123 4567, (3) the 3-4-4 layout
    # the synthetic corpus contact line uses.
    "phone": (
        r"\(\d{3}\)[-. ]?\d{3}[-. ]\d{4}\b"
        r"|\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
        r"|\b\d{3}-\d{4}-\d{4}\b",
        "<PHONE>",
    ),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its typed placeholder, applying the
    patterns in PII_PATTERNS order.  Two orderings carry semantics:
    email must run first (an address's digit runs must vanish with the
    address, not leak to the phone/IP passes), and phone must run before
    ipv4 (the IPv4 pattern needs four dotted octets, so a bare dotted
    phone is safe, but adjacent dotted digits — "v2.5.555.123.4567" —
    would let an IP-first pass consume "2.5.555.123" and break the
    phone apart).  The hyphen-only phone forms are fully independent of
    the IP pass — dots are required by the IPv4 pattern — so only those
    two edges are order-sensitive.  Pure chained ``regexp_replace`` —
    whole-stage codegen, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in PII_PATTERNS.values():
        c = F.regexp_replace(c, pattern, token)
    return c
