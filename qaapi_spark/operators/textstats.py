"""Text-analysis operators for training-data pipelines.

All hot-path expressions are built-in Catalyst functions (JVM-side,
whole-stage codegen) — no Python UDFs: at 100 TB these run inside the
parquet scan stage with no extra shuffle.

Operators: tokenization/token counting, quality scoring, language-ID
heuristic, rolling-hash document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish word/number/punct tokenizer (portable regex: same semantics in
# Spark's Java regex and DuckDB's RE2 for these classes).
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Deterministic marker-word lists for the language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["de", "shi", "le", "zai", "he"],
}

_FP_MOD = 1_000_000_007
_FP_BASE = 31


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (empty input -> empty array)."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, "\\s+")
    )


def regex_tokens(text: Column) -> Column:
    """BPE-ish tokenization: letter runs, digit runs, single punct."""
    return F.regexp_extract_all(text, F.lit(f"({TOKEN_RE})"), F.lit(1))


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    c = F.col(text_col)
    return df.withColumn("n_ws_tokens", F.size(ws_tokens(c))).withColumn(
        "n_re_tokens", F.size(regex_tokens(c))
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / alpha-ratio / punctuation-ratio / stopword-ratio features.

    Ratios are rounded to 4 decimals so differential oracles hash-match.
    """
    c = F.col(text_col)
    n = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(c, "[^.!?,;:]", ""))
    toks = ws_tokens(F.lower(c))
    stop = F.size(F.filter(toks, lambda w: w.isin(*LANG_MARKERS["en"])))
    return (
        df.withColumn("n_chars_q", n)
        .withColumn("n_tokens", F.size(toks))
        .withColumn("alpha_ratio", F.round(alpha / F.greatest(n, F.lit(1)), 4))
        .withColumn("punct_ratio", F.round(punct / F.greatest(n, F.lit(1)), 4))
        .withColumn(
            "stopword_ratio",
            F.round(stop / F.greatest(F.size(toks), F.lit(1)), 4),
        )
    )


def word_ngrams(text: Column, n: int = 2) -> Column:
    """Positional (non-distinct) n-grams over lowercase ws tokens —
    the counting variant behind repetition metrics (Gopher-style
    quality signals need every occurrence, not the set)."""
    toks = ws_tokens(F.lower(text))
    if n == 1:
        return toks
    acc = toks
    for k in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(toks, k + 1, F.size(toks)),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.filter(acc, lambda x: x.isNotNull())


# Portable patterns (same semantics in Java regex and DuckDB RE2).
REDACT_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "number": "[0-9]+",
}


def redact(text: Column, pattern: str, token: str) -> tuple[Column, Column]:
    """(redacted_text, n_matches): replace every match with ``token``.

    Map-only regexp work inside codegen — the PII-scrub shape for
    training corpora (emails, phone numbers, numeric ids)."""
    n = F.size(F.regexp_extract_all(text, F.lit(f"({pattern})"), F.lit(1)))
    return F.regexp_replace(text, pattern, token), n


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language over lowercase ws tokens."""
    toks = ws_tokens(F.lower(text))

    def has_marker(markers):
        # arity-1 closure: a 2-arg lambda would make Spark pass the
        # element index as the second argument
        return lambda w: w.isin(*markers)

    return {
        lang: F.size(F.filter(toks, has_marker(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(text: Column) -> Column:
    """Deterministic argmax with fixed priority order (en,es,fr,de,zh).

    A >=-chain mirrors trivially into portable SQL CASE expressions.
    """
    s = lang_scores(text)
    langs = list(LANG_MARKERS)
    expr = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = s[lang] >= s[other]
            cond = c if cond is None else (cond & c)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over ws tokens (doc fingerprint).

    fp = fold(tokens, acc -> (acc*31 + (len(tok) + ascii(tok[0]))) % p.
    Sequential fold => identical result in any engine with the same
    token order; stays in codegen (no UDF).
    """
    toks = ws_tokens(text)
    tok_num = lambda w: (F.length(w) + F.ascii(w)).cast("long")  # noqa: E731
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: (acc * _FP_BASE + tok_num(w)) % _FP_MOD,
    )
