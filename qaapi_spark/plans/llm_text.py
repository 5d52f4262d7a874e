"""Text-analysis queries over the `documents` table (extended surface:
language-ID, quality scoring, token counting, fingerprinting).

All Spark-side expressions are built-in Catalyst functions; the DuckDB
oracles mirror the exact same arithmetic so value hashes match.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.operators.textstats import (
    LANG_MARKERS,
    TOKEN_RE,
    fingerprint,
    predicted_lang,
    quality_features,
    token_counts,
)
from qaapi_spark.plans.catalog import query, t

# DuckDB fragment: whitespace tokens of lowercased text (empty-safe).
_DD_TOKS = "CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(lower(text)), '\\s+') END"
_DD_TOKS_RAW = "CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[]) ELSE string_split_regex(trim(text), '\\s+') END"


def _dd_marker_count(markers: list[str]) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_DD_TOKS}, w -> w IN ({lst})))"


def _dd_lang_case() -> str:
    langs = list(LANG_MARKERS)
    whens = []
    for lang in langs[:-1]:
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in langs if other != lang
        )
        whens.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(whens) + f" ELSE '{langs[-1]}' END"


@query(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           len({_DD_TOKS_RAW}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_re_tokens
    FROM documents ORDER BY doc_id
    """,
    doc="token counting: whitespace + BPE-ish regex tokenizer (extension)",
)
def text_token_counts(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return token_counts(d).select("doc_id", "n_ws_tokens", "n_re_tokens").orderBy("doc_id")


@query(
    "text_quality_features",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars_q,
           len({_DD_TOKS}) AS n_tokens,
           ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / GREATEST(length(text), 1), 4) AS alpha_ratio,
           ROUND(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) * 1.0 / GREATEST(length(text), 1), 4) AS punct_ratio,
           ROUND({_dd_marker_count(LANG_MARKERS["en"])} * 1.0 / GREATEST(len({_DD_TOKS}), 1), 4) AS stopword_ratio
    FROM documents ORDER BY doc_id
    """,
    doc="quality scoring: length/alpha/punct/stopword ratios (extension)",
)
def text_quality_features(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_features(d).select(
        "doc_id", "n_chars_q", "n_tokens", "alpha_ratio", "punct_ratio", "stopword_ratio"
    ).orderBy("doc_id")


def _lang_score_sql() -> str:
    return ", ".join(
        f"{_dd_marker_count(m)} AS s_{lang}" for lang, m in LANG_MARKERS.items()
    )


@query(
    "text_lang_id_confusion",
    oracle=f"""
    WITH scored AS (
        SELECT lang, {_lang_score_sql()} FROM documents
    )
    SELECT lang, {_dd_lang_case()} AS pred_lang, COUNT(*) AS n
    FROM scored GROUP BY lang, pred_lang ORDER BY lang, pred_lang
    """,
    doc="language-ID heuristic (marker-word argmax) vs labeled lang (extension)",
)
def text_lang_id_confusion(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.withColumn("pred_lang", predicted_lang(F.col("text")))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "pred_lang")
    )


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform({_DD_TOKS_RAW},
                                           w -> CAST(length(w) + ascii(w) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
    FROM documents ORDER BY doc_id
    """,
    doc="document fingerprinting: rolling polynomial hash over tokens (extension)",
)
def text_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint(F.col("text")).alias("fp")).orderBy("doc_id")
