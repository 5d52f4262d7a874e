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


@query(
    "text_repetition_quality",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_DD_TOKS} AS w FROM documents
    ),
    big AS (
        SELECT doc_id,
               unnest(CASE WHEN len(w) >= 2
                   THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
                   ELSE CAST([] AS VARCHAR[]) END) AS bg
        FROM toks
    ),
    bgc AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg),
    agg AS (SELECT doc_id, MAX(c) AS maxc, SUM(c) AS sumc FROM bgc GROUP BY doc_id)
    SELECT t.doc_id,
           len(w) AS n_tokens,
           ROUND(len(list_distinct(w)) * 1.0 / GREATEST(len(w), 1), 4) AS distinct_ratio,
           ROUND(COALESCE(maxc * 1.0 / sumc, 0.0), 4) AS top_bigram_frac
    FROM toks t LEFT JOIN agg ON t.doc_id = agg.doc_id
    ORDER BY t.doc_id
    """,
    doc="Gopher-style repetition quality signals: distinct-token ratio + "
    "fraction of bigram occurrences taken by the most frequent bigram "
    "(extension: repetition filtering for training corpora)",
)
def text_repetition_quality(spark, sf_dir):
    from qaapi_spark.operators.textstats import word_ngrams, ws_tokens

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = ws_tokens(F.lower(F.col("text")))
    base = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 4
        ).alias("distinct_ratio"),
        word_ngrams(F.col("text"), 2).alias("bigrams"),
    )
    # per-doc mode of bigrams: explode -> count per (doc, bigram) ->
    # max/sum per doc.  Both aggregations combine map-side; shuffle
    # volume is distinct-bigram cardinality, not token count.
    bgc = (
        base.select("doc_id", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("maxc"), F.sum("c").alias("sumc"))
    )
    return (
        base.drop("bigrams")
        .join(bgc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "distinct_ratio",
            F.round(F.coalesce(F.col("maxc") / F.col("sumc"), F.lit(0.0)), 4).alias(
                "top_bigram_frac"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "text_redact_numbers",
    oracle="""
    SELECT event_id,
           len(regexp_extract_all(props, '([0-9]+)', 1)) AS n_numbers,
           regexp_replace(props, '[0-9]+', '<NUM>', 'g') AS redacted
    FROM events ORDER BY event_id
    """,
    doc="PII-style scrubbing: count + redact numeric runs in a string "
    "column (regexp map-only, codegen; the email/phone patterns in "
    "operators/textstats.REDACT_PATTERNS share this shape) "
    "(extension: PII redaction)",
)
def text_redact_numbers(spark, sf_dir):
    from qaapi_spark.operators.textstats import redact

    e = t(spark, sf_dir, "events").select("event_id", "props")
    red, n = redact(F.col("props"), "[0-9]+", "<NUM>")
    return e.select(
        "event_id", n.alias("n_numbers"), red.alias("redacted")
    ).orderBy("event_id")


_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150  # 50-char overlap


@query(
    "text_chunk_overlapping",
    oracle=f"""
    SELECT doc_id,
           CAST((start - 1) / {_CHUNK_STRIDE} AS INT) AS chunk_id,
           substr(text, start, {_CHUNK_SIZE}) AS chunk
    FROM (
        SELECT doc_id, text,
               unnest(range(1, GREATEST(len(text), 1) + 1, {_CHUNK_STRIDE})) AS start
        FROM documents
    )
    ORDER BY doc_id, chunk_id
    """,
    doc="document chunking into 200-char windows with 50-char overlap "
    "(context-window preprocessing): sequence + transform + posexplode, "
    "all codegen, no shuffle — output rows ∝ chars/stride "
    "(extension: chunking)",
)
def text_chunk_overlapping(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_CHUNK_STRIDE)
    )
    return (
        d.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    starts, lambda s: F.substring(F.col("text"), s, _CHUNK_SIZE)
                )
            ).alias("pos", "chunk"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("chunk_id"),
            "chunk",
        )
        .orderBy("doc_id", "chunk_id")
    )


_PACK_BUDGET = 2048


@query(
    "pack_sequences_by_lang",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, len({_DD_TOKS}) AS n_tokens FROM documents
    ),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM toks
    )
    SELECT lang, CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_BUDGET}) AS BIGINT) AS bin,
           COUNT(*) AS n_docs, SUM(n_tokens) AS bin_tokens
    FROM cum GROUP BY lang, bin ORDER BY lang, bin
    """,
    doc="sequence packing: fill fixed 2048-token training bins per "
    "language by cumulative token count in deterministic doc order — "
    "one window shuffle keyed on lang, then a grouped rollup of bin "
    "occupancy (extension: sequence packing for LLM training)",
)
def pack_sequences_by_lang(spark, sf_dir):
    from qaapi_spark.operators.textstats import ws_tokens
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(ws_tokens(F.lower(F.col("text")))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    bin_col = F.floor((F.col("cum_tokens") - F.col("n_tokens")) / _PACK_BUDGET).cast(
        "long"
    )
    return (
        cum.select("lang", bin_col.alias("bin"), "n_tokens")
        .groupBy("lang", "bin")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("bin_tokens"))
        .orderBy("lang", "bin")
    )


@query(
    "text_filter_below_p10_length",
    oracle="""
    WITH q AS (
        SELECT lang, quantile_cont(n_chars, 0.1) AS p10
        FROM documents GROUP BY lang
    )
    SELECT doc_id, d.lang, n_chars, ROUND(p10, 4) AS lang_p10
    FROM documents d JOIN q ON d.lang = q.lang
    WHERE n_chars < p10
    ORDER BY doc_id
    """,
    doc="percentile-based quality filter: drop docs shorter than their "
    "language's p10 length — grouped exact percentile (one shuffle on "
    "lang) broadcast back over the corpus; at 100 TB swap "
    "percentile_approx into the stats pass, the plan shape is identical "
    "(extension: quality filtering)",
)
def text_filter_below_p10_length(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    q = d.groupBy("lang").agg(F.percentile("n_chars", F.lit(0.1)).alias("p10"))
    return (
        d.join(F.broadcast(q), "lang")
        .filter(F.col("n_chars") < F.col("p10"))
        .select("doc_id", "lang", "n_chars", F.round("p10", 4).alias("lang_p10"))
        .orderBy("doc_id")
    )
