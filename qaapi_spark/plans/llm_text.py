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
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
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


_SPAN_K = 10  # tokens per non-overlapping span
_BOILER_DF = 3  # a span in >= this many distinct docs is boilerplate

# DuckDB fragment: (doc_id, span_key, span_len) — non-overlapping
# _SPAN_K-token spans of the lowercased token stream (flat corpora have
# no line breaks, so fixed token windows are the span unit, as in
# span-level training-data dedup).  Trailing short spans are kept
# (list_slice clips).  Spans shuffle as 60-bit md5 keys, never as
# strings: at 100 TB the aggregate/join key is 8 bytes instead of a
# ~60-char span, and the engine-portable hash family keeps the oracle
# exact (collision odds ~2^-60, identical on both sides either way).
_DD_SPANS = f"""
    spans AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5(array_to_string(
                   list_slice({_DD_TOKS}, i * {_SPAN_K} + 1,
                              i * {_SPAN_K} + {_SPAN_K}), ' ')), 1, 15)) AS BIGINT) AS span_key,
               len(list_slice({_DD_TOKS}, i * {_SPAN_K} + 1,
                              i * {_SPAN_K} + {_SPAN_K})) AS span_len
        FROM (
            SELECT doc_id, text,
                   unnest(range(0, CAST(CEIL(len({_DD_TOKS}) / {_SPAN_K}.0) AS INT))) AS i
            FROM documents
        )
    ),
    span_df AS (
        SELECT span_key, COUNT(DISTINCT doc_id) AS sdf
        FROM spans GROUP BY span_key
    )
"""


def _spark_spans(d):
    """(doc_id, span_key, span_len): the Spark mirror of _DD_SPANS."""
    from qaapi_spark.operators.textstats import ws_tokens

    toks = ws_tokens(F.lower(F.col("text")))

    def span_struct(i):
        sl = F.slice(toks, i * _SPAN_K + 1, F.lit(_SPAN_K))
        key = (
            F.conv(F.substring(F.md5(F.concat_ws(" ", sl)), 1, 15), 16, 10)
            .cast("long")
            .alias("span_key")
        )
        return F.struct(key, F.size(sl).alias("span_len"))

    empty = F.array().cast("array<struct<span_key:bigint,span_len:int>>")
    # empty docs -> no spans (guarded: sequence(0, -1) would descend)
    spans = F.when(F.size(toks) == 0, empty).otherwise(
        F.transform(
            F.sequence(
                F.lit(0),
                F.ceil(F.size(toks) / F.lit(float(_SPAN_K))).cast("int") - 1,
            ),
            span_struct,
        )
    )
    return d.select("doc_id", F.explode(spans).alias("s")).select(
        "doc_id",
        F.col("s.span_key").alias("span_key"),
        F.col("s.span_len").alias("span_len"),
    )


def _shared_spans(spark, sf_dir):
    """Memoized materialized spans + span_df per (application, sf_dir):
    both span queries consume the same two relations (same sharing
    contract as cc_jaccard_labels / the BPE merge table).  Stored as
    two separate shared-kernel entries so the harness's bulk release
    can unpersist each."""
    from qaapi_spark.session import shared_kernel

    s = shared_kernel(
        spark,
        ("doc_spans", sf_dir, _SPAN_K),
        lambda: _spark_spans(t(spark, sf_dir, "documents")).persist(),
    )
    sdf = shared_kernel(
        spark,
        ("doc_span_df", sf_dir, _SPAN_K),
        lambda: s.groupBy("span_key")
        .agg(F.count_distinct("doc_id").alias("sdf"))
        .persist(),
    )
    return s, sdf


@query(
    "dedup_spans_exact",
    oracle=f"""
    WITH {_DD_SPANS},
    stats AS (
        SELECT s.doc_id,
               COUNT(*) AS n_spans,
               SUM(CASE WHEN d.sdf >= 2 THEN 1 ELSE 0 END) AS n_dup_spans
        FROM spans s JOIN span_df d USING (span_key)
        GROUP BY s.doc_id
    )
    SELECT doc_id,
           COALESCE(n_spans, 0) AS n_spans,
           CAST(COALESCE(n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           ROUND(CASE WHEN COALESCE(n_spans, 0) = 0 THEN 0.0
                      ELSE COALESCE(n_dup_spans, 0) / n_spans END, 4) AS dup_ratio
    FROM documents LEFT JOIN stats USING (doc_id)
    ORDER BY doc_id
    """,
    doc="span-level exact dedup signal (Lee et al. 2022, 'Deduplicating "
    "Training Data Makes Language Models Better' — public): docs split "
    "into non-overlapping 10-token spans, span df counted corpus-wide, "
    "per-doc duplicated-span ratio = the drop/trim signal; one "
    "span-hash aggregate + a broadcast-ready span_df join (extension)",
)
def dedup_spans_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    s, sdf = _shared_spans(spark, sf_dir)
    stats = (
        s.join(sdf, "span_key")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(F.when(F.col("sdf") >= 2, 1).otherwise(0)).alias("n_dup_spans"),
        )
    )
    return (
        d.select("doc_id")
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.round(
                F.when(F.coalesce("n_spans", F.lit(0)) == 0, F.lit(0.0)).otherwise(
                    F.col("n_dup_spans") / F.col("n_spans")
                ),
                4,
            ).alias("dup_ratio"),
        )
        .orderBy("doc_id")
    )


@query(
    "text_boilerplate_filter",
    oracle=f"""
    WITH {_DD_SPANS},
    kept AS (
        SELECT s.doc_id,
               SUM(s.span_len) AS n_tokens,
               SUM(CASE WHEN d.sdf < {_BOILER_DF} THEN s.span_len
                        ELSE 0 END) AS n_kept_tokens,
               SUM(CASE WHEN d.sdf >= {_BOILER_DF} THEN 1 ELSE 0 END) AS n_boiler_spans
        FROM spans s JOIN span_df d USING (span_key)
        GROUP BY s.doc_id
    )
    SELECT doc_id,
           CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(n_kept_tokens, 0) AS BIGINT) AS n_kept_tokens,
           CAST(COALESCE(n_boiler_spans, 0) AS BIGINT) AS n_boiler_spans
    FROM documents LEFT JOIN kept USING (doc_id)
    ORDER BY doc_id
    """,
    doc="C4-style boilerplate removal signal: spans repeated across >= 3 "
    "distinct docs are boilerplate; per-doc kept-token counts after "
    "dropping them (the filter a cleaning pipeline applies before "
    "training); same span_df relation as dedup_spans_exact (extension)",
)
def text_boilerplate_filter(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    s, sdf = _shared_spans(spark, sf_dir)
    span_len = F.col("span_len")
    kept = (
        s.join(sdf, "span_key")
        .groupBy("doc_id")
        .agg(
            F.sum(span_len).alias("n_tokens"),
            F.sum(
                F.when(F.col("sdf") < _BOILER_DF, span_len).otherwise(F.lit(0))
            ).alias("n_kept_tokens"),
            F.sum(F.when(F.col("sdf") >= _BOILER_DF, 1).otherwise(0)).alias(
                "n_boiler_spans"
            ),
        )
    )
    return (
        d.select("doc_id")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_kept_tokens", F.lit(0)).alias("n_kept_tokens"),
            F.coalesce("n_boiler_spans", F.lit(0)).alias("n_boiler_spans"),
        )
        .orderBy("doc_id")
    )


_BPE_MERGES = 8
_BPE_MEMO: dict = {}


def _bpe_merges(spark, sf_dir):
    """Memoized merge table per (application, sf_dir): both BPE queries
    derive from it, so the iterative training runs once per session
    (same sharing contract as cc_jaccard_labels)."""
    from qaapi_spark.operators.bpe import bpe_train

    key = (spark.sparkContext.applicationId, sf_dir, _BPE_MERGES)
    m = _BPE_MEMO.get(key)
    if m is None:
        d = t(spark, sf_dir, "documents")
        m = _BPE_MEMO[key] = bpe_train(d, n_merges=_BPE_MERGES)
    return m


def _bpe_ctes(n_merges: int) -> tuple[str, str, str]:
    """(WITH-clause body, merges-union SQL, final-vocab name): the BPE
    trainer unrolled as chained CTEs — the `_kmeans_ctes` trick applied
    to an argmax-per-round algorithm.

    Word state is a symbol string where EVERY symbol owns its own
    leading and trailing space — ``' c1  c2 … </w> '`` (two spaces
    between adjacent symbols).  One merge pass is then a single
    left-to-right non-overlapping ``replace(' l  r ', ' lr ')``:
    because adjacent matches share no characters, the replace scan
    merges every eligible site per pass — exactly the trainer's
    left-greedy array fold (a merged symbol ``l||r`` can never
    re-match as ``l`` within the pass, and the scan resumes after each
    replacement without rescanning emitted text).  The earlier
    single-space form ``replace(' l r ', ' lr ')`` was NOT equivalent:
    adjacent sites share the delimiter space, so ``banana`` under
    merge ``(a,n)`` gave ``[b,an,a,n,a]`` instead of the fold's
    ``[b,an,an,a]`` (round-6 fix; verified against the fold on
    banana/aaaa/aaaaa-style corpora in tests/test_bpe.py).  Pair counts explode each word's
    adjacent symbol pairs weighted by word count; the per-round argmax
    is ``ORDER BY pcnt DESC, l, r LIMIT 1`` — the trainer's exact
    tie-break.  ``min_pair_count``/``max_train_words`` never bind on
    the fixture corpora (top pair counts are orders of magnitude above
    2; the vocabulary is far below the cap) — the empirical 3-SF
    check_oracle sweep is the guard."""
    sql = f"""wc AS MATERIALIZED (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({_DD_TOKS}) AS word FROM documents)
        GROUP BY word
    ),
    v0 AS MATERIALIZED (
        SELECT word, cnt,
               regexp_replace(word, '(.)', ' \\1 ', 'g') || ' </w> ' AS st
        FROM wc
    )"""
    prev = "v0"
    for i in range(1, n_merges + 1):
        sql += f""",
    p{i} AS (
        SELECT pr.l AS l, pr.r AS r, CAST(SUM(cnt) AS BIGINT) AS pcnt
        FROM (
            SELECT cnt,
                   unnest(list_transform(range(1, len(syms)),
                          j -> {{'l': syms[j], 'r': syms[j + 1]}})) AS pr
            FROM (SELECT cnt, string_split(trim(st), '  ') AS syms FROM {prev})
        ) GROUP BY pr.l, pr.r
    ),
    m{i} AS MATERIALIZED (
        SELECT {i - 1} AS rank, l, r, pcnt FROM p{i}
        ORDER BY pcnt DESC, l, r LIMIT 1
    ),
    v{i} AS MATERIALIZED (
        SELECT word, cnt,
               replace(st, ' ' || m.l || '  ' || m.r || ' ',
                           ' ' || m.l || m.r || ' ') AS st
        FROM {prev} CROSS JOIN m{i} m
    )"""
        prev = f"v{i}"
    union = " UNION ALL ".join(
        f"SELECT * FROM m{i}" for i in range(1, n_merges + 1)
    )
    return sql, union, prev


def _bpe_train_oracle(n_merges: int) -> str:
    body, union, _ = _bpe_ctes(n_merges)
    return f"""
    WITH {body}
    SELECT CAST(rank AS INT) AS rank, l AS "left", r AS "right",
           CAST(pcnt AS BIGINT) AS pair_count
    FROM ({union}) ORDER BY rank
    """


def _bpe_counts_oracle(n_merges: int) -> str:
    body, _, last = _bpe_ctes(n_merges)
    return f"""
    WITH {body},
    fin AS MATERIALIZED (
        SELECT word, len(string_split(trim(st), '  ')) AS ntok FROM {last}
    ),
    docw AS (SELECT doc_id, unnest({_DD_TOKS}) AS word FROM documents),
    per_doc AS (
        SELECT d.doc_id, SUM(f.ntok) AS tot
        FROM docw d JOIN fin f USING (word) GROUP BY d.doc_id
    )
    SELECT doc.doc_id AS id,
           CAST(COALESCE(p.tot, 0) AS BIGINT) AS n_tokens_bpe
    FROM documents doc LEFT JOIN per_doc p USING (doc_id)
    ORDER BY id
    """


@query(
    "bpe_train_merges",
    # Upgraded rows-only -> exact oracle (r5): with the merge count
    # bounded (8), the argmax-per-round trainer unrolls into chained
    # CTEs exactly like the Lloyd oracle — see `_bpe_ctes` for why the
    # space-separated-string replace reproduces the left-greedy fold.
    # The python reference trainer in tests/test_bpe.py remains the
    # semantic pin for the general (unbounded) operator.
    oracle=_bpe_train_oracle(_BPE_MERGES),
    doc="BPE merge-table training (Sennrich et al. 2016): one corpus "
    "pass to word counts, then vocab-sized pair aggregates + bounded "
    "argmax per round; deterministic tie-breaks; hash-checked against "
    "an unrolled SQL trainer (extension: tokenizer training, "
    "iterative algorithm)",
)
def bpe_train_merges(spark, sf_dir):
    return spark.createDataFrame(
        _bpe_merges(spark, sf_dir),
        "rank int, left string, right string, pair_count long",
    ).orderBy("rank")


@query(
    "bpe_token_counts",
    # Upgraded rows-only -> exact oracle (r5): rank-priority apply
    # (segment_word) equals sequential rank-order merge passes for a
    # TRAINED table — a rank-k merge's operands are produced only by
    # merges < k, which the priority loop exhausts first — so the
    # final unrolled vocabulary state IS the segmentation.
    oracle=_bpe_counts_oracle(_BPE_MERGES),
    doc="BPE segmentation apply: learned merge table broadcasts, docs "
    "stream through an Arrow kernel map-only with per-word "
    "memoization — the production tokenizer-apply shape; per-doc "
    "token counts hash-check against the unrolled SQL vocabulary "
    "(extension)",
)
def bpe_token_counts(spark, sf_dir):
    from qaapi_spark.operators.bpe import bpe_segment

    d = t(spark, sf_dir, "documents")
    return bpe_segment(d, _bpe_merges(spark, sf_dir)).orderBy("id")


_GOPHER_MARKERS = "['the', 'a', 'of', 'and', 'to']"


@query(
    "text_gopher_rules_filter",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_DD_TOKS} AS toks FROM documents),
    m AS (
        SELECT doc_id,
               (SELECT MAX(c) FROM (
                    SELECT COUNT(*) AS c FROM UNNEST(toks) AS t(tok)
                    GROUP BY tok)) AS maxc
        FROM w
    ),
    s AS (
        SELECT w.doc_id AS doc_id, len(toks) AS n,
               len(list_distinct(toks)) AS nd,
               len(list_intersect(toks, {_GOPHER_MARKERS})) AS sw,
               m.maxc AS maxc
        FROM w JOIN m ON w.doc_id = m.doc_id
    )
    SELECT doc_id,
           (n >= 25 AND n <= 5000) AS r_length,
           (3*nd >= n) AS r_diversity,
           (8*maxc <= n) AS r_repetition,
           (sw >= 1) AS r_stopwords,
           (n >= 25 AND n <= 5000 AND 3*nd >= n AND 8*maxc <= n
            AND sw >= 1) AS kept
    FROM s ORDER BY doc_id
    """,
    doc="Gopher-style composite quality rules (Rae et al. 2021, "
    "public): word-count window, lexical diversity >= 1/3, max "
    "single-word share <= 1/8, stopword presence — every rule "
    "compares INTEGER cross-products (3*nd >= n), never float "
    "ratios, so boundary docs cannot flip between engines; one "
    "token explode + two-level aggregate, map-side combining "
    "(extension: quality filtering)",
)
def text_gopher_rules_filter(spark, sf_dir):
    from qaapi_spark.operators.textstats import ws_tokens

    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = ws_tokens(F.lower(F.col("text")))
    markers = F.array(*[F.lit(w) for w in ("the", "a", "of", "and", "to")])
    base = d.select(
        "doc_id",
        F.size(toks).alias("n"),
        F.size(F.array_distinct(toks)).alias("nd"),
        F.size(F.array_intersect(toks, markers)).alias("sw"),
        toks.alias("toks"),
    )
    maxc = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("maxc"))
    )
    r_len = (F.col("n") >= 25) & (F.col("n") <= 5000)
    r_div = 3 * F.col("nd") >= F.col("n")
    r_rep = 8 * F.col("maxc") <= F.col("n")
    r_sw = F.col("sw") >= 1
    return (
        base.join(maxc, "doc_id")
        .select(
            "doc_id",
            r_len.alias("r_length"),
            r_div.alias("r_diversity"),
            r_rep.alias("r_repetition"),
            r_sw.alias("r_stopwords"),
            (r_len & r_div & r_rep & r_sw).alias("kept"),
        )
        .orderBy("doc_id")
    )


_BATCH_DOCS = 8


@query(
    "pack_length_bucketed_batches",
    # bucket cap = next power of two >= n_tokens, computed with
    # INTEGER bit ops on both engines (length of the binary string of
    # n-1) — a float log2 would misbucket exact powers of two.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len({_DD_TOKS}) AS n FROM documents
    ),
    bucketed AS (
        SELECT doc_id, n,
               CASE WHEN n <= 1 THEN 1
                    ELSE (1::BIGINT << length(bin(n - 1)::VARCHAR)) END AS cap
        FROM toks WHERE n > 0
    ),
    batched AS (
        SELECT cap, n,
               CAST(FLOOR((ROW_NUMBER() OVER (PARTITION BY cap ORDER BY doc_id)
                           - 1) / {_BATCH_DOCS}) AS BIGINT) AS batch_id
        FROM bucketed
    )
    SELECT cap AS bucket_cap, batch_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS batch_tokens,
           CAST(MAX(n) AS BIGINT) AS batch_max,
           CAST(COUNT(*) * MAX(n) - SUM(n) AS BIGINT) AS pad_waste
    FROM batched GROUP BY bucket_cap, batch_id
    ORDER BY bucket_cap, batch_id
    """,
    doc="length-bucketed batch formation: docs grouped into power-of-2 "
    "token-length buckets (integer bit ops — no float log2 boundary), "
    "fixed-size batches formed per bucket in deterministic doc order, "
    "with per-batch padding waste (docs x batch-max minus real "
    "tokens) — the dynamic-batching data-prep step that minimizes pad "
    "tokens per training batch; one window shuffle keyed on the "
    "bucket + a grouped rollup (extension: training batch formation)",
)
def pack_length_bucketed_batches(spark, sf_dir):
    from pyspark.sql import Window

    from qaapi_spark.operators.textstats import ws_tokens

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(ws_tokens(F.lower(F.col("text")))).alias("n")
    ).filter(F.col("n") > 0)
    # shiftleft needs a column shift amount -> SQL expr (the python
    # wrapper only takes a literal bit count)
    cap = F.expr(
        "CASE WHEN n <= 1 THEN CAST(1 AS BIGINT) "
        "ELSE shiftleft(CAST(1 AS BIGINT), length(bin(n - 1))) END"
    )
    b = d.select("doc_id", "n", cap.alias("cap"))
    rn = F.row_number().over(Window.partitionBy("cap").orderBy("doc_id"))
    batched = b.withColumn(
        "batch_id", F.floor((rn - 1) / _BATCH_DOCS).cast("long")
    )
    return (
        batched.groupBy(F.col("cap").alias("bucket_cap"), "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("batch_tokens"),
            F.max("n").alias("batch_max"),
            (F.count("*") * F.max("n") - F.sum("n")).alias("pad_waste"),
        )
        .orderBy("bucket_cap", "batch_id")
    )
