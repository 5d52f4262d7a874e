"""Deterministic sampling / splitting queries over `documents`
(extended training-data surface): reproducible train/val/test
assignment and per-language stratified sampling, both derived from an
md5 content hash so the same row lands in the same bucket on every
engine, every run, at any parallelism (see operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.operators.sampling import (
    deterministic_split,
    frac_to_hex,
    stratified_sample,
)
from qaapi_spark.plans.catalog import query, t

_SPLITS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
_STRATA = {"en": 0.5, "es": 0.25, "fr": 0.25, "de": 0.1, "zh": 0.1}


def _bounds() -> list[str]:
    cum, out = 0.0, []
    for _, f in _SPLITS[:-1]:
        cum += f
        out.append(frac_to_hex(cum))
    return out


@query(
    "sample_split_train_val_test",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_bounds()[0]}' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_bounds()[1]}' THEN 'val'
                ELSE 'test' END AS split,
           lang
    FROM documents ORDER BY doc_id
    """,
    doc="deterministic 80/10/10 train/val/test assignment from an md5 "
    "hash prefix — map-only, reproducible across engines/runs/parallelism "
    "(extension: dataset splitting)",
)
def sample_split_train_val_test(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        deterministic_split(d, "doc_id", _SPLITS)
        .select("doc_id", "split", "lang")
        .orderBy("doc_id")
    )


def _strata_case() -> str:
    arms = " ".join(
        f"WHEN lang = '{s}' THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{frac_to_hex(f)}'"
        for s, f in sorted(_STRATA.items())
    )
    return f"CASE {arms} ELSE FALSE END"


@query(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT lang, COUNT(*) AS n_kept, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM documents WHERE {_strata_case()}
    GROUP BY lang ORDER BY lang
    """,
    doc="deterministic per-stratum (language) sampling at different "
    "rates — the reproducible sampleBy; filter pushes to the scan "
    "(extension: stratified sampling)",
)
def sample_stratified_by_lang(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        stratified_sample(d, "lang", _STRATA, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_kept"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang")
    )


@query(
    "sample_exact_k_per_source",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    )
    SELECT doc_id, source FROM ranked WHERE rn <= 3
    ORDER BY source, doc_id
    """,
    doc="exact-k deterministic per-group sample: portable md5 rank "
    "within each source, keep the first 3 — exact counts where the "
    "fraction sampler can only promise expectations; one group-keyed "
    "shuffle, running-rank window (extension: dataset sampling)",
)
def sample_exact_k_per_source(spark, sf_dir):
    from qaapi_spark.operators.sampling import exact_k_per_group

    d = t(spark, sf_dir, "documents")
    return (
        exact_k_per_group(d, "source", 3, "doc_id")
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@query(
    "sample_quality_weighted",
    oracle="""
    WITH words AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               len(list_distinct(w)) AS nd, len(w) AS n,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                    AS BIGINT) AS u24
        FROM words
    )
    SELECT doc_id, lang,
           ROUND(nd * 1.0 / n, 4) AS weight
    FROM scored
    WHERE u24 * n < nd * 16777216
    ORDER BY doc_id
    """,
    doc="deterministic importance sampling: accept doc iff its "
    "portable md5-uniform (24 hex bits) falls below its quality "
    "weight (lexical diversity nd/n) — acceptance compared as an "
    "INTEGER cross-product (u24 * n < nd * 2^24), so no float "
    "boundary can flip between engines; map-only, seed-free, "
    "rerun-stable — the curation move that upsamples high-quality "
    "documents without any global pass (extension: sampling family)",
)
def sample_quality_weighted(spark, sf_dir):
    from qaapi_spark.operators.textstats import ws_tokens

    d = t(spark, sf_dir, "documents")
    toks = ws_tokens(F.lower(F.col("text")))
    scored = d.select(
        "doc_id",
        "lang",
        F.size(F.array_distinct(toks)).alias("nd"),
        F.size(toks).alias("n"),
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
        )
        .cast("long")
        .alias("u24"),
    )
    return (
        scored.filter(
            F.col("u24") * F.col("n") < F.col("nd") * F.lit(1 << 24)
        )
        .select(
            "doc_id",
            "lang",
            F.round(F.col("nd") / F.col("n"), 4).alias("weight"),
        )
        .orderBy("doc_id")
    )


@query(
    "sample_negatives_hashed",
    # md5-derived candidate ids + integer attempt ranks => the whole
    # sample reproduces bit-for-bit in DuckDB (module hash recipe);
    # every aggregate/rank output column is CAST to BIGINT.
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n FROM documents),
    q AS (
        SELECT doc_id AS query_id, source AS qgrp
        FROM documents WHERE doc_id % 100 = 0
    ),
    probes AS (
        SELECT q.query_id, q.qgrp, j.j,
               CAST(('0x' || substr(md5('negs1:'
                   || CAST(q.query_id AS VARCHAR) || ':'
                   || CAST(j.j AS VARCHAR)), 1, 12)) AS BIGINT) % n.n AS cand_id
        FROM q
        CROSS JOIN (SELECT unnest(range(0, 16)) AS j) j
        CROSS JOIN n
    ),
    valid AS (
        SELECT p.query_id, p.cand_id AS neg_id, p.j
        FROM probes p JOIN documents d ON d.doc_id = p.cand_id
        WHERE p.cand_id <> p.query_id AND d.source <> p.qgrp
    ),
    dedup AS (
        SELECT query_id, neg_id, CAST(MIN(j) AS BIGINT) AS attempt
        FROM valid GROUP BY query_id, neg_id
    )
    SELECT query_id, neg_id, attempt, CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT query_id, neg_id, attempt,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY attempt, neg_id) AS rnk
        FROM dedup
    )
    WHERE rnk <= 4
    ORDER BY query_id, rank
    """,
    doc="deterministic negative sampling for contrastive pairs: k "
    "pseudo-random negatives per query doc, excluding self and the "
    "query's own source (false-negative rule); candidate ids are "
    "COMPUTED as md5int(seed, query, attempt) % n against the "
    "dense-id corpus — |stripe| x attempts probe rows broadcast onto "
    "the corpus projection, no query x corpus grid, corpus never "
    "shuffled (extension; the in-batch-negatives data-prep step of "
    "every dual-encoder training pipeline)",
)
def sample_negatives_hashed(spark, sf_dir):
    from qaapi_spark.operators.sampling import hash_negative_samples

    d = t(spark, sf_dir, "documents")
    return hash_negative_samples(d, k=4, attempts=16, query_mod=100).orderBy(
        "query_id", "rank"
    )


# A-ES keys: both engines draw the identical md5 uniform and round
# the exponential key to 6dp before ordering (id tiebreak) — the
# module's rounded-float ordering contract.  Shared by the batch
# sampler and its streaming twin (min-k merge is associative, so the
# stream's final state is the batch selection exactly).
_WRS_ORACLE = """
    WITH words AS (
        SELECT doc_id, lang,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, lang, len(w) AS n_tokens,
               ROUND(-ln((CAST(('0x' || substr(md5('wrs1:'
                       || CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT) + 1)
                     / 281474976710657.0) / len(w), 6) AS es_key
        FROM words WHERE len(w) > 0
    )
    SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, es_key,
           CAST(rnk AS BIGINT) AS rank
    FROM (
        SELECT lang, doc_id, n_tokens, es_key,
               ROW_NUMBER() OVER (PARTITION BY lang
                   ORDER BY es_key, doc_id) AS rnk
        FROM keyed
    ) WHERE rnk <= 5
    ORDER BY lang, rank
    """


@query(
    "sample_weighted_wor_per_lang",
    oracle=_WRS_ORACLE,
    doc="weighted sampling WITHOUT replacement, 5 docs per language, "
    "inclusion probability proportional to token count — the "
    "Efraimidis-Spirakis exponential-key one-pass scheme (key = "
    "-ln(u)/w from a deterministic md5 uniform, k smallest per group "
    "win); map-only keys + one WindowGroupLimit top-k shuffle, the "
    "distributed weighted sampler a mixture/curation pipeline uses "
    "where Bernoulli acceptance (sample_quality_weighted) can only "
    "promise expected counts (extension: sampling family; "
    "operators/sampling.weighted_sample_wor_per_group)",
)
def sample_weighted_wor_per_lang(spark, sf_dir):
    from qaapi_spark.operators.sampling import weighted_sample_wor_per_group
    from qaapi_spark.operators.textstats import ws_tokens

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(ws_tokens(F.lower(F.col("text")))).alias("n_tokens")
    )
    return (
        weighted_sample_wor_per_group(
            toks, "lang", 5, "n_tokens", id_col="doc_id", seed="wrs1"
        )
        .select(
            F.col("grp").alias("lang"),
            F.col("id").alias("doc_id"),
            F.col("weight").cast("long").alias("n_tokens"),
            "es_key",
            F.col("rank").cast("long").alias("rank"),
        )
        .orderBy("lang", "rank")
    )


@query(
    "stream_weighted_sample",
    oracle=_WRS_ORACLE,
    doc="the weighted-WOR sampler as a STREAM: documents arrive in "
    "micro-batches (3 id-range slices, one file per trigger) and each "
    "batch's A-ES keys merge into a k-smallest-keys-per-group store — "
    "min-k selection is associative+commutative, so the final state "
    "IS the batch sample and the stream hash-checks against the same "
    "oracle as sample_weighted_wor_per_lang; state stays groups x k "
    "rows however much data streams through (extension, SURVEY §2.9; "
    "streaming/incremental.stream_weighted_sample)",
)
def stream_weighted_sample_q(spark, sf_dir):
    from qaapi_spark.streaming.incremental import stream_weighted_sample

    return stream_weighted_sample(spark, f"{sf_dir}/documents.parquet", k=5).orderBy(
        "lang", "rank"
    )
