"""Corpus-curation queries: benchmark decontamination, reproducible
training order, and source-mixture weighting over the documents table
(extension: the curation steps between "deduplicated corpus" and
"training shards"; SURVEY §7.2 step 7 north star).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from qaapi_spark.operators.curation import (
    benchmark_contamination,
    bigram_lm_nll,
    source_mixture_weights,
    training_order,
)
from qaapi_spark.plans.catalog import query, t
from qaapi_spark.plans.llm_text import _DD_TOKS, _DD_TOKS_RAW

# Guarded tokenizer (ADVICE r9 #1): DuckDB's string_split_regex('') is
# [''] — one phantom token — while the Spark side's ws_tokens yields an
# empty array for empty/whitespace-only docs.  Every oracle in this
# module tokenizes through the same empty->[] CASE the Spark kernels
# use, so parity holds even when a corpus contains empty documents
# (the flagged site was the DSIR bucket model, where a phantom token
# would shift bucket counts AND totals).
_DD_WORDS = _DD_TOKS
_NGRAM_N = 5
_EVAL_MOD = 17
_MIN_OVERLAP = 3

# DuckDB distinct word-5-gram set of `w` (same spec as word_shingles).
_DD_5GRAMS = (
    "list_distinct(CASE WHEN len(w) >= 5 THEN "
    "list_transform(range(1, len(w) - 3), i -> "
    "w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]) "
    "ELSE CAST([] AS VARCHAR[]) END)"
)


@query(
    "curation_benchmark_contamination",
    oracle=f"""
    WITH docs AS (SELECT doc_id, {_DD_WORDS} AS w FROM documents),
    sets AS (SELECT doc_id, {_DD_5GRAMS} AS sh FROM docs),
    ev AS (
        SELECT doc_id AS eval_id, len(sh) AS eval_size, unnest(sh) AS g
        FROM sets WHERE doc_id % {_EVAL_MOD} = 0
    ),
    corpus AS (SELECT doc_id, unnest(sh) AS g FROM sets),
    hits AS (
        SELECT c.doc_id, ev.eval_id, ev.eval_size, COUNT(*) AS n_overlap
        FROM corpus c JOIN ev ON c.g = ev.g AND c.doc_id <> ev.eval_id
        GROUP BY c.doc_id, ev.eval_id, ev.eval_size
    )
    SELECT doc_id, eval_id, n_overlap,
           ROUND(n_overlap * 1.0 / eval_size, 4) AS overlap_frac
    FROM hits WHERE n_overlap >= {_MIN_OVERLAP}
    ORDER BY doc_id, eval_id
    """,
    doc="benchmark decontamination: distinct word-5-gram collision of "
    "every training document against the (bounded, broadcast) eval-set "
    "n-gram index — map-only over the corpus, the shape public LM "
    "training reports use for eval decontamination (extension)",
)
def curation_benchmark_contamination(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % _EVAL_MOD == 0)
    return benchmark_contamination(
        d, ev, n=_NGRAM_N, min_overlap=_MIN_OVERLAP
    ).orderBy("doc_id", "eval_id")


@query(
    "curation_training_order",
    oracle="""
    SELECT doc_id,
           md5('seed0-' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5('seed0-' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS train_rank
    FROM documents
    ORDER BY train_rank
    """,
    doc="reproducible global training order: engine-portable md5 shuffle "
    "key + distributed global rank (per-bucket row_number + broadcast "
    "cumulative bucket offsets — no single-partition window) "
    "(extension)",
)
def curation_training_order(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return training_order(d, seed="seed0").orderBy("train_rank")


@query(
    "curation_bigram_lm_quality",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_DD_WORDS} AS w FROM documents),
    big AS (
        SELECT doc_id, unnest(CASE WHEN len(w) >= 2
            THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
            ELSE CAST([] AS VARCHAR[]) END) AS bg
        FROM toks
    ),
    bigc AS (SELECT bg, COUNT(*) AS c2 FROM big GROUP BY bg),
    unic AS (SELECT unnest(w) AS u FROM toks),
    unicc AS (SELECT u, COUNT(*) AS c1 FROM unic GROUP BY u),
    v AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vsize FROM unicc)
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           ROUND(-AVG(ln((bigc.c2 + 0.5) / (unicc.c1 + 0.5 * v.vsize))), 4) AS nll
    FROM big b
    JOIN bigc USING (bg)
    JOIN unicc ON unicc.u = string_split(b.bg, ' ')[1]
    CROSS JOIN v
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
    doc="LM-based quality scoring: corpus-trained add-k bigram model, "
    "per-document mean negative log-likelihood (high = improbable word "
    "sequences) — the public LM-filter shape (CCNet-style) with the "
    "count relations as vocabulary-bounded aggregates and one "
    "corpus-sized scoring join (extension)",
)
def curation_bigram_lm_quality(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return bigram_lm_nll(d, k=0.5).select(
        F.col("id").alias("doc_id"), "n_bigrams", "nll"
    ).orderBy("doc_id")


@query(
    "curation_source_mixture_weights",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM c)
    SELECT source, n_docs,
           ROUND(n_docs / total, 4) AS observed_frac,
           ROUND(0.05 / (n_docs / total), 4) AS weight
    FROM c CROSS JOIN tot
    ORDER BY source
    """,
    doc="source mixture weighting: per-source resampling weight toward "
    "a uniform 20-source target mix — one corpus aggregate, broadcast "
    "target lookup (extension: domain mixing)",
)
def curation_source_mixture_weights(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    targets = {f"src{i}": 0.05 for i in range(20)}
    return source_mixture_weights(d, targets).orderBy("source")


@query(
    "curation_apply_mixture_sample",
    # keep-decision = integer compare of the md5 16-bit prefix against
    # floor(weight * 2^16): weight arithmetic is the same expression
    # order both engines, truncation (not rounding) avoids the .5
    # boundary, and the hash family is portable — so the MATERIALIZED
    # mix is hash-verifiable, not just the weights
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS total FROM c),
    w AS (
        SELECT source, n_docs,
               LEAST(1.0, 0.05 / (n_docs / total)) AS keep_w
        FROM c CROSS JOIN tot
    )
    SELECT d.source, MIN(w.n_docs) AS n_docs,
           CAST(SUM(CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
                    < CAST(FLOOR(w.keep_w * 65536) AS BIGINT)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN w ON d.source = w.source
    GROUP BY d.source
    ORDER BY d.source
    """,
    doc="mixture application: the per-source resampling weights "
    "(curation_source_mixture_weights) applied as a deterministic "
    "md5-threshold sampler — the map-only filter that MATERIALIZES the "
    "training mix; weight relation broadcasts (one row per source) "
    "(extension: domain mixing, composes curation + sampling)",
)
def curation_apply_mixture_sample(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    total = F.sum("n_docs").over(Window.partitionBy())
    w = c.select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0), F.lit(0.05) / (F.col("n_docs") / total.cast("double"))
        ).alias("keep_w"),
    )
    h16 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    )
    kept = h16 < F.floor(F.col("keep_w") * 65536).cast("long")
    return (
        d.join(F.broadcast(w), "source")
        .groupBy("source")
        .agg(
            F.min("n_docs").alias("n_docs"),
            F.sum(kept.cast("long")).alias("n_kept"),
        )
        .orderBy("source")
    )


@query(
    "curation_ngram_novelty",
    oracle="""
    WITH words AS (
        SELECT doc_id AS id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
        FROM documents
    ),
    sets AS (
        SELECT id,
               list_distinct(CASE WHEN len(w) >= 2
                   THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
                   ELSE CAST([] AS VARCHAR[]) END) AS sh
        FROM words
    ),
    posting AS (SELECT id, unnest(sh) AS shingle FROM sets),
    firsts AS (SELECT shingle, MIN(id) AS first_id FROM posting GROUP BY shingle)
    SELECT p.id AS doc_id, COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN p.id = f.first_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           ROUND(SUM(CASE WHEN p.id = f.first_id THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS novelty
    FROM posting p JOIN firsts f ON p.shingle = f.shingle
    GROUP BY p.id ORDER BY doc_id
    """,
    doc="n-gram novelty per document: the share of a doc's bigrams "
    "FIRST introduced by it in id order — the streaming-novelty "
    "signal curation pipelines use to deprioritize late near-copies "
    "without pairwise comparison; one shingle-min aggregate + one "
    "equi-join back, both map-side combining, no pair explosion "
    "(extension: curation family)",
)
def curation_ngram_novelty(spark, sf_dir):
    from qaapi_spark.operators.dedup import word_shingles

    d = t(spark, sf_dir, "documents")
    sets = d.select(
        F.col("doc_id").alias("id"),
        F.array_distinct(word_shingles(F.col("text"), 2)).alias("sh"),
    )
    posting = sets.select("id", F.explode("sh").alias("shingle"))
    firsts = posting.groupBy("shingle").agg(F.min("id").alias("first_id"))
    novel = F.sum(
        F.when(F.col("id") == F.col("first_id"), 1).otherwise(0)
    )
    return (
        posting.join(firsts, "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(
            F.count("*").alias("n_shingles"),
            novel.alias("n_novel"),
            F.round(novel / F.count("*"), 4).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@query(
    "curation_dedup_training_order",
    # composition oracle: the recursive-CTE component labels pick the
    # keepers (doc_id == comp), then the portable md5 shuffle ranks
    # ONLY the keepers — the end-to-end dedup -> order curation flow
    oracle="""
    WITH RECURSIVE words AS (
        SELECT doc_id AS id,
               CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(lower(text)), '\\s+') END AS w
        FROM documents
    ),
    sets AS (
        SELECT id,
               list_distinct(CASE WHEN len(w) >= 2
                   THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])
                   ELSE CAST([] AS VARCHAR[]) END) AS sh
        FROM words
    ),
    sizes AS (SELECT id, len(sh) AS set_size FROM sets),
    posting AS (SELECT id, unnest(sh) AS shingle FROM sets),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS inter
        FROM posting a JOIN posting b ON a.shingle = b.shingle AND a.id < b.id
        GROUP BY a.id, b.id
    ),
    pairs AS (
        SELECT i.id_a, i.id_b
        FROM inter i
        JOIN sizes sa ON i.id_a = sa.id
        JOIN sizes sb ON i.id_b = sb.id
        WHERE ROUND(i.inter * 1.0 / (sa.set_size + sb.set_size - i.inter), 4)
              >= 0.8
    ),
    edges AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.d, r.r FROM reach r JOIN edges e ON e.s = r.node
    ),
    labels AS (SELECT node AS doc_id, MIN(r) AS comp FROM reach GROUP BY node),
    keepers AS (SELECT doc_id FROM labels WHERE doc_id = comp)
    SELECT doc_id,
           md5('seed0-' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5('seed0-' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS train_rank
    FROM keepers ORDER BY train_rank
    """,
    doc="end-to-end curation composition: near-dup CONNECTED-COMPONENT "
    "keepers (memoized cc labels, min-id representative) fed into the "
    "reproducible md5 training order — dedup then shuffle, the two "
    "steps every pretraining data pipeline chains; keeper filter is a "
    "map-only comparison on the labels relation (extension)",
)
def curation_dedup_training_order(spark, sf_dir):
    from qaapi_spark.plans.llm_dedup import cc_jaccard_labels

    keepers = (
        cc_jaccard_labels(spark, sf_dir)
        .filter(F.col("node") == F.col("comp"))
        .select(F.col("node").alias("doc_id"))
    )
    return training_order(keepers, seed="seed0").orderBy("train_rank")


@query(
    "curation_source_kl_drift",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({_DD_WORDS}) AS tkn
        FROM documents WHERE trim(text) <> ''
    ),
    st AS (SELECT source, tkn, COUNT(*) AS c FROM tok GROUP BY source, tkn),
    stot AS (SELECT source, CAST(SUM(c) AS DOUBLE) AS ts FROM st GROUP BY source),
    ct AS (SELECT tkn, CAST(SUM(c) AS DOUBLE) AS ctot FROM st GROUP BY tkn),
    tot AS (SELECT SUM(ctot) AS t FROM ct)
    SELECT st.source,
           CAST(MAX(stot.ts) AS BIGINT) AS n_tokens,
           ROUND(SUM((st.c / stot.ts) * ln((st.c / stot.ts) / (ct.ctot / tot.t))), 4)
               AS kl_nats
    FROM st
    JOIN stot USING (source)
    JOIN ct USING (tkn)
    CROSS JOIN tot
    GROUP BY st.source
    ORDER BY source
    """,
    doc="per-source unigram-distribution KL divergence from the corpus "
    "distribution — the mixture-drift monitor run per ingest wave; one "
    "partial-aggregated corpus shuffle, then vocab-scale joins "
    "(extension: domain-mix monitoring)",
)
def curation_source_kl_drift(spark, sf_dir):
    from qaapi_spark.operators.curation import source_kl_divergence

    d = t(spark, sf_dir, "documents")
    return source_kl_divergence(d).orderBy("source")


_DSIR_BUCKETS = 1024
_DSIR_TOPN = 100


@query(
    "curation_dsir_importance",
    # Integer-exact counts; the only floats are ln of identical double
    # quotients (same exact-integer operands both engines — mirrors the
    # green bigram-LM precedent) summed per doc and rounded to 4 dp;
    # the top-N boundary orders on the ROUNDED value with a doc_id
    # tiebreak, so the selected set is engine-stable.
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang = 'en' AS is_target,
               unnest({_DD_WORDS}) AS tkn
        FROM documents
    ),
    b AS (
        SELECT doc_id, is_target,
               CAST(('0x' || substr(md5(tkn), 1, 8)) AS BIGINT)
                   % {_DSIR_BUCKETS} AS bucket
        FROM toks
    ),
    model AS (
        SELECT bucket, COUNT(*) AS r_b,
               SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS t_b
        FROM b GROUP BY bucket
    ),
    tot AS (SELECT SUM(r_b) AS r_tot, SUM(t_b) AS t_tot FROM model),
    lam AS (
        SELECT bucket,
               ln((t_b + 1) * 1.0 / (t_tot + {_DSIR_BUCKETS}))
               - ln((r_b + 1) * 1.0 / (r_tot + {_DSIR_BUCKETS})) AS loglam
        FROM model CROSS JOIN tot
    )
    SELECT doc_id, n_toks, importance FROM (
        SELECT b.doc_id, COUNT(*) AS n_toks,
               ROUND(SUM(lam.loglam), 4) AS importance
        FROM b JOIN lam USING (bucket)
        GROUP BY b.doc_id
    )
    ORDER BY importance DESC, doc_id LIMIT {_DSIR_TOPN}
    """,
    doc="DSIR-style data selection (Xie et al., NeurIPS 2023, public): "
    "bag-of-hashed-unigram models (1024 md5 buckets, add-1 smoothing) "
    "of the lang='en' TARGET slice vs the raw corpus; per-document "
    "importance = summed log-likelihood ratio over token occurrences; "
    "keep the top-100 most target-like documents. One corpus token "
    "aggregate builds BOTH models in a single conditional pass, the "
    "bucket model broadcasts (1024 rows) into the scoring join, the "
    "top-N compiles to TakeOrderedAndProject (extension: "
    "distribution-targeted corpus selection without a trained "
    "classifier)",
)
def curation_dsir_importance(spark, sf_dir):
    from qaapi_spark.operators.curation import dsir_importance

    d = t(spark, sf_dir, "documents")
    return (
        dsir_importance(d, F.col("lang") == "en", n_buckets=_DSIR_BUCKETS)
        .select(F.col("id").alias("doc_id"), "n_toks", "importance")
        .orderBy(F.desc("importance"), "doc_id")
        .limit(_DSIR_TOPN)
    )


_PACK_BUDGET = 128

_PACK_CHUNKS_ORACLE = f"""
    WITH toks AS (
        SELECT source, doc_id, len({_DD_TOKS_RAW}) AS n_toks FROM documents
    ),
    p AS (
        SELECT source, doc_id, n_toks,
               COALESCE(SUM(n_toks) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS start_tok
        FROM toks WHERE n_toks > 0
    )
    SELECT source, doc_id, CAST(n_toks AS BIGINT) AS n_toks,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(FLOOR(start_tok / {_PACK_BUDGET}.0) AS BIGINT) AS first_chunk,
           CAST(FLOOR((start_tok + n_toks - 1) / {_PACK_BUDGET}.0) AS BIGINT)
               AS last_chunk,
           CAST(FLOOR((start_tok + n_toks - 1) / {_PACK_BUDGET}.0) AS BIGINT)
               - CAST(FLOOR(start_tok / {_PACK_BUDGET}.0) AS BIGINT) + 1
               AS n_chunks
    FROM p ORDER BY source, doc_id
    """


@query(
    "curation_pack_chunks",
    oracle=_PACK_CHUNKS_ORACLE,
    doc="concat-and-chunk sequence packing (the standard LM training "
    "layout): within each source shard, documents concatenate in "
    "doc_id order and the token stream splits into fixed 128-token "
    "training sequences; output maps every document to its byte-exact "
    "[first_chunk, last_chunk] span. Integer-exact running-SUM window "
    "per shard — at 100 TB the pack group IS the output shard, so "
    "window parallelism equals shard count and no global prefix-sum "
    "bottleneck exists (extension: training-sequence formation; "
    "complements the length-bucketed batch query)",
)
def curation_pack_chunks(spark, sf_dir):
    from qaapi_spark.operators.curation import pack_sequences
    from qaapi_spark.operators.textstats import ws_tokens

    d = t(spark, sf_dir, "documents")
    nt = d.select(
        "source", "doc_id", F.size(ws_tokens(F.col("text"))).alias("n_toks")
    )
    return pack_sequences(nt, _PACK_BUDGET).orderBy("source", "doc_id")


@query(
    "stream_pack_chunks",
    oracle=_PACK_CHUNKS_ORACLE,
    doc="incremental training-shard formation as a STREAM: documents "
    "arrive in doc_id-ordered micro-batches (3 range slices, one "
    "sorted file per trigger) and each batch takes its packed offsets "
    "from an O(|sources|) running-total state, appending to shards "
    "without recomputing earlier offsets; under the ordered-ingest "
    "contract the streamed relation is bit-equal to the batch pack "
    "and shares curation_pack_chunks' oracle. State is written as "
    "per-epoch snapshots, so a replayed epoch reproduces identical "
    "bytes instead of double-counting (retry-idempotent by "
    "construction) (extension, SURVEY §2.9; "
    "streaming/incremental.stream_pack_chunks)",
)
def stream_pack_chunks_q(spark, sf_dir):
    from qaapi_spark.streaming.incremental import stream_pack_chunks

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return stream_pack_chunks(
        spark, f"{sf_dir}/documents.parquet", budget=_PACK_BUDGET
    ).orderBy("source", "doc_id")
