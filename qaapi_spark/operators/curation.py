"""Corpus-curation operators for training-data pipelines: benchmark
contamination detection, deterministic training order, and source
mixture weighting.

These extend the dedup/text surface (SURVEY §7.2 step 7 north star)
with the remaining steps a pretraining-data pipeline runs between
"deduplicated corpus" and "training shards":

  - contamination: does any training document contain n-grams of an
    evaluation/benchmark document?  (eval sets are bounded by
    construction — MBs against a 100 TB corpus — so the eval n-gram
    index broadcasts and the check is map-only over the corpus);
  - training order: a reproducible global shuffle.  Engine-portable
    randomness (md5, as in operators/sampling.py) plus a *distributed*
    global rank — per-bucket row_number + broadcast cumulative bucket
    offsets — so no single-partition window ever materializes;
  - mixture weights: per-source resampling weights that reshape the
    observed source distribution toward a target mix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from qaapi_spark.operators.dedup import word_shingles


def benchmark_contamination(
    corpus: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, eval_id, n_overlap, overlap_frac): training documents
    sharing >= min_overlap distinct word n-grams with an eval document.

    Standard decontamination shape (n-gram collision against the eval
    set, as popularized by public LM training reports): the eval side
    is exploded to hashed n-gram postings and — being a benchmark, i.e.
    fixed-size — broadcast; the corpus side streams map-only through
    the join.  overlap_frac is n_overlap / |eval doc's n-gram set|, the
    fraction of the eval document covered by the training document.
    """
    ev_sets = eval_set.select(
        F.col(id_col).alias("eval_id"),
        F.transform(word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)).alias("sh"),
    ).withColumn("eval_size", F.size("sh"))
    ev_post = ev_sets.select("eval_id", "eval_size", F.explode("sh").alias("g"))
    if broadcast_eval:
        ev_post = F.broadcast(ev_post)
    corpus_post = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s))
        ).alias("g"),
    )
    return (
        corpus_post.join(ev_post, "g")
        .filter(F.col("doc_id") != F.col("eval_id"))
        .groupBy("doc_id", "eval_id", "eval_size")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select(
            "doc_id",
            "eval_id",
            "n_overlap",
            F.round(F.col("n_overlap") / F.col("eval_size"), 4).alias("overlap_frac"),
        )
    )


def training_order(
    df: DataFrame,
    seed: str = "seed0",
    id_col: str = "doc_id",
    bucket_chars: int = 2,
) -> DataFrame:
    """Reproducible global training order: (id, shuffle_key, rank).

    shuffle_key = md5(seed || '-' || id) — engine-portable, so the
    order is identical in Spark, DuckDB, or a downstream loader.  The
    global rank is computed WITHOUT a single-partition window: rows
    shuffle once on their hex-prefix bucket (16^bucket_chars buckets),
    rank within the bucket, and add the broadcast cumulative size of
    all lower buckets.  Because the bucket prefix is the leading
    characters of the sort key itself, bucket order == key order and
    the composition is exact.
    """
    keyed = df.select(
        F.col(id_col),
        F.md5(F.concat(F.lit(seed), F.lit("-"), F.col(id_col).cast("string"))).alias(
            "shuffle_key"
        ),
    ).withColumn("bucket", F.substring("shuffle_key", 1, bucket_chars))
    sizes = keyed.groupBy("bucket").agg(F.count("*").alias("n"))
    offsets = sizes.select(
        "bucket",
        (
            F.sum("n").over(
                Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("offset"),
    ).fillna(0, subset=["offset"])
    w = Window.partitionBy("bucket").orderBy("shuffle_key", id_col)
    ranked = keyed.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(offsets), "bucket")
        .select(
            id_col,
            "shuffle_key",
            (F.col("offset") + F.col("rn")).alias("train_rank"),
        )
    )


def bigram_lm_nll(
    df: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_bigrams, nll): corpus-trained bigram-LM quality score.

    Train an add-k-smoothed bigram model on the corpus itself and score
    each document by its average negative log-likelihood —
    ``P(w2|w1) = (c(w1 w2) + k) / (c(w1) + k*V)`` — the LM-based
    quality-filter shape public pipelines use (high nll = improbable
    word sequences).  Plan: two count aggregates (map-side combined,
    vocabulary-sized), one scalar V, then the positional bigram stream
    joins its counts (the only corpus-sized shuffle) and reduces
    per-document.  Count relations are vocabulary-bounded, so AQE
    broadcasts them when small and shuffles when not — no user hint.
    """
    from qaapi_spark.operators.textstats import word_ngrams, ws_tokens
    from qaapi_spark.session import register_kernel_cache

    # positional bigram stream, cached: it feeds both the count
    # aggregate (model training) and the scoring join (inference)
    big = register_kernel_cache(
        df.select(
            F.col(id_col).alias("id"),
            F.explode(word_ngrams(F.col(text_col), 2)).alias("bg"),
        ).persist()
    )
    bigc = big.groupBy("bg").agg(F.count("*").alias("c2"))
    unic = (
        df.select(F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("u"))
        .groupBy("u")
        .agg(F.count("*").alias("c1"))
    )
    vsize = float(unic.count())
    first = F.split("bg", " ")[0]
    scored = (
        big.join(bigc, "bg")
        .withColumn("u", first)
        .join(unic, "u")
        .select(
            "id",
            (-F.log((F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k * vsize)))).alias(
                "nl"
            ),
        )
    )
    return scored.groupBy("id").agg(
        F.count("*").alias("n_bigrams"), F.round(F.avg("nl"), 4).alias("nll")
    )


def source_mixture_weights(
    df: DataFrame,
    targets: dict[str, float],
    source_col: str = "source",
) -> DataFrame:
    """(source, n_docs, observed_frac, weight): per-source resampling
    weight that reshapes the observed mix toward the target mix.

    weight = target_frac / observed_frac — multiply by it (or sample
    with probability proportional to it) to hit the target
    distribution.  One corpus-wide aggregate (map-side combine); the
    target table is a literal lookup joined onto group results, so the
    only corpus-sized cost is the single groupBy shuffle.
    """
    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in targets.items()], f"{source_col} string, target_frac double"
    )
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(tgt), source_col, "left")
        .select(
            source_col,
            "n_docs",
            F.round(F.col("n_docs") / F.col("total"), 4).alias("observed_frac"),
            F.round(
                F.coalesce(F.col("target_frac"), F.lit(0.0))
                / (F.col("n_docs") / F.col("total")),
                4,
            ).alias("weight"),
        )
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(source, n_tokens, kl_nats): KL divergence of each source's
    unigram token distribution from the whole-corpus distribution —
    the mixture-drift monitor a training pipeline runs per ingest wave
    (a source whose KL jumps changed its content mix).

    KL(p_s || q) = sum_t p_s(t) * ln(p_s(t) / q(t)) with
    p_s(t) = c_st / T_s and q(t) = C_t / T.  Every source token is by
    construction in the corpus, so q(t) > 0 and no smoothing is
    needed.

    Shape: ONE corpus-sized shuffle (the (source, token) count; the
    explode happens map-side and combines partially), after which
    everything is vocab-scale: per-source totals and the corpus
    distribution both re-aggregate the already-reduced counts, the
    q(t) join keys on token over vocab-sized relations, and the final
    per-source sum is |sources| rows.  At 100 TB the only term that
    grows is the first partial-aggregated shuffle.
    """
    from qaapi_spark.operators.textstats import ws_tokens

    st = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tkn"),
        )
        .groupBy("source", "tkn")
        .agg(F.count("*").alias("c"))
    )
    stot = st.groupBy("source").agg(F.sum("c").alias("ts"))
    ct = st.groupBy("tkn").agg(F.sum("c").alias("ctot"))
    tot = ct.agg(F.sum("ctot").alias("t"))
    p = F.col("c") / F.col("ts")
    q = F.col("ctot") / F.col("t")
    return (
        st.join(ct, "tkn")
        .join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("ts").cast("bigint").alias("n_tokens"),
            F.round(F.sum(p * F.log(p / q)), 4).alias("kl_nats"),
        )
    )


def dsir_importance(
    df: DataFrame,
    target_pred: Column,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_toks, importance): DSIR-style hashed-feature importance
    weights for distributionally-targeted data selection (Xie et al.,
    "Data Selection for Language Models via Importance Resampling",
    NeurIPS 2023 — public method).

    Bag-of-hashed-unigrams models of the TARGET slice (rows where
    ``target_pred``) and the RAW corpus, add-1 smoothed over
    ``n_buckets`` hashed buckets; a document's importance is the
    log-likelihood ratio  sum_t [ln p_target(b(t)) - ln p_raw(b(t))]
    over its token occurrences — resample high-importance documents to
    shift the corpus toward the target distribution without a trained
    classifier.

    Engine-portable: the bucket hash is the md5-prefix family (same as
    the span keys), counts are exact integers, and the only floats are
    the final ln ratios (mirrors the green bigram-LM precedent).
    Plan: ONE corpus-sized token aggregate builds both models
    (conditional counts per bucket — raw and target in the same pass),
    the bucket model is n_buckets rows and BROADCASTS into the scoring
    join, then one per-document sum.  At 100 TB the only growing terms
    are the two corpus-sized passes (model + scoring), both map-side
    combined.
    """
    from qaapi_spark.operators.textstats import ws_tokens
    from qaapi_spark.session import register_kernel_cache

    toks = register_kernel_cache(
        df.select(
            F.col(id_col).alias("id"),
            target_pred.alias("is_target"),
            F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("tkn"),
        )
        .withColumn(
            "bucket",
            F.conv(F.substring(F.md5("tkn"), 1, 8), 16, 10).cast("long")
            % F.lit(n_buckets),
        )
        .persist()
    )
    model = toks.groupBy("bucket").agg(
        F.count("*").alias("r_b"),
        F.count(F.when(F.col("is_target"), 1)).alias("t_b"),
    )
    totals = model.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    lam = (
        model.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("t_b") + 1) / (F.col("t_tot") + F.lit(n_buckets)))
                - F.log((F.col("r_b") + 1) / (F.col("r_tot") + F.lit(n_buckets)))
            ).alias("loglam"),
        )
    )
    return toks.join(F.broadcast(lam), "bucket").groupBy("id").agg(
        F.count("*").alias("n_toks"),
        F.round(F.sum("loglam"), 4).alias("importance"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    ntok_col: str = "n_toks",
) -> DataFrame:
    """(group, id, n_toks, start_tok, first_chunk, last_chunk,
    n_chunks): concat-and-chunk sequence packing — the standard LM
    training-data layout where documents concatenate in a fixed order
    within a shard and the token stream splits into fixed
    ``budget``-token training sequences.

    Deterministic and integer-exact: start offsets come from a running
    SUM window over ``order_col`` within ``group_col``; chunk ids are
    floor divisions of exact int64 offsets.  Zero-token documents are
    excluded (they occupy no chunk).  Parallelism is per group — at
    100 TB the pack group IS the output shard (thousands of them), so
    the single-partition window bottleneck of a global pack never
    appears; within a shard the window is one shuffle keyed on the
    shard id.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(ntok_col).over(w), F.lit(0))
    out = (
        df.filter(F.col(ntok_col) > 0)
        .withColumn("start_tok", start.cast("long"))
        .withColumn(
            "first_chunk", F.floor(F.col("start_tok") / F.lit(budget)).cast("long")
        )
        .withColumn(
            "last_chunk",
            F.floor(
                (F.col("start_tok") + F.col(ntok_col) - 1) / F.lit(budget)
            ).cast("long"),
        )
    )
    return out.select(
        group_col,
        order_col,
        F.col(ntok_col).cast("long").alias("n_toks"),
        "start_tok",
        "first_chunk",
        "last_chunk",
        (F.col("last_chunk") - F.col("first_chunk") + 1).alias("n_chunks"),
    )
