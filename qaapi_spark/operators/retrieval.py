"""Keyword retrieval + hashing-based ANN over the documents corpus.

Lexical retrieval is relational all the way down, so everything here is
Catalyst expressions — no Python in the hot path:

  - TF-IDF: two hash aggregates (term frequency per (doc, term); doc
    frequency per term) joined back.  The doc-frequency relation is
    vocabulary-sized, orders of magnitude smaller than the corpus, so
    it broadcasts; the corpus-sized side shuffles once on (doc, term).
  - BM25: same shape, but query terms are filtered out of the token
    stream *before* the aggregate, so shuffle volume is matches-only
    (|query| terms per doc at most), not vocabulary-sized.
  - SRP-LSH (signed random projection): the embedding analog of
    simhash.  Hyperplane signs come from a deterministic md5-seeded
    ±1 matrix embedded as literal arrays, so the signature is a pure
    map-side expression (zip_with + aggregate per plane), the bucket
    join is an equi-join on (band, key), and the whole operator is
    reproducible across runs/engines with no fitted model.

Scale notes (100 TB): TF-IDF/BM25 shuffle keys are (doc_id, term) —
uniformly spread; the df-side broadcast stays small because vocabulary
grows sub-linearly in corpus size (cap with a min-df filter when it
doesn't).  SRP bucket joins shuffle only (id, band, key) triples;
recall/cost trades via n_planes and bands exactly like minhash LSH.
"""

from __future__ import annotations

import hashlib
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qaapi_spark.operators.similarity import dot, with_unit_vector
from qaapi_spark.operators.textstats import ws_tokens
from qaapi_spark.operators.windows import topk_per_group


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf): raw count of each lowercase ws token per doc."""
    return (
        df.select(F.col(id_col).alias("id"), F.explode(ws_tokens(F.lower(F.col(text_col)))).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf, df_count, tfidf): tfidf = tf * ln(N / df).

    N (corpus size) is a driver-side scalar; the doc-frequency relation
    broadcasts into the corpus-sized tf side.
    """
    n_docs = df.count()
    tf = term_frequencies(df, text_col, id_col)
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_count"))
    return tf.join(F.broadcast(dfreq), "term").select(
        "id",
        "term",
        "tf",
        "df_count",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df_count"))).alias("tfidf"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score): Okapi BM25 of each doc against a bag of query terms.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).  Doc length and the
    avgdl scalar are exact-integer aggregates divided once, so the
    constant is bit-identical across engines.  Query terms filter the
    token stream before any aggregate — the shuffled relation holds at
    most |query_terms| rows per document.
    """
    toks = df.select(
        F.col(id_col).alias("id"), ws_tokens(F.lower(F.col(text_col))).alias("toks")
    ).select("id", "toks", F.size("toks").alias("dl"))
    n_docs, sum_dl = toks.agg(F.count("*"), F.sum("dl")).collect()[0]
    avgdl = float(sum_dl) / float(n_docs)

    matches = (
        toks.select("id", "dl", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = matches.groupBy("term").agg(F.count("*").alias("df_count"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df_count") + F.lit(0.5)) / (F.col("df_count") + F.lit(0.5))
    )
    per_term = matches.join(F.broadcast(dfreq), "term").select(
        "id",
        (
            idf
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)))
        ).alias("s"),
    )
    return per_term.groupBy("id").agg(F.sum("s").alias("score"))


def srp_sign_matrix(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix: sign(p, d) from md5(p:d).

    md5 is engine/run-stable (unlike a seeded RNG whose stream order
    depends on partitioning), so signatures are reproducible anywhere.
    """
    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) & 1 else -1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def srp_signatures(
    df: DataFrame,
    n_planes: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, unit_vec, bits): bits[p] = 1 iff dot(vec, plane_p) > 0.

    Map-only: one zip_with+aggregate fold per plane, all inside
    whole-stage codegen; nothing shuffles.
    """
    planes = srp_sign_matrix(n_planes, dim)
    unit = with_unit_vector(df, vec_col).select(
        F.col(id_col).alias("id"), F.col("unit_vec")
    )
    bits = [
        (dot(F.col("unit_vec"), F.array(*[F.lit(s) for s in plane])) > 0).cast("int").alias(f"b{p}")
        for p, plane in enumerate(planes)
    ]
    return unit.select("id", "unit_vec", F.array(*bits).alias("bits"))


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_planes: int = 16,
    n_bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: SRP band buckets -> candidate equi-join
    -> exact rerank of candidates only.

    (query_id, cand_id, cosine) ranked (cosine desc, cand_id asc); a
    query meets only corpus rows sharing >=1 of its n_bands bucket
    keys, so the join is sub-quadratic; the rerank is exact, so
    precision is 1 and only recall is approximate.
    """
    dim = len(corpus.select(vec_col).head()[0])
    rows_per_band = n_planes // n_bands
    # signature folds are per-row CPU; single-file inputs arrive as one
    # partition, so spread them across every core first
    par = corpus.sparkSession.sparkContext.defaultParallelism
    queries, corpus = queries.repartition(par), corpus.repartition(par)

    def banded(sig: DataFrame, side: str) -> DataFrame:
        keys = F.array(
            *[
                F.struct(
                    F.lit(bnd).alias("band"),
                    F.aggregate(
                        F.slice("bits", bnd * rows_per_band + 1, rows_per_band),
                        F.lit(0),
                        lambda acc, x: acc * 2 + x,
                    ).alias("key"),
                )
                for bnd in range(n_bands)
            ]
        )
        return sig.select(
            F.col("id").alias(f"{side}_id"),
            F.col("unit_vec").alias(f"{side}_uv"),
            F.explode(keys).alias("bk"),
        ).select(f"{side}_id", f"{side}_uv", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    q = banded(srp_signatures(queries, n_planes, dim, vec_col, id_col), "q")
    c = banded(srp_signatures(corpus, n_planes, dim, vec_col, id_col), "c")
    cand = (
        q.join(c, ["band", "key"])
        .select("q_id", "c_id", "q_uv", "c_uv")
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cand.select(
        F.col("q_id").alias("query_id"),
        F.col("c_id").alias("cand_id"),
        F.round(dot(F.col("q_uv"), F.col("c_uv")), round_to).alias("cosine"),
    )
    return topk_per_group(scored, ["query_id"], [F.desc("cosine"), F.asc("cand_id")], k)


def keep_representatives(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Corpus minus near-duplicates: group the pair graph into connected
    components and keep the min-id row of each component (isolated rows
    keep themselves)."""
    from qaapi_spark.operators.graph import connected_components

    comp = connected_components(
        df.select(id_col), pairs, node_col=id_col, src_col="id_a", dst_col="id_b"
    )
    keepers = comp.filter(F.col("comp") == F.col("node")).select(
        F.col("node").alias(id_col)
    )
    return df.join(keepers, id_col, "left_semi")
