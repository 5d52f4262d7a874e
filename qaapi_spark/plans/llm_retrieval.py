"""Lexical retrieval + LSH-ANN + dedup-materialization queries
(extended training-data surface): TF-IDF keyterms, BM25 search,
SRP-LSH approximate nearest neighbors, and the near-dup-free corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.operators.retrieval import (
    bm25_scores,
    srp_lsh_topk,
    tf_idf,
)
from qaapi_spark.operators.textstats import ws_tokens
from qaapi_spark.operators.windows import topk_per_group
from qaapi_spark.plans.catalog import query, t
from qaapi_spark.plans.llm_dedup import _DD_JACCARD_PAIRS, _JACCARD_THRESHOLD
from qaapi_spark.plans.llm_similarity import _K, _QUERY_MOD
from qaapi_spark.plans.llm_text import _DD_TOKS
from qaapi_spark.sources.tables import footer_rows

_TOP_TERMS = 3
_BM25_TERMS = ["vector", "hash", "stream"]
_BM25_TOPN = 20

# Shared DuckDB fragment: (doc_id, term, tf) over lowercase ws tokens.
_DD_TF = f"""
    toks AS (SELECT doc_id, unnest({_DD_TOKS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term)
"""


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH {_DD_TF},
    dfreq AS (SELECT term, COUNT(*) AS df_count FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    scored AS (
        SELECT doc_id, tf.term,
               ROUND(tf * ln(CAST(n.n AS DOUBLE) / df_count), 4) AS tfidf
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    )
    SELECT doc_id, term, tfidf FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rn
        FROM scored
    ) WHERE rn <= {_TOP_TERMS}
    ORDER BY doc_id, tfidf DESC, term
    """,
    doc="per-document top-3 TF-IDF keyterms: corpus-sized (doc, term) "
    "hash-agg + broadcast of the vocabulary-sized doc-frequency "
    "relation + windowed top-k (extension: keyword extraction)",
)
def tfidf_top_terms(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    scored = tf_idf(d, n_docs=footer_rows(f"{sf_dir}/documents.parquet")).select(
        F.col("id").alias("doc_id"), "term", F.round("tfidf", 4).alias("tfidf")
    )
    top = topk_per_group(
        scored, ["doc_id"], [F.desc("tfidf"), F.asc("term")], _TOP_TERMS
    )
    return top.orderBy("doc_id", F.desc("tfidf"), "term")


@query(
    "bm25_search_topk",
    oracle=f"""
    WITH {_DD_TF},
    dl AS (SELECT doc_id, len({_DD_TOKS}) AS dl FROM documents),
    stats AS (SELECT COUNT(*) AS n,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
    m AS (
        SELECT tf.doc_id, tf.term, tf.tf, dl.dl
        FROM tf JOIN dl ON tf.doc_id = dl.doc_id
        WHERE tf.term IN ({", ".join(f"'{w}'" for w in _BM25_TERMS)})
    ),
    dfreq AS (SELECT term, COUNT(*) AS df_count FROM m GROUP BY term),
    per_term AS (
        SELECT m.doc_id,
               ln(1.0 + (CAST(stats.n AS DOUBLE) - df_count + 0.5)
                        / (df_count + 0.5))
               * (m.tf * 2.2)
               / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / stats.avgdl)) AS s
        FROM m JOIN dfreq ON m.term = dfreq.term CROSS JOIN stats
    )
    SELECT doc_id, ROUND(SUM(s), 4) AS score
    FROM per_term GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {_BM25_TOPN}
    """,
    doc="Okapi BM25 top-20 for the query bag {vector, hash, stream} "
    "(k1=1.2, b=0.75): token stream filtered to query terms before any "
    "aggregate, so shuffle volume is matches-only; avgdl from exact "
    "integer sums (extension: keyword search)",
)
def bm25_search_topk(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    scores = bm25_scores(d, _BM25_TERMS).select(
        F.col("id").alias("doc_id"), F.round("score", 4).alias("score")
    )
    return scores.orderBy(F.desc("score"), "doc_id").limit(_BM25_TOPN)


@query(
    "dedup_keep_representatives",
    oracle=f"""
    WITH RECURSIVE {_DD_JACCARD_PAIRS},
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
    comp AS (SELECT node, MIN(r) AS comp FROM reach GROUP BY node)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN comp ON d.doc_id = comp.node
    WHERE comp.comp = comp.node
    ORDER BY d.doc_id
    """,
    doc="the deduplicated corpus itself: near-dup pairs -> connected "
    "components -> keep the min-id representative per component "
    "(labels come from the memoized cc_jaccard_labels kernel shared "
    "with dedup_connected_components; this materializes the decision "
    "as a semi-join filter on the corpus) "
    "(extension: dedup materialization)",
)
def dedup_keep_representatives(spark, sf_dir):
    from qaapi_spark.plans.llm_dedup import cc_jaccard_labels

    d = t(spark, sf_dir, "documents")
    comp = cc_jaccard_labels(spark, sf_dir)
    keepers = comp.filter(F.col("comp") == F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    return (
        d.join(keepers, "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# Retuned round 9 (VERDICT r8 wrong #2): 16 planes / 4 bands measured
# recall@5 = 0.40 at sf0.1.  The sweep (SCALE.md round 9) over
# planes x bands x probe-flips found 128/16 + 1-flip query-side
# multi-probe the cheapest config clearing the >= 0.8 serving bar:
# recall@5 = 0.86 at ~45% mean corpus-touch (the no-probe runner-up,
# 64/16, needs 63% for 0.90 — near-random synthetic neighbors sit at
# cosine 0.27-0.39 where every LSH s-curve is flat, so recall is
# bought with candidates, not signature bits).
_SRP_PLANES = 128
_SRP_BANDS = 16
_SRP_RPB = _SRP_PLANES // _SRP_BANDS
_SRP_FLIPS = 1

# The full SRP-LSH scored-candidates CTE chain (signature -> band keys
# -> multi-probe -> candidate join -> exact cosine), shared by the
# plain top-k oracle, the two-stage rerank pipeline's oracle, and the
# contrastive miner's oracle: the hyperplane signs come from md5
# parity (engine-stable) and the projection bits from fixed-point
# int64 dots (floor(x*1e6 + 0.5) quantized vectors; every intermediate
# < 2^53 so DuckDB's double SUM is exact too), so the WHOLE
# approximate pipeline is reproducible in SQL.  Ends with
# scored(query_id, cand_id, cosine).
#
# ``qp`` is the query-set predicate as a format template over the
# vec_id column reference (``{v}``): the default is the deterministic
# mod sample; the contrastive miner anchors on an earlier CTE
# (``{v} IN (SELECT id FROM anchors)``).
def _srp_scored_ctes(qp: str = "{v} % " + f"{_QUERY_MOD} = 0") -> str:
    return f"""
    u AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    ),
    qv AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * 1000000 + 0.5)) AS q
        FROM embeddings
    ),
    planes AS (
        SELECT p.range AS p,
               list_transform(range(64), d ->
                   CASE WHEN CAST(('0x' || substr(md5(
                            CAST(p.range AS VARCHAR) || ':' || CAST(d AS VARCHAR)
                        ), 1, 8)) AS BIGINT) & 1 = 1
                        THEN 1.0 ELSE -1.0 END) AS s
        FROM range({_SRP_PLANES}) p
    ),
    dots AS (
        SELECT v.vec_id, pl.p, list_dot_product(pl.s, v.q) AS dot
        FROM qv v CROSS JOIN planes pl
    ),
    keys AS (
        SELECT vec_id, CAST(p // {_SRP_RPB} AS INT) AS band,
               CAST(SUM(CASE WHEN dot > 0
                        THEN (CAST(1 AS BIGINT) << CAST({_SRP_RPB} - 1 - (p % {_SRP_RPB}) AS INT))
                        ELSE 0 END) AS BIGINT) AS key
        FROM dots GROUP BY vec_id, p // {_SRP_RPB}
    ),
    qprobe AS (
        SELECT vec_id, band, key FROM keys WHERE {qp.format(v="vec_id")}
        UNION
        SELECT k.vec_id, k.band,
               xor(k.key, CAST(1 AS BIGINT) << CAST(f.range AS INT)) AS key
        FROM keys k CROSS JOIN range({_SRP_RPB}) f
        WHERE {qp.format(v="k.vec_id")}
    ),
    cand AS (
        SELECT DISTINCT kq.vec_id AS query_id, kc.vec_id AS cand_id
        FROM qprobe kq JOIN keys kc ON kq.band = kc.band AND kq.key = kc.key
        WHERE kq.vec_id <> kc.vec_id
    ),
    scored AS (
        SELECT c.query_id, c.cand_id,
               ROUND(list_dot_product(qu.uv, cu.uv), 4) AS cosine
        FROM cand c
        JOIN u qu ON qu.vec_id = c.query_id
        JOIN u cu ON cu.vec_id = c.cand_id
    )
"""


_SRP_SCORED_CTES = _srp_scored_ctes()


@query(
    "ann_topk_srp_lsh",
    # Exact oracle (upgraded from rows-only in r4): the shared
    # _SRP_SCORED_CTES chain is engine-exact end to end — see the
    # fragment comment.  Same pattern that gave ann_topk_ivf its
    # oracle in r2.
    oracle=f"""
    WITH {_SRP_SCORED_CTES}
    SELECT query_id, cand_id, cosine FROM (
        SELECT query_id, cand_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, cand_id) AS rn
        FROM scored
    ) WHERE rn <= {_K}
    ORDER BY query_id, cosine DESC, cand_id
    """,
    doc="approximate cosine top-k via signed-random-projection LSH "
    "(128 deterministic md5-parity hyperplanes, 16 bands, 1-flip "
    "query-side multi-probe per Lv et al. VLDB'07): map-only "
    "signatures over fixed-point int64 vectors (engine-exact bits), "
    "(band, key) equi-join candidates, exact rerank — the full "
    "approximate pipeline hash-checks against a SQL oracle "
    "(extension: ANN scale path; same contract as ann_topk_ivf)",
)
def ann_topk_srp_lsh(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    return srp_lsh_topk(
        qs, e, _K, n_planes=_SRP_PLANES, n_bands=_SRP_BANDS,
        n_probe_flips=_SRP_FLIPS,
    ).orderBy("query_id", F.desc("cosine"), "cand_id")


_CE_POOL = 20  # stage-1 candidate budget per query (caps stage-2 cost)


@query(
    "retrieval_two_stage_ce",
    # Stage 1 is the shared engine-exact SRP chain cut at rn <= pool;
    # stage 2's features are integer-exact (distinct-token posting
    # intersection) or already-rounded doubles.  The blend is the
    # UNWEIGHTED SUM, not the 0.5/0.5 mean: the mean of two 4-dp
    # values lands exactly on x.xxxx5 rounding boundaries (measured:
    # 0.5*0.2673 + 0.5*0.6154 rounds 0.4413 in Spark, 0.4414 in
    # DuckDB), while the sum sits ~1e-16 from a 4-dp grid POINT —
    # maximally far from any boundary — and ranks identically.
    oracle=f"""
    WITH {_SRP_SCORED_CTES},
    pool AS (
        SELECT query_id, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rn
            FROM scored
        ) WHERE rn <= {_CE_POOL}
    ),
    tok AS (SELECT doc_id, list_distinct({_DD_TOKS}) AS tk FROM documents),
    tsz AS (SELECT doc_id, len(tk) AS n FROM tok),
    tposting AS (SELECT doc_id, unnest(tk) AS term FROM tok),
    pinter AS (
        SELECT p.query_id, p.cand_id, COUNT(*) AS c
        FROM pool p
        JOIN tposting a ON a.doc_id = p.query_id
        JOIN tposting b ON b.doc_id = p.cand_id AND b.term = a.term
        GROUP BY p.query_id, p.cand_id
    ),
    feat AS (
        SELECT p.query_id, p.cand_id, p.cosine,
               CASE WHEN (qa.n + qb.n - COALESCE(pi.c, 0)) = 0
                    THEN CAST(0.0 AS DOUBLE)
                    ELSE ROUND(COALESCE(pi.c, 0) * 1.0
                               / (qa.n + qb.n - COALESCE(pi.c, 0)), 4)
               END AS tok_jaccard
        FROM pool p
        LEFT JOIN pinter pi
            ON pi.query_id = p.query_id AND pi.cand_id = p.cand_id
        JOIN tsz qa ON qa.doc_id = p.query_id
        JOIN tsz qb ON qb.doc_id = p.cand_id
    ),
    ce AS (
        SELECT query_id, cand_id, cosine, tok_jaccard,
               ROUND(cosine + tok_jaccard, 4) AS ce_score
        FROM feat
    )
    SELECT query_id, cand_id, cosine, tok_jaccard, ce_score FROM (
        SELECT query_id, cand_id, cosine, tok_jaccard, ce_score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY ce_score DESC, cand_id) AS rn
        FROM ce
    ) WHERE rn <= {_K}
    ORDER BY query_id, ce_score DESC, cand_id
    """,
    doc="budgeted two-stage retrieval pipeline END TO END (VERDICT r8 "
    "next #7): stage 1 retrieves a pool of 20 candidates per query "
    "via the retuned SRP-LSH index (multi-probe band join + exact "
    "cosine), stage 2 re-scores every pooled pair with a "
    "cross-encoder-STYLE exact pairwise interaction — distinct-token "
    "overlap Jaccard between the two documents' texts, blended "
    "equal-weight (rank-identical unweighted sum) with the dense cosine — and keeps the blended top-5. "
    "The scorer is a deterministic stand-in for a learned "
    "cross-encoder forward pass (no model weights in-container), but "
    "the SHAPE is the production one: the pool budget caps stage-2 "
    "cost at |queries| x 20 pairs regardless of corpus size, pair "
    "features join against the corpus only through the broadcast "
    "pool, and the final rerank is a WindowGroupLimit top-k "
    "(extension: closes the retrieval story — index, probe, pool, "
    "rerank in one plan)",
)
def retrieval_two_stage_ce(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    pool = srp_lsh_topk(
        qs, e, _CE_POOL, n_planes=_SRP_PLANES, n_bands=_SRP_BANDS,
        n_probe_flips=_SRP_FLIPS,
    )
    toks = d.select(
        "doc_id", F.array_distinct(ws_tokens(F.lower(F.col("text")))).alias("tk")
    )
    # pool is bounded (|queries| x pool budget), so BOTH feature
    # attachments stream the corpus token relation past a broadcast of
    # the pool side — the corpus is never shuffled for stage 2
    with_q = toks.select(
        F.col("doc_id").alias("query_id"), F.col("tk").alias("tk_q")
    ).join(F.broadcast(pool), "query_id")
    pairs = toks.select(
        F.col("doc_id").alias("cand_id"), F.col("tk").alias("tk_c")
    ).join(F.broadcast(with_q), "cand_id")
    inter = F.size(F.array_intersect("tk_q", "tk_c"))
    union = F.size("tk_q") + F.size("tk_c") - inter
    feat = pairs.withColumn(
        "tok_jaccard",
        F.when(union == 0, F.lit(0.0)).otherwise(F.round(inter / union, 4)),
    ).withColumn(
        "ce_score",
        F.round(F.col("cosine") + F.col("tok_jaccard"), 4),
    ).select("query_id", "cand_id", "cosine", "tok_jaccard", "ce_score")
    top = topk_per_group(
        feat, ["query_id"], [F.desc("ce_score"), F.asc("cand_id")], _K
    )
    return top.orderBy("query_id", F.desc("ce_score"), "cand_id")


@query(
    "ann_topk_pq",
    oracle=None,  # approximate candidate set => rows-only driver check;
    # recall vs brute force is asserted in tests/test_retrieval.py
    doc="approximate cosine top-k via product quantization (Jegou et al., "
    "TPAMI 2011): per-subspace codebook fitted with deterministic L2 "
    "Lloyd over a bounded training stripe (operators/kmeans.py, "
    "VERDICT r2 next #8), map-only encode to m codes/vector, ADC "
    "lookup-table scoring with per-batch partial top-k, exact rerank "
    "of candidates — the memory-bounded serving shape (m bytes/vector "
    "instead of 4d) (extension: ANN scale path; same contract as "
    "ann_topk_ivf)",
)
def ann_topk_pq(spark, sf_dir):
    from qaapi_spark.operators.retrieval import pq_topk

    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    return pq_topk(qs, e, _K, train_iters=10).orderBy(
        "query_id", F.desc("cosine"), "cand_id"
    )


_PQ_M = 16  # subspaces (dim 64 -> dsub 4)
_PQ_KSUB = 64
_PQ_NKEEP = _K * 8  # k * rerank_factor


@query(
    "ann_topk_pq_sampled",
    # Exact oracle for the full PQ pipeline (VERDICT r4 next #3, the
    # SRP recipe of commit fcc01ef): with the SAMPLED codebook the
    # whole chain is fixed-point int64 — unit vectors quantized via
    # floor(uv * 1e6 + 0.5) (sequential-fold norms on both engines),
    # codebook = first ksub rows of the vec_id%2 stripe, encode argmin
    # over exact integer L2 (ties -> lowest code), ADC tables and sums
    # exact integers < 2^53 — so signature, candidate cut (top-40 on
    # approx DESC, cand_id; the Spark kernel's per-batch cut is
    # deterministic under the same order), and exact rerank all
    # reproduce in SQL.  The Lloyd-trained configuration stays in
    # ann_topk_pq (rows-only + recall test).
    oracle=f"""
    WITH u AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    ),
    z AS MATERIALIZED (
        SELECT vec_id, list_transform(uv, x -> floor(x * 1000000 + 0.5)) AS zv
        FROM u
    ),
    cb AS MATERIALIZED (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, zv
        FROM (SELECT vec_id, zv FROM z WHERE vec_id % 2 = 0
              ORDER BY vec_id LIMIT {_PQ_KSUB})
    ),
    subs AS (SELECT CAST(j.range AS BIGINT) AS j FROM range({_PQ_M}) j),
    cbs AS MATERIALIZED (
        SELECT code, j, list_slice(zv, j * 4 + 1, j * 4 + 4) AS cs
        FROM cb CROSS JOIN subs
    ),
    zs AS MATERIALIZED (
        SELECT vec_id, j, list_slice(zv, j * 4 + 1, j * 4 + 4) AS vs
        FROM z CROSS JOIN subs
    ),
    enc AS MATERIALIZED (
        SELECT vec_id, j, code FROM (
            SELECT zs.vec_id, zs.j, cbs.code,
                   ROW_NUMBER() OVER (PARTITION BY zs.vec_id, zs.j
                       ORDER BY list_dot_product(cbs.cs, cbs.cs)
                                - 2 * list_dot_product(zs.vs, cbs.cs),
                                cbs.code) AS rn
            FROM zs JOIN cbs USING (j)
        ) WHERE rn = 1
    ),
    tab AS MATERIALIZED (
        SELECT q.vec_id AS query_id, cbs.j, cbs.code,
               list_dot_product(q.vs, cbs.cs) AS tval
        FROM zs q JOIN cbs USING (j)
        WHERE q.vec_id % {_QUERY_MOD} = 0
    ),
    approx AS MATERIALIZED (
        SELECT tab.query_id, enc.vec_id AS cand_id, SUM(tab.tval) AS approx
        FROM enc JOIN tab ON tab.j = enc.j AND tab.code = enc.code
        GROUP BY tab.query_id, enc.vec_id
    ),
    cand AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx DESC, cand_id) AS rn
            FROM approx
        ) WHERE rn <= {_PQ_NKEEP}
    ),
    scored AS (
        SELECT c.query_id, c.cand_id,
               ROUND(list_dot_product(qu.uv, cu.uv), 4) AS cosine
        FROM cand c
        JOIN u qu ON qu.vec_id = c.query_id
        JOIN u cu ON cu.vec_id = c.cand_id
        WHERE c.query_id <> c.cand_id
    )
    SELECT query_id, cand_id, cosine FROM (
        SELECT query_id, cand_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, cand_id) AS rn
        FROM scored
    ) WHERE rn <= {_K}
    ORDER BY query_id, cosine DESC, cand_id
    """,
    doc="product-quantization ANN with the deterministic SAMPLED "
    "codebook: map-only int64 encode (16 codes/vector), exact-integer "
    "ADC scoring with a deterministic per-batch partial top-40, exact "
    "rerank — every stage of the approximate pipeline hash-checks "
    "against a SQL oracle; the memory-bounded serving shape "
    "(m bytes/vector) at 100 TB streams codes, never vectors "
    "(extension: ANN scale path; cf. ann_topk_pq for the "
    "Lloyd-trained codebook)",
)
def ann_topk_pq_sampled(spark, sf_dir):
    from qaapi_spark.operators.retrieval import pq_topk

    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    return pq_topk(
        qs, e, _K, m=_PQ_M, ksub=_PQ_KSUB, train_iters=0
    ).orderBy("query_id", F.desc("cosine"), "cand_id")


@query(
    "corpus_profile_by_source_lang",
    oracle=f"""
    SELECT source, lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(len({_DD_TOKS})) AS DOUBLE) / COUNT(*), 4) AS avg_tokens
    FROM documents GROUP BY source, lang
    ORDER BY source, lang
    """,
    doc="corpus profiling: per (source, lang) doc counts, char volume, "
    "mean token length — the partition-planning stats a 100 TB corpus "
    "job reads first; exact integer sums divided once "
    "(extension: corpus analytics)",
)
def corpus_profile_by_source_lang(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.select(
            "source", "lang", "n_chars", F.size(ws_tokens(F.lower(F.col("text")))).alias("ntok")
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(
                F.sum("ntok").cast("double") / F.count("*"), 4
            ).alias("avg_tokens"),
        )
        .orderBy("source", "lang")
    )


_IVFPQ_MOD = 37
_IVFPQ_NPROBE = 5   # coarse recall is the binding constraint (SCALE.md)
_IVFPQ_NKEEP = _K * 32
_DIM = 64


@query(
    "ann_topk_ivfpq",
    # IVFADC (Jegou et al. 2011 §V) with every stage SQL-reproducible:
    # coarse assignment/probing by rounded cosine against the sampled
    # centroid stripe (the ann_topk_ivf recipe), residuals in the
    # fixed-point int64 space (z_v - z_cell), residual PQ codebook from
    # the first ksub stripe rows, exact-integer encode/ADC (every sum
    # < 2^53), deterministic candidate cut, exact rerank.
    oracle=f"""
    WITH u AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    ),
    z AS MATERIALIZED (
        SELECT vec_id, list_transform(uv, x -> floor(x * 1000000 + 0.5)) AS zv
        FROM u
    ),
    cents AS MATERIALIZED (
        SELECT u.vec_id AS centroid_id, u.uv AS cuv, z.zv AS czv
        FROM u JOIN z USING (vec_id) WHERE u.vec_id % {_IVFPQ_MOD} = 0
    ),
    assigned AS MATERIALIZED (
        SELECT cand_id, centroid_id FROM (
            SELECT v.vec_id AS cand_id, ct.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY ROUND(list_dot_product(v.uv, ct.cuv), 4) DESC,
                                ct.centroid_id) AS rn
            FROM u v CROSS JOIN cents ct
        ) WHERE rn = 1
    ),
    res AS MATERIALIZED (
        SELECT z.vec_id, a.centroid_id,
               list_transform(range({_DIM}), i -> z.zv[i + 1] - ct.czv[i + 1]) AS rv
        FROM z JOIN assigned a ON a.cand_id = z.vec_id
        JOIN cents ct ON ct.centroid_id = a.centroid_id
    ),
    seeds AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, vec_id
        FROM (SELECT vec_id FROM z WHERE vec_id % 2 = 0 ORDER BY vec_id LIMIT {_PQ_KSUB})
    ),
    subs AS (SELECT CAST(j.range AS BIGINT) AS j FROM range({_PQ_M}) j),
    cbs AS MATERIALIZED (
        SELECT s.code, sub.j, list_slice(r.rv, sub.j * 4 + 1, sub.j * 4 + 4) AS cs
        FROM seeds s JOIN res r ON r.vec_id = s.vec_id CROSS JOIN subs sub
    ),
    rss AS MATERIALIZED (
        SELECT vec_id, centroid_id, j, list_slice(rv, j * 4 + 1, j * 4 + 4) AS vs
        FROM res CROSS JOIN subs
    ),
    enc AS MATERIALIZED (
        SELECT vec_id, centroid_id, j, code FROM (
            SELECT rss.vec_id, rss.centroid_id, rss.j, cbs.code,
                   ROW_NUMBER() OVER (PARTITION BY rss.vec_id, rss.j
                       ORDER BY list_dot_product(cbs.cs, cbs.cs)
                                - 2 * list_dot_product(rss.vs, cbs.cs),
                                cbs.code) AS rn
            FROM rss JOIN cbs USING (j)
        ) WHERE rn = 1
    ),
    probes AS MATERIALIZED (
        SELECT query_id, centroid_id FROM (
            SELECT q.vec_id AS query_id, ct.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.uv, ct.cuv), 4) DESC,
                                ct.centroid_id) AS rn
            FROM u q CROSS JOIN cents ct WHERE q.vec_id % {_QUERY_MOD} = 0
        ) WHERE rn <= {_IVFPQ_NPROBE}
    ),
    qres AS MATERIALIZED (
        SELECT p.query_id, p.centroid_id, sub.j,
               list_slice(list_transform(range({_DIM}),
                          i -> z.zv[i + 1] - ct.czv[i + 1]),
                          sub.j * 4 + 1, sub.j * 4 + 4) AS qs
        FROM probes p JOIN z ON z.vec_id = p.query_id
        JOIN cents ct ON ct.centroid_id = p.centroid_id
        CROSS JOIN subs sub
    ),
    tab AS MATERIALIZED (
        SELECT q.query_id, q.centroid_id, q.j, cbs.code,
               list_dot_product(q.qs, cbs.cs) AS tval
        FROM qres q JOIN cbs USING (j)
    ),
    approx AS MATERIALIZED (
        SELECT t.query_id, e.vec_id AS cand_id, SUM(t.tval) AS approx
        FROM enc e
        JOIN tab t ON t.centroid_id = e.centroid_id AND t.j = e.j AND t.code = e.code
        GROUP BY t.query_id, e.vec_id
    ),
    cand AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY approx DESC, cand_id) AS rn
            FROM approx
        ) WHERE rn <= {_IVFPQ_NKEEP}
    ),
    scored AS (
        SELECT c.query_id, c.cand_id,
               ROUND(list_dot_product(qu.uv, cu.uv), 4) AS cosine
        FROM cand c
        JOIN u qu ON qu.vec_id = c.query_id
        JOIN u cu ON cu.vec_id = c.cand_id
        WHERE c.query_id <> c.cand_id
    )
    SELECT query_id, cand_id, cosine FROM (
        SELECT query_id, cand_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, cand_id) AS rn
        FROM scored
    ) WHERE rn <= {_K}
    ORDER BY query_id, cosine DESC, cand_id
    """,
    doc="IVF + residual product quantization (IVFADC, Jegou et al. "
    "2011): coarse cells from the sampled centroid stripe, residual "
    "codes from an int64 fixed-point subquantizer, per-(query, cell) "
    "ADC lookup tables over only the nprobe probed cells, exact "
    "rerank — the composed FAISS-style serving index, and every "
    "stage hash-checks against one SQL oracle; at 100 TB the "
    "(cell, codes) relation is the index and a query reads "
    "~nprobe/n_cells of it (extension: ANN scale path)",
)
def ann_topk_ivfpq(spark, sf_dir):
    from qaapi_spark.operators.retrieval import ivfpq_topk

    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    return ivfpq_topk(
        qs, e, _K, n_centroids_mod=_IVFPQ_MOD, nprobe=_IVFPQ_NPROBE,
        m=_PQ_M, ksub=_PQ_KSUB, rerank_factor=_IVFPQ_NKEEP // _K,
    ).orderBy("query_id", F.desc("cosine"), "cand_id")


_RRF_C = 60
_HYB_POOL = 20
_HYB_K = 10
_HYB_QUANT = 1000  # fixed-point scale for the dense lexical GEMM


@query(
    "hybrid_search_rrf",
    # Exactness recipe: tf-idf weights snap to 6dp then quantize to
    # int64 fixed-point (floor(w*1000+0.5) — identical IEEE ops both
    # engines), so dense-vector dots and norms are exact integer
    # arithmetic (< 2^53; order-free), the cosine divides two
    # bit-identical doubles and snaps to 4dp before ranking, and the
    # RRF score is a sum of 1/(60+rank) terms over integer ranks —
    # identical doubles on both engines, so selection and ordering
    # reproduce exactly.
    oracle=f"""
    WITH {_DD_TF},
    dfreq AS (SELECT term, COUNT(*) AS df_count FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n FROM documents),
    w AS MATERIALIZED (
        SELECT doc_id AS id, tf.term,
               ROUND(tf * ln(CAST(n.n AS DOUBLE) / df_count), 6) AS w
        FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN n
    ),
    dict AS MATERIALIZED (
        SELECT term, ROW_NUMBER() OVER (ORDER BY term) AS ti
        FROM (SELECT DISTINCT term FROM w)
    ),
    zz AS (SELECT id, term, CAST(floor(w * {_HYB_QUANT} + 0.5) AS BIGINT) AS z
           FROM w),
    ids AS (SELECT DISTINCT id FROM w),
    dv AS MATERIALIZED (
        SELECT id, list(CAST(v AS DOUBLE) ORDER BY ti) AS v FROM (
            SELECT ids.id, d.ti, COALESCE(zz.z, 0) AS v
            FROM ids CROSS JOIN dict d
            LEFT JOIN zz ON zz.id = ids.id AND zz.term = d.term
        ) GROUP BY id
    ),
    nrm AS MATERIALIZED (
        SELECT id, sqrt(list_dot_product(v, v)) AS nrm FROM dv
    ),
    lex AS (
        SELECT qid, did, lr FROM (
            SELECT q.id AS qid, c.id AS did,
                   ROW_NUMBER() OVER (PARTITION BY q.id
                       ORDER BY ROUND(list_dot_product(q.v, c.v)
                                      / (qn.nrm * cn.nrm), 4) DESC,
                                c.id) AS lr
            FROM dv q JOIN dv c ON q.id % {_QUERY_MOD} = 0 AND q.id <> c.id
            JOIN nrm qn ON qn.id = q.id
            JOIN nrm cn ON cn.id = c.id
        ) WHERE lr <= {_HYB_POOL}
    ),
    u AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    ),
    dense AS (
        SELECT query_id, cand_id, dr FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.uv, c.uv), 4) DESC,
                                c.vec_id) AS dr
            FROM u q JOIN u c ON q.vec_id % {_QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
        ) WHERE dr <= {_HYB_POOL}
    ),
    fused AS (
        SELECT COALESCE(l.qid, d.query_id) AS qid,
               COALESCE(l.did, d.cand_id) AS did,
               COALESCE(CAST(1 AS DOUBLE) / (CAST({_RRF_C} AS DOUBLE) + l.lr),
                        CAST(0 AS DOUBLE))
               + COALESCE(CAST(1 AS DOUBLE) / (CAST({_RRF_C} AS DOUBLE) + d.dr),
                          CAST(0 AS DOUBLE)) AS rrf,
               l.lr AS lr, d.dr AS dr
        FROM lex l FULL OUTER JOIN dense d
          ON l.qid = d.query_id AND l.did = d.cand_id
    )
    SELECT qid, did, ROUND(rrf, 6) AS rrf,
           CAST(lr AS BIGINT) AS lex_rank, CAST(dr AS BIGINT) AS dense_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY rrf DESC, did) AS rn
          FROM fused)
    WHERE rn <= {_HYB_K}
    ORDER BY qid, rrf DESC, did
    """,
    doc="hybrid retrieval with reciprocal-rank fusion (Cormack et al. "
    "SIGIR'09): a lexical tf-idf-cosine ranking (dense fixed-point "
    "GEMM over the bounded shared vocabulary — the posting join "
    "degenerates on hot-vocab corpora, measured 77s at 4x docs) "
    "fused with the dense embedding ranking (streamed-corpus GEMM "
    "top-k) via 1/(60+rank) — the standard dense+sparse serving "
    "pattern; aligned doc_id==vec_id corpora; integer-exact dots "
    "make the whole fusion hash-reproducible "
    "(extension: hybrid search)",
)
def hybrid_search_rrf(spark, sf_dir):
    from pyspark.sql.window import Window

    from qaapi_spark.operators.retrieval import tfidf_cosine_topk_dense
    from qaapi_spark.operators.similarity import cosine_topk_bruteforce

    d = t(spark, sf_dir, "documents")
    e = t(spark, sf_dir, "embeddings")

    # Lexical side: dense fixed-point GEMM over the bounded shared
    # vocabulary (tfidf_cosine_topk_dense) — the posting-join
    # formulation degenerates to ~|queries| x |corpus| x |vocab| joined
    # rows on a hot-vocab corpus (measured 77 s at 4x docs; the
    # jaccard dense-regime argument applied to weighted vectors).
    lwin = Window.partitionBy("qid").orderBy(F.desc("ls"), F.asc("did"))
    lexr = (
        tfidf_cosine_topk_dense(
            d, _QUERY_MOD, _HYB_POOL,
            n_docs=footer_rows(f"{sf_dir}/documents.parquet"),
        )
        .withColumn("lr", F.row_number().over(lwin))
        .select("qid", "did", "lr")
    )

    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    dense = cosine_topk_bruteforce(qs, e, _HYB_POOL)
    dwin = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    denser = (
        dense.withColumn("dr", F.row_number().over(dwin))
        .select(F.col("query_id").alias("qid"), F.col("cand_id").alias("did"), "dr")
    )

    c = float(_RRF_C)
    fused = lexr.join(denser, ["qid", "did"], "full_outer").withColumn(
        "rrf",
        F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("lr")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("dr")), F.lit(0.0)),
    )
    top = topk_per_group(fused, ["qid"], [F.desc("rrf"), F.asc("did")], _HYB_K)
    return top.select(
        "qid", "did",
        F.round("rrf", 6).alias("rrf"),
        F.col("lr").cast("long").alias("lex_rank"),
        F.col("dr").cast("long").alias("dense_rank"),
    ).orderBy("qid", F.desc("rrf"), "did")


@query(
    "stream_pq_encode",
    # the sampled codebook is fixed at index-build time and the encode
    # is exact int64 arithmetic, so a micro-batch's codes depend only
    # on (batch, broadcast codebook) and the streamed store equals the
    # batch encode relation — the `enc` CTE of ann_topk_pq_sampled's
    # oracle, exploded to one row per (vector, subspace).
    oracle=f"""
    WITH u AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    ),
    z AS MATERIALIZED (
        SELECT vec_id, list_transform(uv, x -> floor(x * 1000000 + 0.5)) AS zv
        FROM u
    ),
    cb AS MATERIALIZED (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS code, zv
        FROM (SELECT vec_id, zv FROM z WHERE vec_id % 2 = 0
              ORDER BY vec_id LIMIT {_PQ_KSUB})
    ),
    subs AS (SELECT CAST(j.range AS BIGINT) AS j FROM range({_PQ_M}) j),
    cbs AS MATERIALIZED (
        SELECT code, j, list_slice(zv, j * 4 + 1, j * 4 + 4) AS cs
        FROM cb CROSS JOIN subs
    ),
    zs AS MATERIALIZED (
        SELECT vec_id, j, list_slice(zv, j * 4 + 1, j * 4 + 4) AS vs
        FROM z CROSS JOIN subs
    )
    SELECT vec_id, CAST(j AS INT) AS j, code FROM (
        SELECT zs.vec_id, zs.j, cbs.code,
               ROW_NUMBER() OVER (PARTITION BY zs.vec_id, zs.j
                   ORDER BY list_dot_product(cbs.cs, cbs.cs)
                            - 2 * list_dot_product(zs.vs, cbs.cs),
                            cbs.code) AS rn
        FROM zs JOIN cbs USING (j)
    ) WHERE rn = 1
    ORDER BY vec_id, j
    """,
    doc="incremental PQ code maintenance as a stream: embedding "
    "micro-batches compress MAP-ONLY to m int codes against the fixed "
    "broadcast sampled codebook and append to an epoch-keyed code "
    "store — the compressed serving index absorbs new vectors without "
    "touching existing codes, and the store hash-checks against the "
    "batch encode SQL (extension, SURVEY §2.9; pairs with "
    "stream_ivf_assign for the IVFADC maintenance story)",
)
def stream_pq_encode_q(spark, sf_dir):
    from qaapi_spark.streaming.incremental import stream_pq_encode

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return stream_pq_encode(
        spark, f"{sf_dir}/embeddings.parquet", m=_PQ_M, ksub=_PQ_KSUB
    ).orderBy("vec_id", "j")


@query(
    "ann_recall_eval_srp",
    # Composes the two existing exact oracles (brute-force cosine
    # top-k; the fully-portable SRP-LSH pipeline) and compares them
    # with INTEGER arithmetic: total/min recall are single divisions
    # of exact integer counts, so no float-summation order can flip
    # the 4 dp rounding.
    oracle=f"""
    WITH u AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    ),
    brute AS (
        SELECT query_id, cand_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.uv, c.uv), 4) DESC,
                                c.vec_id) AS rn
            FROM u q JOIN u c
              ON q.vec_id % {_QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
        ) WHERE rn <= {_K}
    ),
    qv AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> floor(CAST(x AS DOUBLE) * 1000000 + 0.5)) AS q
        FROM embeddings
    ),
    planes AS (
        SELECT p.range AS p,
               list_transform(range(64), d ->
                   CASE WHEN CAST(('0x' || substr(md5(
                            CAST(p.range AS VARCHAR) || ':' || CAST(d AS VARCHAR)
                        ), 1, 8)) AS BIGINT) & 1 = 1
                        THEN 1.0 ELSE -1.0 END) AS s
        FROM range({_SRP_PLANES}) p
    ),
    dots AS (
        SELECT v.vec_id, pl.p, list_dot_product(pl.s, v.q) AS dot
        FROM qv v CROSS JOIN planes pl
    ),
    keys AS (
        SELECT vec_id, CAST(p // {_SRP_RPB} AS INT) AS band,
               CAST(SUM(CASE WHEN dot > 0
                        THEN (CAST(1 AS BIGINT) << CAST({_SRP_RPB} - 1 - (p % {_SRP_RPB}) AS INT))
                        ELSE 0 END) AS BIGINT) AS key
        FROM dots GROUP BY vec_id, p // {_SRP_RPB}
    ),
    qprobe AS (
        SELECT vec_id, band, key FROM keys WHERE vec_id % {_QUERY_MOD} = 0
        UNION
        SELECT k.vec_id, k.band,
               xor(k.key, CAST(1 AS BIGINT) << CAST(f.range AS INT)) AS key
        FROM keys k CROSS JOIN range({_SRP_RPB}) f
        WHERE k.vec_id % {_QUERY_MOD} = 0
    ),
    cand AS (
        SELECT DISTINCT kq.vec_id AS query_id, kc.vec_id AS cand_id
        FROM qprobe kq JOIN keys kc ON kq.band = kc.band AND kq.key = kc.key
        WHERE kq.vec_id <> kc.vec_id
    ),
    lsh AS (
        SELECT query_id, cand_id FROM (
            SELECT c.query_id, c.cand_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.query_id
                       ORDER BY ROUND(list_dot_product(qu.uv, cu.uv), 4) DESC,
                                c.cand_id) AS rn
            FROM cand c
            JOIN u qu ON qu.vec_id = c.query_id
            JOIN u cu ON cu.vec_id = c.cand_id
        ) WHERE rn <= {_K}
    ),
    per_q AS (
        SELECT b.query_id,
               COUNT(*) AS n_true,
               SUM(CASE WHEN l.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM brute b
        LEFT JOIN lsh l
          ON l.query_id = b.query_id AND l.cand_id = b.cand_id
        GROUP BY b.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(SUM(n_hit) * 1.0 / SUM(n_true), 4) AS recall_at_k,
           ROUND(MIN(n_hit * 1.0 / n_true), 4) AS min_query_recall,
           CAST(SUM(CASE WHEN n_hit = n_true THEN 1 ELSE 0 END) AS BIGINT)
               AS n_perfect_queries
    FROM per_q
    """,
    doc="ANN self-evaluation: recall@k of the SRP-LSH pipeline against "
    "the exact brute-force top-k, computed IN-ENGINE (left-semi-style "
    "join of the two result relations, integer-exact recall "
    "aggregates) — the eval harness a 100 TB vector deployment runs "
    "per index build to pick nprobe/bands; both legs reuse the "
    "catalog kernels, so the eval costs one extra bounded join over "
    "queries x k rows (extension: ANN evaluation)",
)
def ann_recall_eval_srp(spark, sf_dir):
    from qaapi_spark.operators.similarity import cosine_topk_bruteforce

    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    brute = cosine_topk_bruteforce(qs, e, _K).select("query_id", "cand_id")
    lsh = srp_lsh_topk(
        qs, e, _K, n_planes=_SRP_PLANES, n_bands=_SRP_BANDS,
        n_probe_flips=_SRP_FLIPS,
    ).select("query_id", F.col("cand_id").alias("lsh_cand"))
    per_q = (
        brute.join(
            lsh,
            (brute["query_id"] == lsh["query_id"])
            & (brute["cand_id"] == lsh["lsh_cand"]),
            "left",
        )
        .select(brute["query_id"].alias("qid"), "lsh_cand")
        .groupBy("qid")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.col("lsh_cand").isNotNull().cast("long")).alias("n_hit"),
        )
    )
    return per_q.agg(
        F.count("*").alias("n_queries"),
        F.round(F.sum("n_hit") / F.sum("n_true"), 4).alias("recall_at_k"),
        F.round(F.min(F.col("n_hit") / F.col("n_true")), 4).alias(
            "min_query_recall"
        ),
        F.sum((F.col("n_hit") == F.col("n_true")).cast("long")).alias(
            "n_perfect_queries"
        ),
    )


# ---------------------------------------------------------------------------
# Contrastive training-pair mining (indexed default, round 10)
# ---------------------------------------------------------------------------

_HARD_NEG_K = 3
_MINE_POOL = 20  # stage-1 candidate budget per anchor (caps exact scoring)

# Shared mining CTEs: the exact near-dup positives, the anchor set they
# induce, and the partner-exclusion relation.  Chained in front of the
# anchored SRP fragment by both mining oracles.
def _mine_base_ctes() -> str:
    return f"""{_DD_JACCARD_PAIRS},
    jpairs AS (
        SELECT i.id_a, i.id_b,
               ROUND(i.inter * 1.0 / (sa.set_size + sb.set_size - i.inter), 4)
                   AS jaccard
        FROM inter i
        JOIN sizes sa ON i.id_a = sa.id
        JOIN sizes sb ON i.id_b = sb.id
        WHERE ROUND(i.inter * 1.0 / (sa.set_size + sb.set_size - i.inter), 4)
              >= {_JACCARD_THRESHOLD}
    ),
    anchors AS (
        SELECT DISTINCT id FROM (
            SELECT id_a AS id FROM jpairs UNION ALL SELECT id_b FROM jpairs
        )
    ),
    partners AS (
        SELECT id_a AS query_id, id_b AS cand_id FROM jpairs
        UNION ALL
        SELECT id_b, id_a FROM jpairs
    )"""


def _mine_pool_hard_ctes() -> str:
    """Anchored SRP chain -> per-anchor candidate pool -> partner
    anti-join -> top-k hard negatives.  Ends with hard(query_id,
    cand_id, cosine)."""
    return f"""{_srp_scored_ctes("{v} IN (SELECT id FROM anchors)")},
    pool AS (
        SELECT query_id, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rn
            FROM scored
        ) WHERE rn <= {_MINE_POOL}
    ),
    inegs AS (
        SELECT g.query_id, g.cand_id, g.cosine
        FROM pool g
        LEFT JOIN partners p
            ON p.query_id = g.query_id AND p.cand_id = g.cand_id
        WHERE p.query_id IS NULL
    ),
    hard AS (
        SELECT query_id, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rn
            FROM inegs
        ) WHERE rn <= {_HARD_NEG_K}
    )"""


def _corpus_rows(sf_dir, e):
    """Exact embeddings-corpus row count from parquet footer metadata
    (driver-side, no Spark job — num_rows is mandatory file metadata,
    unlike column stats, so no exactness caveat); falls back to the
    one-job count() when the path is unreadable.  Four miner sites
    paid a count() job each just to derive routing/IVF parameters."""
    import os

    n = footer_rows(os.path.join(sf_dir, "embeddings.parquet"))
    return n if n is not None else e.count()


def _mine_anchor_inputs(spark, sf_dir):
    """(pos, embeddings, anchor-queries, partners) shared by the miner
    and its recall eval."""
    from qaapi_spark.plans.llm_dedup import jaccard_pairs_kernel

    pos = jaccard_pairs_kernel(spark, sf_dir)
    e = t(spark, sf_dir, "embeddings")
    anchors = (
        pos.select(F.col("id_a").alias("vec_id"))
        .union(pos.select(F.col("id_b").alias("vec_id")))
        .distinct()
    )
    qs = e.join(anchors, "vec_id", "left_semi")
    partners = pos.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("cand_id")
    ).union(
        pos.select(F.col("id_b").alias("query_id"), F.col("id_a").alias("cand_id"))
    )
    return pos, e, qs, partners


# --- candidate-pool cost routing (VERDICT r10 next #2) ---------------
#
# The miner's stage-1 pool has two implementations with opposite cost
# curves, and neither dominates (measured round 10/11, SCALE.md):
#
#   SRP-LSH   recall@3 0.93 but its 8-bit band keys give 256 buckets
#             per band FOREVER — scored rows per anchor are a FIXED
#             ~45-56 % of the corpus, i.e. grow linearly with n.
#   IVF       tunable: k_cells grows with the corpus (occupancy
#             n/k_cells pinned), so touch is a dial.  Swept round 11
#             over (k_cells, nprobe, train stripe): occupancy 16 with
#             nprobe = ceil(3k/8) measures recall@3 0.80 (sf0.01,
#             n=500) / 0.84 (sf0.1, n=2000) at 37.5 % touch — over the
#             0.8 bar at <= 40 % touch (tools/sweep_miner_pool.py; the
#             old k=8/nprobe=3 config measured 0.66-0.70).
#
# Routing mirrors dedup._containment_regime: a pure decision from
# measured inputs, priced in the unit that actually hurts at 100 TB —
# scored candidate rows PER ANCHOR.  SRP's expected scored rows are
# n_bands * (1 + rows_per_band) probe buckets x n/2^rpb occupancy =
# 0.5625 n for the retuned 128/16/1-flip config; while that is within
# budget SRP wins on recall, beyond it the pool switches to IVF whose
# per-anchor touch the k_cells dial controls.  The decision input is
# ONE number (corpus count), so the DuckDB oracle reproduces the
# branch with a scalar-subquery CASE and the whole routed miner stays
# hash-checkable.
_MINE_TOUCH_BUDGET = 1024  # scored rows per anchor SRP may cost
_IVF_OCC = 16  # target corpus rows per IVF cell (k_cells = ceil(n/occ))
_IVF_TRAIN_CAP = 1024  # Lloyd training-stripe row cap (FAISS-style)
_MINE_IVF_ITERS = 3
_MINE_IVF_DP = 6

# SQL scalar twins of _mine_ivf_params / _mine_pool_regime — every
# adaptive knob derives from COUNT(*) so the static oracle string
# stays valid at any SF.
_K_CELLS_EXPR = (
    f"(SELECT CAST(CEIL(COUNT(*) / {_IVF_OCC}.0) AS BIGINT) FROM embeddings)"
)
_NPROBE_EXPR = (
    f"(SELECT CAST(CEIL(3 * CEIL(COUNT(*) / {_IVF_OCC}.0) / 8.0) AS BIGINT)"
    " FROM embeddings)"
)
_STRIDE_EXPR = (
    f"(SELECT CAST(CEIL(COUNT(*) / {_IVF_TRAIN_CAP}.0) AS BIGINT) FROM embeddings)"
)
_ROUTE_CTE = f"""route AS (
        SELECT CASE WHEN (SELECT COUNT(*) FROM embeddings)
                         * {_SRP_BANDS * (1 + _SRP_RPB)}.0 / {2 ** _SRP_RPB}
                    <= {_MINE_TOUCH_BUDGET}
               THEN 'srp' ELSE 'ivf' END AS r
    )"""


def _mine_pool_regime(
    n_corpus: int,
    n_bands: int = _SRP_BANDS,
    rows_per_band: int = _SRP_RPB,
    budget: int = _MINE_TOUCH_BUDGET,
) -> str:
    """Pure pool-route decision (unit-tested crossover): 'srp' while
    its expected scored rows per anchor — (1 + rows_per_band) probe
    keys x n_bands buckets x n/2^rpb expected occupancy — fit the
    budget, else 'ivf'.  Python mirror of _ROUTE_CTE."""
    srp_rows = n_corpus * n_bands * (1 + rows_per_band) / float(2**rows_per_band)
    return "srp" if srp_rows <= budget else "ivf"


def _mine_ivf_params(n_corpus: int) -> tuple[int, int, int]:
    """(k_cells, nprobe, train_stride) for the swept IVF pool config:
    occupancy-16 cells, nprobe = ceil(3k/8) (37.5 % touch), Lloyd
    trained on a <= _IVF_TRAIN_CAP-row mod-stripe.  Python mirror of
    _K_CELLS_EXPR / _NPROBE_EXPR / _STRIDE_EXPR."""
    k = -(-n_corpus // _IVF_OCC)
    nprobe = -(-3 * k // 8)
    stride = -(-n_corpus // _IVF_TRAIN_CAP)
    return int(k), int(nprobe), int(stride)


def _mine_ivf_codebook_kernel(spark, sf_dir):
    """The miner's adaptive IVF codebook (cid, c), memoized per
    (application, sf_dir): engine-exact distributed Lloyd
    (prefix-rank init, decimal sums, 6dp snapping — the
    emb_kmeans_lloyd3 arithmetic) fitted on the deterministic
    vec_id % stride == 0 training stripe, so the fit cost is bounded
    by _IVF_TRAIN_CAP rows however large the corpus while k_cells
    keeps growing with it.  Shared by pairs_mine_contrastive (ivf
    route), pairs_mine_contrastive_ivf, and pairs_mine_recall_eval."""
    from qaapi_spark.operators.kmeans import lloyd_centroids_distributed
    from qaapi_spark.session import shared_kernel

    def build():
        e = t(spark, sf_dir, "embeddings")
        n = _corpus_rows(sf_dir, e)
        k, _nprobe, stride = _mine_ivf_params(n)
        stripe = e.filter(F.col("vec_id") % stride == 0) if stride > 1 else e
        return lloyd_centroids_distributed(
            stripe, k=k, iters=_MINE_IVF_ITERS, id_col="vec_id",
            vec_col="embedding", round_dp=_MINE_IVF_DP, rank_init=True,
        ).localCheckpoint(eager=False)

    # memo key carries EVERY constant the fit depends on (ADVICE r11
    # #3): _IVF_TRAIN_CAP sets the training stride and _MINE_IVF_DP the
    # rounding — changing either must invalidate the cached codebook.
    return shared_kernel(
        spark,
        (
            "mine_ivf_cents", sf_dir, _IVF_OCC, _MINE_IVF_ITERS,
            _IVF_TRAIN_CAP, _MINE_IVF_DP,
        ),
        build,
    )


def _mine_pool_routed(spark, sf_dir, e, qs) -> tuple["DataFrame", str]:
    """(per-anchor candidate pool, route) — the cost-routed stage 1 of
    the contrastive miner.  One corpus count (parquet-footer cheap,
    and already paid by the IVF leg's parameter derivation) feeds the
    pure regime decision; both branches produce (query_id, cand_id,
    cosine) cut to _MINE_POOL per anchor."""
    from qaapi_spark.operators.similarity import cosine_topk_ivf

    n = _corpus_rows(sf_dir, e)
    route = _mine_pool_regime(n)
    if route == "srp":
        pool = srp_lsh_topk(
            qs, e, _MINE_POOL, n_planes=_SRP_PLANES, n_bands=_SRP_BANDS,
            n_probe_flips=_SRP_FLIPS,
        )
    else:
        _k, nprobe, _stride = _mine_ivf_params(n)
        cents = _mine_ivf_codebook_kernel(spark, sf_dir).select(
            F.col("cid").cast("long").alias("centroid_id"),
            F.col("c").alias("cvec"),
        )
        pool = cosine_topk_ivf(qs, e, _MINE_POOL, nprobe=nprobe, cents=cents)
    return pool, route


# unit-normalized corpus CTE — byte-identical to the `u` fragment
# inside _srp_scored_ctes, for oracles that need the exact rerank
# without the SRP chain
_U_CTE = """u AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    )"""


def _stripe_kmeans_ctes(iters: int, dp: int) -> tuple[str, str]:
    """(WITH-clause body, final centroid relation) for the miner's
    adaptive stripe-trained Lloyd fit — the llm_clustering._kmeans_ctes
    arithmetic (decimal sums, dp snapping, ties -> lowest cid) with
    k_cells / training stride as COUNT(*)-derived scalar subqueries
    (_K_CELLS_EXPR / _STRIDE_EXPR) and first-k-BY-RANK init so the
    mod-stripe's non-contiguous ids still seed k centroids."""
    from qaapi_spark.plans.llm_clustering import _dist

    sql = f"""te AS (
        SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
        FROM embeddings
        WHERE vec_id % {_STRIDE_EXPR} = 0
    ),
    tc0 AS (
        SELECT cid, c FROM (
            SELECT CAST(vec_id AS INT) AS cid,
                   list_transform(x, v -> ROUND(v, {dp})) AS c,
                   ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
            FROM te
        ) WHERE rn <= {_K_CELLS_EXPR}
    )"""
    prev = "tc0"
    for i in range(1, iters + 1):
        sql += f""",
    ta{i} AS (
        SELECT vec_id, x, cid FROM (
            SELECT te.vec_id, te.x, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY te.vec_id
                       ORDER BY {_dist('te.x', 'c.c')}, c.cid
                   ) AS rn
            FROM te CROSS JOIN {prev} c
        ) WHERE rn = 1
    ),
    tm{i} AS (
        SELECT cid, s.dim AS dim,
               ROUND(CAST(SUM(CAST(s.v AS DECIMAL(28,14))) AS DOUBLE)
                     / COUNT(*), {dp}) AS m
        FROM ta{i}, UNNEST(list_transform(range(1, len(x) + 1),
                        j -> {{'dim': j, 'v': x[j]}})) AS t(s)
        GROUP BY cid, s.dim
    ),
    tc{i} AS (SELECT cid, list(m ORDER BY dim) AS c FROM tm{i} GROUP BY cid)"""
        prev = f"tc{i}"
    return sql, prev


def _ivf_pool_tail_ctes(cent_rel: str) -> str:
    """assign -> probe -> score -> pool cut -> partner anti-join ->
    hard-neg top-k over the adaptive codebook ``cent_rel``; needs `u`,
    `anchors`, `partners` in scope.  Ends with ihard(query_id,
    cand_id, cosine).  i-prefixed names so the chain composes with the
    SRP chain's pool/inegs/hard inside the routed oracle."""
    return f"""icu AS (
        SELECT cid AS centroid_id,
               list_transform(c, v -> v / sqrt(list_dot_product(c, c))) AS cuv
        FROM {cent_rel}
    ),
    iassigned AS (
        SELECT cand_id, centroid_id FROM (
            SELECT v.vec_id AS cand_id, ct.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY ROUND(list_dot_product(v.uv, ct.cuv), 4) DESC,
                                ct.centroid_id) AS rn
            FROM u v CROSS JOIN icu ct
        ) WHERE rn = 1
    ),
    iprobes AS (
        SELECT query_id, centroid_id FROM (
            SELECT q.vec_id AS query_id, ct.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY ROUND(list_dot_product(q.uv, ct.cuv), 4) DESC,
                                ct.centroid_id) AS rn
            FROM u q CROSS JOIN icu ct
            WHERE q.vec_id IN (SELECT id FROM anchors)
        ) WHERE rn <= {_NPROBE_EXPR}
    ),
    iscored AS (
        SELECT p.query_id, a.cand_id,
               ROUND(list_dot_product(qu.uv, cu2.uv), 4) AS cosine
        FROM iprobes p JOIN iassigned a USING (centroid_id)
        JOIN u qu ON qu.vec_id = p.query_id
        JOIN u cu2 ON cu2.vec_id = a.cand_id
        WHERE p.query_id <> a.cand_id
    ),
    ipool AS (
        SELECT query_id, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rn
            FROM iscored
        ) WHERE rn <= {_MINE_POOL}
    ),
    iinegs AS (
        SELECT g.query_id, g.cand_id, g.cosine
        FROM ipool g
        LEFT JOIN partners p
            ON p.query_id = g.query_id AND p.cand_id = g.cand_id
        WHERE p.query_id IS NULL
    ),
    ihard AS (
        SELECT query_id, cand_id, cosine FROM (
            SELECT query_id, cand_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rn
            FROM iinegs
        ) WHERE rn <= {_HARD_NEG_K}
    )"""


def _ivf_mine_oracle() -> str:
    """IVF-pooled miner oracle: the adaptive stripe-trained Lloyd chain
    feeds assign/probe CTEs whose query set is the anchor relation,
    then the shared miner tail (pool cut -> partner anti-join ->
    hard-neg top-k)."""
    body, prev = _stripe_kmeans_ctes(_MINE_IVF_ITERS, _MINE_IVF_DP)
    return f"""
    WITH {_mine_base_ctes()},
    {_U_CTE},
    {body},
    {_ivf_pool_tail_ctes(prev)}
    SELECT id_a AS anchor_id, id_b AS other_id,
           'pos' AS label, jaccard AS score
    FROM jpairs
    UNION ALL
    SELECT query_id AS anchor_id, cand_id AS other_id,
           'hard_neg' AS label, cosine AS score
    FROM ihard
    ORDER BY anchor_id, label, score DESC, other_id
    """


def _routed_mine_oracle() -> str:
    """Routed-miner oracle: BOTH pool chains (the anchored SRP chain
    ending in `hard`, the adaptive stripe-Lloyd IVF chain ending in
    `ihard`) plus the scalar route decision; the final UNION gates
    each branch on the route so DuckDB emits exactly the branch the
    Spark side executed at this corpus size."""
    body, prev = _stripe_kmeans_ctes(_MINE_IVF_ITERS, _MINE_IVF_DP)
    return f"""
    WITH {_mine_base_ctes()},
    {_mine_pool_hard_ctes()},
    {body},
    {_ivf_pool_tail_ctes(prev)},
    {_ROUTE_CTE}
    SELECT id_a AS anchor_id, id_b AS other_id,
           'pos' AS label, jaccard AS score
    FROM jpairs
    UNION ALL
    SELECT query_id AS anchor_id, cand_id AS other_id,
           'hard_neg' AS label, cosine AS score
    FROM hard WHERE (SELECT r FROM route) = 'srp'
    UNION ALL
    SELECT query_id AS anchor_id, cand_id AS other_id,
           'hard_neg' AS label, cosine AS score
    FROM ihard WHERE (SELECT r FROM route) = 'ivf'
    ORDER BY anchor_id, label, score DESC, other_id
    """


@query(
    "pairs_mine_contrastive",
    # Both branch chains are engine-exact end to end (the SRP fragment
    # backs ann_topk_srp_lsh's green hash; the stripe-Lloyd chain is
    # the emb_kmeans_lloyd3 arithmetic), the route decision is one
    # COUNT(*)-derived CASE mirrored by _mine_pool_regime, and the
    # pool cut / partner anti-join / hard-neg top-k are deterministic
    # (ROW_NUMBER over (4-dp cosine DESC, cand_id)).
    oracle=_routed_mine_oracle(),
    doc="contrastive training-pair mining for embedding models, with a "
    "COST-ROUTED candidate pool (VERDICT r10 next #2): POSITIVES are "
    "the exact near-dup relation (the memoized jaccard_pairs kernel — "
    "labels a dedup pass already computed); HARD NEGATIVES pool "
    "top-20 candidates per anchor through SRP-LSH while its fixed "
    "bucket structure keeps scored rows per anchor (0.5625 n for "
    "128/16/1-flip) inside the touch budget, and through the "
    "adaptive stripe-trained IVF index (k_cells = ceil(n/16), nprobe "
    "= ceil(3k/8) — swept round 11 to recall@3 0.80-0.84 at 37.5 % "
    "touch) beyond it; then anti-join the positive partners and keep "
    "the top-3 by exact cosine.  The route is a pure function of the "
    "corpus count (_mine_pool_regime, the dedup._containment_regime "
    "pattern), so the oracle reproduces the branch with a scalar "
    "CASE.  At 100 TB SRP's 256-buckets-per-band occupancy grows "
    "linearly with the corpus — the router is what keeps per-anchor "
    "mining cost a dial instead of a casualty (extension: "
    "training-data generation for retrieval/embedding fine-tuning)",
)
def pairs_mine_contrastive(spark, sf_dir):
    pos, e, qs, partners = _mine_anchor_inputs(spark, sf_dir)
    pool, _route = _mine_pool_routed(spark, sf_dir, e, qs)
    negs = pool.join(partners, ["query_id", "cand_id"], "left_anti")
    hard = topk_per_group(
        negs, ["query_id"], [F.desc("cosine"), F.asc("cand_id")], _HARD_NEG_K
    )
    out = pos.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("other_id"),
        F.lit("pos").alias("label"),
        F.col("jaccard").alias("score"),
    ).unionByName(
        hard.select(
            F.col("query_id").alias("anchor_id"),
            F.col("cand_id").alias("other_id"),
            F.lit("hard_neg").alias("label"),
            F.col("cosine").alias("score"),
        )
    )
    return out.orderBy("anchor_id", "label", F.desc("score"), "other_id")


def _recall_eval_oracle() -> str:
    body, prev = _stripe_kmeans_ctes(_MINE_IVF_ITERS, _MINE_IVF_DP)
    return f"""
    WITH {_mine_base_ctes()},
    {_mine_pool_hard_ctes()},
    {body},
    {_ivf_pool_tail_ctes(prev)},
    {_ROUTE_CTE},
    rhard AS (
        SELECT query_id, cand_id FROM hard
        WHERE (SELECT r FROM route) = 'srp'
        UNION ALL
        SELECT query_id, cand_id FROM ihard
        WHERE (SELECT r FROM route) = 'ivf'
    ),
    grid AS (
        SELECT a.id AS query_id, c.vec_id AS cand_id,
               ROUND(list_dot_product(qa.uv, c.uv), 4) AS cosine
        FROM anchors a
        JOIN u qa ON qa.vec_id = a.id
        CROSS JOIN u c
        WHERE c.vec_id <> a.id
    ),
    enegs AS (
        SELECT g.query_id, g.cand_id, g.cosine
        FROM grid g
        LEFT JOIN partners p
            ON p.query_id = g.query_id AND p.cand_id = g.cand_id
        WHERE p.query_id IS NULL
    ),
    ehard AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, cand_id) AS rn
            FROM enegs
        ) WHERE rn <= {_HARD_NEG_K}
    ),
    per_a AS (
        SELECT e.query_id,
               COUNT(*) AS n_true,
               SUM(CASE WHEN h.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM ehard e
        LEFT JOIN rhard h
            ON h.query_id = e.query_id AND h.cand_id = e.cand_id
        GROUP BY e.query_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
           ROUND(SUM(n_hit) * 1.0 / SUM(n_true), 4) AS recall_at_k,
           ROUND(MIN(n_hit * 1.0 / n_true), 4) AS min_anchor_recall,
           CAST(SUM(CASE WHEN n_hit = n_true THEN 1 ELSE 0 END) AS BIGINT)
               AS n_perfect_anchors
    FROM per_a
    """


@query(
    "pairs_mine_recall_eval",
    # Integer-exact recall aggregates over two deterministic relations
    # (the ann_recall_eval_srp pattern): hit counts are exact integers,
    # the only floats are single divisions rounded to 4 dp.
    oracle=_recall_eval_oracle(),
    doc="recall eval of the ROUTED contrastive miner: the exact "
    "|anchors| x corpus grid (the miner's former brute-force route, "
    "demoted to eval-only) produces the true per-anchor top-3 hard "
    "negatives; the routed default's picks (same _mine_pool_routed "
    "the miner runs — SRP within the touch budget, adaptive IVF "
    "beyond it) are scored against them with integer-exact recall "
    "aggregates — the per-index-build eval a production mining "
    "pipeline runs to certify the pool budget (the "
    "ann_recall_eval_srp pattern applied to mining; the >= 0.8 bar "
    "on this query's recall_at_k is pinned by test for BOTH routes; "
    "VERDICT r10 next #2 'done' condition) (extension)",
)
def pairs_mine_recall_eval(spark, sf_dir):
    from qaapi_spark.operators.similarity import cosine_topk_bruteforce

    _pos, e, qs, partners = _mine_anchor_inputs(spark, sf_dir)
    n_corpus = _corpus_rows(sf_dir, e)
    grid = cosine_topk_bruteforce(qs, e, int(n_corpus))
    ehard = topk_per_group(
        grid.join(partners, ["query_id", "cand_id"], "left_anti"),
        ["query_id"],
        [F.desc("cosine"), F.asc("cand_id")],
        _HARD_NEG_K,
    ).select("query_id", "cand_id")
    pool, _route = _mine_pool_routed(spark, sf_dir, e, qs)
    ihard = topk_per_group(
        pool.join(partners, ["query_id", "cand_id"], "left_anti"),
        ["query_id"],
        [F.desc("cosine"), F.asc("cand_id")],
        _HARD_NEG_K,
    ).select(
        F.col("query_id").alias("iq"), F.col("cand_id").alias("ic")
    )
    per_a = (
        ehard.join(
            ihard,
            (ehard["query_id"] == ihard["iq"]) & (ehard["cand_id"] == ihard["ic"]),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_true"),
            F.sum(F.col("ic").isNotNull().cast("long")).alias("n_hit"),
        )
    )
    return per_a.agg(
        F.count("*").alias("n_anchors"),
        F.round(F.sum("n_hit") / F.sum("n_true"), 4).alias("recall_at_k"),
        F.round(F.min(F.col("n_hit") / F.col("n_true")), 4).alias(
            "min_anchor_recall"
        ),
        F.sum((F.col("n_hit") == F.col("n_true")).cast("long")).alias(
            "n_perfect_anchors"
        ),
    )




@query(
    "pairs_mine_contrastive_ivf",
    oracle=_ivf_mine_oracle(),
    doc="the contrastive miner's IVF pool leg, pinned to always-IVF "
    "(the routed default's beyond-budget branch, exposed standalone "
    "so the branch hash-checks at every SF): stage 1 pools per-anchor "
    "candidates from the adaptive trained-IVF nprobe cells — k_cells "
    "= ceil(n/16) grows with the corpus (occupancy pinned at ~16), "
    "nprobe = ceil(3k/8) holds touch at 37.5 %, and the engine-exact "
    "Lloyd codebook is fitted on a <= 1024-row deterministic "
    "mod-stripe (rank init), so fit cost is bounded however large "
    "the corpus — the round-11 sweep measured recall@3 0.80 (n=500) "
    "/ 0.84 (n=2000) vs the exact grid, up from 0.66-0.70 for the "
    "r10 k=8/nprobe=3 config (tools/sweep_miner_pool.py; bar 0.8 "
    "pinned by test); then the identical anti-join -> exact top-3 "
    "tail (extension)",
)
def pairs_mine_contrastive_ivf(spark, sf_dir):
    from qaapi_spark.operators.similarity import cosine_topk_ivf

    pos, e, qs, partners = _mine_anchor_inputs(spark, sf_dir)
    _k, nprobe, _stride = _mine_ivf_params(_corpus_rows(sf_dir, e))
    cents = _mine_ivf_codebook_kernel(spark, sf_dir).select(
        F.col("cid").cast("long").alias("centroid_id"), F.col("c").alias("cvec")
    )
    pool = cosine_topk_ivf(qs, e, _MINE_POOL, nprobe=nprobe, cents=cents)
    negs = pool.join(partners, ["query_id", "cand_id"], "left_anti")
    hard = topk_per_group(
        negs, ["query_id"], [F.desc("cosine"), F.asc("cand_id")], _HARD_NEG_K
    )
    out = pos.select(
        F.col("id_a").alias("anchor_id"),
        F.col("id_b").alias("other_id"),
        F.lit("pos").alias("label"),
        F.col("jaccard").alias("score"),
    ).unionByName(
        hard.select(
            F.col("query_id").alias("anchor_id"),
            F.col("cand_id").alias("other_id"),
            F.lit("hard_neg").alias("label"),
            F.col("cosine").alias("score"),
        )
    )
    return out.orderBy("anchor_id", "label", F.desc("score"), "other_id")
