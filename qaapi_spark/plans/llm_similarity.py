"""Similarity-search queries over `embeddings` (extended surface):
brute-force cosine top-k baseline + IVF-bucketed approximate variant.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.operators.similarity import cosine_topk_bruteforce, cosine_topk_ivf
from qaapi_spark.plans.catalog import query, t

_K = 5
_QUERY_MOD = 100  # query set := vec_id % 100 == 0 (deterministic sample)


@query(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH u AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(x AS DOUBLE) / sqrt(list_dot_product(
                            list_transform(embedding, y -> CAST(y AS DOUBLE)),
                            list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS uv
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               ROUND(list_dot_product(q.uv, c.uv), 4) AS cosine
        FROM u q JOIN u c ON q.vec_id % {_QUERY_MOD} = 0 AND q.vec_id <> c.vec_id
    )
    SELECT query_id, cand_id, cosine FROM (
        SELECT query_id, cand_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS rn
        FROM scored
    ) WHERE rn <= {_K}
    ORDER BY query_id, cosine DESC, cand_id
    """,
    doc="exact ANN baseline: broadcast query set x corpus, cosine top-k (extension)",
)
def ann_topk_bruteforce(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    return cosine_topk_bruteforce(qs, e, _K).orderBy(
        "query_id", F.desc("cosine"), "cand_id"
    )


@query(
    "ann_topk_ivf",
    oracle=None,  # approximate (IVF probing) => rows-only driver check
    doc="IVF-bucketed approximate cosine top-k: centroid assign + nprobe probe (extension)",
)
def ann_topk_ivf(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") % _QUERY_MOD == 0)
    return cosine_topk_ivf(qs, e, _K).orderBy("query_id", F.desc("cosine"), "cand_id")
