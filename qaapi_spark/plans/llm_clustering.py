"""Distributed clustering queries over `embeddings` (extended
surface): Lloyd k-means whose every iteration is engine-exact, so an
ITERATIVE ML ALGORITHM carries a full value-hash oracle — the
strongest correctness check in the catalog family that usually has to
settle for rows-only (cf. the trained-codebook ANN queries).

How the exactness works (operators/kmeans.lloyd_kmeans_distributed):
per-dimension sums run in DECIMAL(28,14) (exact, order-independent),
the mean divides two bit-identical numbers in IEEE doubles, and every
centroid component snaps to a 6-decimal grid per iteration, so Spark
and DuckDB iterate from identical centroids and assignments can never
drift.  Distances are sequential left folds; argmin ties resolve to
the lowest cluster id on both engines.
"""

from __future__ import annotations

from qaapi_spark.operators.kmeans import lloyd_kmeans_distributed
from qaapi_spark.plans.catalog import query, t

_K = 8
_ITERS = 3
_DP = 6


def _dist(x: str, c: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({x}) + 1), "
        f"i -> ({x}[i] - {c}[i]) * ({x}[i] - {c}[i])), "
        "(acc, v) -> acc + v)"
    )


def _kmeans_oracle(k: int, iters: int, dp: int) -> str:
    sql = f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(vec_id AS INT) AS cid,
               list_transform(x, v -> ROUND(v, {dp})) AS c
        FROM e WHERE vec_id < {k}
    )"""
    prev = "c0"
    for i in range(1, iters + 1):
        sql += f""",
    a{i} AS (
        SELECT vec_id, x, cid FROM (
            SELECT e.vec_id, e.x, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_dist('e.x', 'c.c')}, c.cid
                   ) AS rn
            FROM e CROSS JOIN {prev} c
        ) WHERE rn = 1
    ),
    m{i} AS (
        SELECT cid, s.dim AS dim,
               ROUND(CAST(SUM(CAST(s.v AS DECIMAL(28,14))) AS DOUBLE)
                     / COUNT(*), {dp}) AS m
        FROM a{i}, UNNEST(list_transform(range(1, len(x) + 1),
                        j -> {{'dim': j, 'v': x[j]}})) AS t(s)
        GROUP BY cid, s.dim
    ),
    c{i} AS (SELECT cid, list(m ORDER BY dim) AS c FROM m{i} GROUP BY cid)"""
        prev = f"c{i}"
    sql += f"""
    SELECT vec_id, cid AS cluster, ROUND(d, {dp}) AS dist FROM (
        SELECT e.vec_id, c.cid, {_dist('e.x', 'c.c')} AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_dist('e.x', 'c.c')}, c.cid
               ) AS rn
        FROM e CROSS JOIN {prev} c
    ) WHERE rn = 1
    ORDER BY vec_id"""
    return sql


@query(
    "emb_kmeans_lloyd3",
    oracle=_kmeans_oracle(_K, _ITERS, _DP),
    doc="distributed Lloyd k-means (k=8, 3 iterations, prefix init): "
    "assignment is MAP-ONLY (k centroids ride as one broadcast row, "
    "per-vector argmin via sequential left-fold distances), the "
    "update is one aggregate shuffle per iteration with map-side "
    "combine to k x dims rows per task — no driver collect of the "
    "corpus anywhere; decimal-exact dimension sums + per-iteration "
    "6dp centroid snapping make the whole iterative algorithm "
    "hash-verifiable against the unrolled SQL oracle (extension: "
    "distributed clustering; cf. operators/kmeans.py ANN codebooks)",
)
def emb_kmeans_lloyd3(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    return lloyd_kmeans_distributed(
        e, k=_K, iters=_ITERS, id_col="vec_id", vec_col="embedding", round_dp=_DP
    ).orderBy("vec_id")
