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

from pyspark.sql import functions as F

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


def _kmeans_ctes(k: int, iters: int, dp: int) -> tuple[str, str]:
    """(WITH-clause body, last-centroid relation name) for the unrolled
    Lloyd oracle — shared by the clustering query and the SemDeDup
    query so both iterate from the identical SQL."""
    sql = f"""e AS (
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
    return sql, prev


def _kmeans_oracle(k: int, iters: int, dp: int) -> str:
    body, prev = _kmeans_ctes(k, iters, dp)
    return f"""
    WITH {body}
    SELECT vec_id, cid AS cluster, ROUND(d, {dp}) AS dist FROM (
        SELECT e.vec_id, c.cid, {_dist('e.x', 'c.c')} AS d,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {_dist('e.x', 'c.c')}, c.cid
               ) AS rn
        FROM e CROSS JOIN {prev} c
    ) WHERE rn = 1
    ORDER BY vec_id"""


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
    return _lloyd_kernel(spark, sf_dir).orderBy("vec_id")


def _lloyd_kernel(spark, sf_dir):
    """(vec_id, cluster, dist) Lloyd result, memoized per
    (application, sf_dir) and materialized lazily — emb_kmeans_lloyd3
    and dedup_semantic_kmeans share it, so the 3-iteration fit runs
    once per session (the cc_jaccard_labels pattern)."""
    from qaapi_spark.session import shared_kernel

    def build():
        e = t(spark, sf_dir, "embeddings")
        return lloyd_kmeans_distributed(
            e, k=_K, iters=_ITERS, id_col="vec_id", vec_col="embedding",
            round_dp=_DP, cents=lloyd_centroids_kernel(spark, sf_dir),
        ).localCheckpoint(eager=False)

    return shared_kernel(
        spark, ("kmeans_lloyd", sf_dir, _K, _ITERS, _DP), build
    )


def lloyd_centroids_kernel(spark, sf_dir):
    """The fitted k=8/3-iteration codebook (cid, c) itself, memoized —
    the trained-IVF probe (plans/llm_similarity.ann_topk_ivf_trained)
    reuses the exact centroid relation emb_kmeans_lloyd3's oracle
    iterates to, so its composed SQL oracle shares `_kmeans_ctes`."""
    from qaapi_spark.operators.kmeans import lloyd_centroids_distributed
    from qaapi_spark.session import shared_kernel

    def build():
        e = t(spark, sf_dir, "embeddings")
        return lloyd_centroids_distributed(
            e, k=_K, iters=_ITERS, id_col="vec_id", vec_col="embedding",
            round_dp=_DP,
        ).localCheckpoint(eager=False)

    return shared_kernel(
        spark, ("kmeans_lloyd_cents", sf_dir, _K, _ITERS, _DP), build
    )


# --- SemDeDup: semantic dedup inside k-means clusters ---------------
#
# Abbas et al. 2023 ("SemDeDup", public): cluster the embedding space,
# then drop any vector whose cosine similarity to a LOWER-ID vector in
# the SAME cluster clears a threshold.  Clustering bounds the pairwise
# work to O(sum |cluster|^2) — at 100 TB you grow k so clusters stay
# bounded and the per-cluster pair scan stays constant-size, which is
# exactly why the method exists; the assignment itself is map-only.

_SEM_THRESHOLD = 0.4  # same planted-twin threshold as dedup_embedding_cosine


def _semdedup_oracle(k: int, iters: int, dp: int, thr: float) -> str:
    body, prev = _kmeans_ctes(k, iters, dp)
    return f"""
    WITH {body},
    asg AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT e.vec_id, c.cid,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_dist('e.x', 'c.c')}, c.cid
                   ) AS rn
            FROM e CROSS JOIN {prev} c
        ) WHERE rn = 1
    ),
    u AS (
        SELECT vec_id,
               list_transform(x, v -> v / sqrt(list_dot_product(x, x))) AS uv
        FROM e
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM asg a
        JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        JOIN u ua ON ua.vec_id = a.vec_id
        JOIN u ub ON ub.vec_id = b.vec_id
        WHERE ROUND(list_dot_product(ua.uv, ub.uv), 4) >= {thr}
    )
    SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS is_kept
    FROM asg a LEFT JOIN dropped d ON d.vec_id = a.vec_id
    ORDER BY a.vec_id"""


@query(
    "dedup_semantic_kmeans",
    oracle=_semdedup_oracle(_K, _ITERS, _DP, _SEM_THRESHOLD),
    doc="SemDeDup (Abbas et al. 2023): k-means-bucketed semantic "
    "near-dup removal — reuses the memoized Lloyd assignment "
    "(map-only argmin vs broadcast centroids), then one "
    "cluster-partitioned self-join computes cosine only WITHIN "
    "clusters (pairwise work bounded by cluster size; at scale k "
    "grows with the corpus so clusters stay constant); drop rule is "
    "similar-to-any-lower-id — one join, no sequential greedy pass "
    "(extension: LLM-pipeline dedup family)",
)
def dedup_semantic_kmeans(spark, sf_dir):
    from typing import Iterator

    import numpy as np
    import pandas as pd

    e = t(spark, sf_dir, "embeddings")
    asg = _lloyd_kernel(spark, sf_dir).select("vec_id", "cluster")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    u = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda v: v.cast("double") / norm
        ).alias("uv"),
    ).join(asg, "vec_id")

    # per-cluster upper-triangle GEMM (the SemDeDup paper's own shape:
    # clustering exists precisely to bound this quadratic kernel) — a
    # vec drops iff some LOWER-ID cluster-mate has rounded cosine >=
    # threshold.  Rounding to 4dp matches the SQL oracle's
    # ROUND(list_dot_product(...), 4) (same contract the exact
    # embedding-cosine queries hash-pass with).
    def drop_scan(
        key, pdf: pd.DataFrame
    ) -> pd.DataFrame:  # one pandas group per cluster
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["uv"].iloc[order]]
        )
        sims = np.round(m @ m.T, 4)
        lower = np.tril(np.ones_like(sims, dtype=bool), k=-1)
        dropped = ((sims >= _SEM_THRESHOLD) & lower).any(axis=1)
        return pd.DataFrame({"vec_id": ids[dropped]})

    dropped = (
        u.groupBy("cluster")
        .applyInPandas(drop_scan, "vec_id long")
        .withColumn("hit", F.lit(True))
    )
    return (
        asg.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cluster",
            F.coalesce(~F.col("hit"), F.lit(True)).alias("is_kept"),
        )
        .orderBy("vec_id")
    )


# --- Embedding covariance + hash-verifiable distributed PCA ---------
#
# Same exactness recipe as the Lloyd query, applied to linear algebra:
# products in IEEE doubles, cell sums in DECIMAL(28,14) (exact and
# summation-order-independent), per-iteration 6dp snapping of the
# power-iteration vector, sequential left-fold dots everywhere — so a
# distributed PCA carries a full value-hash oracle end-to-end.

_PCA_ITERS = 8

# Round-6: the kernel quantizes inputs to 6dp int64 fixed point
# (z = floor(x*1e6 + 0.5), the srp_quantize recipe) so the Gram runs
# as an exact integer GEMM executor-side; the oracle mirrors it —
# integer sums are order-independent, the closing double ops
# ((S/q^2)/n - mi*mj, same associativity both engines) are over
# bit-identical operands.  Every SUM is CAST AS DOUBLE before use, so
# no HUGEINT reaches the output schema.
_COV_CTES = """e AS (
        SELECT vec_id,
               list_transform(embedding, v -> CAST(v AS DOUBLE)) AS x,
               list_transform(embedding,
               v -> floor(CAST(v AS DOUBLE) * CAST(1000000 AS DOUBLE)
                          + CAST(0.5 AS DOUBLE))) AS z
        FROM embeddings
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM e),
    cells AS (
        SELECT s.i AS i, s.j AS j, SUM(CAST(s.p AS BIGINT)) AS sxy
        FROM e, UNNEST(flatten(list_transform(range(1, len(z)+1),
              i -> list_transform(range(i, len(z)+1),
                   j -> {'i': i, 'j': j, 'p': z[i]*z[j]})))) AS t(s)
        GROUP BY s.i, s.j
    ),
    means AS (
        SELECT u.k AS k,
               CAST(SUM(CAST(u.v AS BIGINT)) AS DOUBLE)
                   / CAST(1000000 AS DOUBLE) / nn.n AS m
        FROM e, UNNEST(list_transform(range(1, len(z)+1),
              k -> {'k': k, 'v': z[k]})) AS tt(u), nn
        GROUP BY u.k, nn.n
    ),
    covu AS (
        SELECT c.i AS i, c.j AS j,
               ROUND(CAST(c.sxy AS DOUBLE)
                     / CAST(1000000000000 AS DOUBLE) / nn.n
                     - mi.m*mj.m, 6) + 0.0 AS cov
        FROM cells c JOIN means mi ON mi.k=c.i JOIN means mj ON mj.k=c.j, nn
    )"""


def _pca_oracle(iters: int) -> str:
    sql = f"""
    WITH {_COV_CTES},
    covf AS MATERIALIZED (
        SELECT i, j, cov FROM covu
        UNION ALL SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
    ),
    cmat AS MATERIALIZED (SELECT i, list(cov ORDER BY j) AS row FROM covf GROUP BY i),
    dd AS (SELECT len(x) AS d FROM e LIMIT 1),
    v0 AS (SELECT list_transform(range(1, d+1),
                  q -> ROUND(1.0/sqrt(d), 6)) AS v FROM dd)"""
    prev = "v0"
    for it in range(1, iters + 1):
        sql += f""",
    w{it} AS (
        SELECT list(wi ORDER BY i) AS ws FROM (
            SELECT c.i AS i,
                   list_reduce(list_transform(range(1, len(c.row)+1),
                       q -> c.row[q]*v.v[q]), (a,b) -> a + b) AS wi
            FROM cmat c CROSS JOIN {prev} v)
    ),
    v{it} AS (
        SELECT list_transform(ws, w -> ROUND(w / sqrt(
            list_reduce(list_transform(ws, y -> y*y), (a,b) -> a+b)), 6)) AS v
        FROM w{it}
    )"""
        prev = f"v{it}"
    sql += f"""
    SELECT e.vec_id AS vec_id,
           ROUND(list_reduce(list_transform(range(1, len(e.x)+1),
                 q -> e.x[q]*v.v[q]), (a,b) -> a+b), 4) + 0.0 AS pc1
    FROM e CROSS JOIN {prev} v ORDER BY vec_id"""
    return sql


@query(
    "emb_covariance_upper",
    oracle=f"""
    WITH {_COV_CTES}
    SELECT i, j, cov FROM covu ORDER BY i, j
    """,
    doc="d x d embedding covariance as upper-triangle rows — one "
    "Arrow corpus pass accumulates a per-partition integer Gram via "
    "BLAS over 6dp-fixed-point inputs (no product-row explode), so "
    "the shuffle is O(partitions * d^2) regardless of corpus size; "
    "exact integer cell sums make a linear-algebra aggregate "
    "value-hash-verifiable (extension: embedding analytics)",
)
def emb_covariance_upper(spark, sf_dir):
    return _cov_kernel(spark, sf_dir).orderBy("i", "j")


@query(
    "stream_covariance_update",
    # Integer moment partials are ADDITION-mergeable (order- and
    # grouping-independent exact sums), so the epoch-keyed moment
    # store closes to the same covariance as the one-shot batch
    # aggregate bit-for-bit — the streamed query shares the batch
    # oracle outright (the additive-merge counterpart of the
    # register-MAX trick behind stream_hll_running_users).
    oracle=f"""
    WITH {_COV_CTES}
    SELECT i, j, cov FROM covu ORDER BY i, j
    """,
    doc="streaming covariance / embedding-drift maintenance: each "
    "micro-batch reduces MAP-ONLY to exact int64 moment partials "
    "(d x d Gram + linear sums + count) appended to an epoch-keyed "
    "O(d^2) store; summing the store recovers the covariance of "
    "everything seen so far exactly — the drift monitor a training "
    "pipeline consults between snapshots (extension, SURVEY §2.9; "
    "same oracle as emb_covariance_upper by mergeability)",
)
def stream_covariance_update_q(spark, sf_dir):
    from qaapi_spark.streaming.incremental import stream_covariance_update

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return stream_covariance_update(
        spark, f"{sf_dir}/embeddings.parquet"
    ).orderBy("i", "j")


def _cov_kernel(spark, sf_dir):
    """Memoized covariance rows — shared by emb_covariance_upper and
    emb_pca_pc1_power so the corpus-scanning aggregate runs once."""
    from qaapi_spark.operators.linalg import covariance_upper
    from qaapi_spark.session import shared_kernel

    def build():
        e = t(spark, sf_dir, "embeddings")
        return covariance_upper(e).localCheckpoint(eager=False)

    return shared_kernel(spark, ("emb_covariance", sf_dir), build)


@query(
    "emb_pca_pc1_power",
    oracle=_pca_oracle(_PCA_ITERS),
    doc="distributed PCA, first principal-component scores: the "
    "covariance aggregate is the only corpus pass (shared with "
    "emb_covariance_upper), the power iteration runs on the d x d "
    "matrix driver-side (bounded by design — the ANN-codebook "
    "pattern) with sequential-fold matvecs + per-iteration 6dp "
    "snapping so DuckDB's unrolled list_reduce oracle reproduces "
    "every iterate bit-for-bit, and the projection is MAP-ONLY with "
    "the eigenvector riding as a literal (extension: embedding "
    "analytics; the strongest-check family, cf. emb_kmeans_lloyd3)",
)
def emb_pca_pc1_power(spark, sf_dir):
    from qaapi_spark.operators.linalg import power_iteration_pc1, project_scores

    e = t(spark, sf_dir, "embeddings")
    cov_rows = [
        (r["i"], r["j"], r["cov"]) for r in _cov_kernel(spark, sf_dir).collect()
    ]
    dim = max(j for _, j, _ in cov_rows)
    v = power_iteration_pc1(cov_rows, dim, iters=_PCA_ITERS)
    return project_scores(e, v).orderBy("vec_id")


def _iter_chain(cmat: str, vpfx: str, iters: int) -> tuple[str, str]:
    """(sql fragment, last relation name): power-iteration CTE chain
    ``{vpfx}1..{vpfx}{iters}`` over matrix relation ``cmat``, starting
    from the uniform vector relation ``{vpfx}0`` (caller defines it).
    Every step is MATERIALIZED: DuckDB inlines plain CTEs, and a chain
    of inlined self-referencing steps re-evaluates its whole prefix
    per reference (measured 232 s for the 2-component oracle at
    sf0.001 vs ~1 s materialized)."""
    sql, prev = "", f"{vpfx}0"
    for it in range(1, iters + 1):
        sql += f""",
    {vpfx}w{it} AS MATERIALIZED (
        SELECT list(wi ORDER BY i) AS ws FROM (
            SELECT c.i AS i,
                   list_reduce(list_transform(range(1, len(c.row)+1),
                       q -> c.row[q]*v.v[q]), (a,b) -> a + b) AS wi
            FROM {cmat} c CROSS JOIN {prev} v)
    ),
    {vpfx}{it} AS MATERIALIZED (
        SELECT list_transform(ws, w -> ROUND(w / sqrt(
            list_reduce(list_transform(ws, y -> y*y), (a,b) -> a+b)), 6)) AS v
        FROM {vpfx}w{it}
    )"""
        prev = f"{vpfx}{it}"
    return sql, prev


def _pca2_body(iters: int) -> str:
    """Shared WITH-clause prefix for the 2-component PCA family:
    covariance -> power-iterated v1 (p{iters}) -> deflated, power-
    iterated, Gram-Schmidt-renormalized v2 (gsv)."""
    sql = f"""
    WITH {_COV_CTES},
    covf AS MATERIALIZED (
        SELECT i, j, cov FROM covu
        UNION ALL SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
    ),
    cmat AS MATERIALIZED (SELECT i, list(cov ORDER BY j) AS row FROM covf GROUP BY i),
    dd AS (SELECT len(x) AS d FROM e LIMIT 1),
    p0 AS MATERIALIZED (SELECT list_transform(range(1, d+1),
                  q -> ROUND(1.0/sqrt(d), 6)) AS v FROM dd)"""
    frag, v1 = _iter_chain("cmat", "p", iters)
    sql += frag
    sql += f""",
    wlam AS (
        SELECT list(wi ORDER BY i) AS ws FROM (
            SELECT c.i AS i,
                   list_reduce(list_transform(range(1, len(c.row)+1),
                       q -> c.row[q]*v.v[q]), (a,b) -> a + b) AS wi
            FROM cmat c CROSS JOIN {v1} v)
    ),
    lam AS (
        SELECT ROUND(list_reduce(list_transform(range(1, len(v.v)+1),
                   q -> v.v[q]*w.ws[q]), (a,b) -> a + b), 6) AS l
        FROM {v1} v CROSS JOIN wlam w
    ),
    c2 AS MATERIALIZED (
        SELECT f.i AS i, f.j AS j,
               ROUND(f.cov - lam.l * v.v[f.i] * v.v[f.j], 6) AS cov
        FROM covf f CROSS JOIN lam CROSS JOIN {v1} v
    ),
    cmat2 AS MATERIALIZED (SELECT i, list(cov ORDER BY j) AS row FROM c2 GROUP BY i),
    q0 AS MATERIALIZED (SELECT list_transform(range(1, d+1),
                  q -> ROUND(1.0/sqrt(d), 6)) AS v FROM dd)"""
    frag2, v2raw = _iter_chain("cmat2", "q", iters)
    sql += frag2
    sql += f""",
    gsd AS MATERIALIZED (
        SELECT list_reduce(list_transform(range(1, len(a.v)+1),
                   q -> a.v[q]*b.v[q]), (x1,x2) -> x1+x2) AS dp
        FROM {v1} a CROSS JOIN {v2raw} b
    ),
    gsu AS MATERIALIZED (
        SELECT list_transform(range(1, len(b.v)+1),
                   q -> b.v[q] - g.dp * a.v[q]) AS u
        FROM {v1} a CROSS JOIN {v2raw} b CROSS JOIN gsd g
    ),
    gsv AS MATERIALIZED (
        SELECT list_transform(u, w -> ROUND(w / sqrt(
            list_reduce(list_transform(u, y -> y*y), (x1,x2) -> x1+x2)), 6)) AS v
        FROM gsu
    )"""
    return sql


def _pca2_oracle(iters: int) -> str:
    v1, v2 = f"p{iters}", "gsv"
    return _pca2_body(iters) + f"""
    SELECT e.vec_id AS vec_id,
           ROUND(list_reduce(list_transform(range(1, len(e.x)+1),
                 q -> e.x[q]*a.v[q]), (x1,x2) -> x1+x2), 4) + 0.0 AS pc1,
           ROUND(list_reduce(list_transform(range(1, len(e.x)+1),
                 q -> e.x[q]*b.v[q]), (x1,x2) -> x1+x2), 4) + 0.0 AS pc2
    FROM e CROSS JOIN {v1} a CROSS JOIN {v2} b ORDER BY vec_id"""


def _whiten2d_oracle(iters: int) -> str:
    """Whitened 2-D projection: the _pca2_body eigenvectors plus both
    snapped eigenvalues (lambda_k = v_k . C v_k against the ORIGINAL
    matrix — exact for v2 too since it is deflated/orthogonalized),
    each axis divided by sqrt(lambda_k) before the 4dp snap."""
    v1, v2 = f"p{iters}", "gsv"
    return _pca2_body(iters) + f""",
    l1w AS (
        SELECT list(wi ORDER BY i) AS ws FROM (
            SELECT c.i AS i,
                   list_reduce(list_transform(range(1, len(c.row)+1),
                       q -> c.row[q]*v.v[q]), (a,b) -> a + b) AS wi
            FROM cmat c CROSS JOIN {v1} v)
    ),
    l1 AS (
        SELECT ROUND(list_reduce(list_transform(range(1, len(v.v)+1),
                   q -> v.v[q]*w.ws[q]), (a,b) -> a + b), 6) AS l
        FROM {v1} v CROSS JOIN l1w w
    ),
    l2w AS (
        SELECT list(wi ORDER BY i) AS ws FROM (
            SELECT c.i AS i,
                   list_reduce(list_transform(range(1, len(c.row)+1),
                       q -> c.row[q]*v.v[q]), (a,b) -> a + b) AS wi
            FROM cmat c CROSS JOIN {v2} v)
    ),
    l2 AS (
        SELECT ROUND(list_reduce(list_transform(range(1, len(v.v)+1),
                   q -> v.v[q]*w.ws[q]), (a,b) -> a + b), 6) AS l
        FROM {v2} v CROSS JOIN l2w w
    )
    SELECT e.vec_id AS vec_id,
           ROUND(list_reduce(list_transform(range(1, len(e.x)+1),
                 q -> e.x[q]*a.v[q]), (x1,x2) -> x1+x2) / sqrt(l1.l), 4)
           + 0.0 AS w1,
           ROUND(list_reduce(list_transform(range(1, len(e.x)+1),
                 q -> e.x[q]*b.v[q]), (x1,x2) -> x1+x2) / sqrt(l2.l), 4)
           + 0.0 AS w2
    FROM e CROSS JOIN {v1} a CROSS JOIN {v2} b
    CROSS JOIN l1 CROSS JOIN l2 ORDER BY vec_id"""


@query(
    "emb_pca_project2d",
    oracle=_pca2_oracle(_PCA_ITERS),
    doc="2-component PCA projection: leading vector by power iteration, "
    "second by snapped Hotelling deflation (lambda1 = v1·Cv1, C2 = "
    "snap(C - lambda1 v1 v1ᵀ)), both on the d x d matrix driver-side; "
    "projection is MAP-ONLY with two literal eigenvectors — the whole "
    "2-D semantic map of the corpus costs one covariance pass "
    "(shared kernel) + one map-only scan (extension: embedding "
    "analytics)",
)
def emb_pca_project2d(spark, sf_dir):
    from qaapi_spark.operators.linalg import power_iteration_two, project_scores2

    e = t(spark, sf_dir, "embeddings")
    cov_rows = [
        (r["i"], r["j"], r["cov"]) for r in _cov_kernel(spark, sf_dir).collect()
    ]
    dim = max(j for _, j, _ in cov_rows)
    v1, v2 = power_iteration_two(cov_rows, dim, iters=_PCA_ITERS)
    return project_scores2(e, v1, v2).orderBy("vec_id")


@query(
    "emb_pca_explained_variance",
    oracle=f"""
    WITH {_COV_CTES},
    covf AS MATERIALIZED (
        SELECT i, j, cov FROM covu
        UNION ALL SELECT j AS i, i AS j, cov FROM covu WHERE i <> j
    ),
    cmat AS MATERIALIZED (
        SELECT i, list(cov ORDER BY j) AS row FROM covf GROUP BY i
    ),
    dd AS (SELECT len(x) AS d FROM e LIMIT 1),
    p0 AS MATERIALIZED (SELECT list_transform(range(1, d+1),
                  q -> ROUND(1.0/sqrt(d), 6)) AS v FROM dd)
    {_iter_chain("cmat", "p", _PCA_ITERS)[0]},
    lamw AS (
        SELECT list(wi ORDER BY i) AS ws FROM (
            SELECT c.i AS i,
                   list_reduce(list_transform(range(1, len(c.row)+1),
                       q -> c.row[q]*v.v[q]), (a,b) -> a + b) AS wi
            FROM cmat c CROSS JOIN p{_PCA_ITERS} v)
    ),
    lam AS (
        SELECT ROUND(list_reduce(list_transform(range(1, len(v.v)+1),
                   q -> v.v[q]*w.ws[q]), (a,b) -> a + b), 6) AS l
        FROM p{_PCA_ITERS} v CROSS JOIN lamw w
    ),
    trace AS (
        SELECT ROUND(SUM(cov), 6) AS tr FROM covu WHERE i = j
    )
    SELECT lam.l AS lambda1, trace.tr AS total_variance,
           ROUND(lam.l / trace.tr, 4) AS explained_ratio
    FROM lam CROSS JOIN trace
    """,
    doc="PCA summary statistics: leading eigenvalue lambda1 = v1·Cv1 "
    "(sequential folds over the snapped eigenvector — engine-exact), "
    "total variance = trace(C) from the same covariance kernel, and "
    "the explained-variance ratio — the number a curation pipeline "
    "checks before trusting a 1-D/2-D semantic projection "
    "(extension: embedding analytics)",
)
def emb_pca_explained_variance(spark, sf_dir):
    from qaapi_spark.operators.linalg import (
        _seq_dot,
        _snap,
        power_iteration_pc1,
    )

    cov_rows = [
        (r["i"], r["j"], r["cov"]) for r in _cov_kernel(spark, sf_dir).collect()
    ]
    dim = max(j for _, j, _ in cov_rows)
    c = [[0.0] * dim for _ in range(dim)]
    for i, j, cv in cov_rows:
        c[i - 1][j - 1] = cv
        c[j - 1][i - 1] = cv
    v1 = power_iteration_pc1(cov_rows, dim, iters=_PCA_ITERS)
    w = [_seq_dot(c[i], v1) for i in range(dim)]
    lam = _snap(_seq_dot(v1, w), 6)
    # trace in the same decimal-snap arithmetic as the oracle's SUM of
    # 6dp-rounded diagonal cells (exact decimal addition, then snap)
    from decimal import Decimal

    tr = float(sum(Decimal(repr(cv)) for i, j, cv in cov_rows if i == j))
    tr = _snap(tr, 6)
    row = [(lam, tr, _snap(lam / tr, 4) + 0.0)]
    return spark.createDataFrame(
        row, "lambda1 double, total_variance double, explained_ratio double"
    )


@query(
    "emb_whiten2d",
    # Whitening composes everything already engine-exact: snapped
    # eigenvectors (power iteration + deflation), snapped eigenvalues
    # (sequential-fold Rayleigh quotients against the ORIGINAL
    # matrix — valid for v2 because it is deflated/orthogonalized),
    # and one extra IEEE division by sqrt(lambda) before the 4dp snap.
    oracle=_whiten2d_oracle(_PCA_ITERS),
    doc="PCA-whitened 2-D projection (w1, w2): the 2-component "
    "projection with each axis scaled to unit variance by "
    "1/sqrt(lambda_k) — the preprocessing SemDeDup-style semantic "
    "dedup and drift monitors run before cosine thresholds are "
    "comparable across corpora; projection stays MAP-ONLY with two "
    "literal eigenvectors + two scalar scales "
    "(extension: embedding analytics)",
)
def emb_whiten2d(spark, sf_dir):
    from qaapi_spark.operators.linalg import (
        _seq_dot,
        _snap,
        power_iteration_two,
        project_scores2_scaled,
    )

    e = t(spark, sf_dir, "embeddings")
    cov_rows = [
        (r["i"], r["j"], r["cov"]) for r in _cov_kernel(spark, sf_dir).collect()
    ]
    dim = max(j for _, j, _ in cov_rows)
    c = [[0.0] * dim for _ in range(dim)]
    for i, j, cv in cov_rows:
        c[i - 1][j - 1] = cv
        c[j - 1][i - 1] = cv
    v1, v2 = power_iteration_two(cov_rows, dim, iters=_PCA_ITERS)
    import math

    lam1 = _snap(_seq_dot(v1, [_seq_dot(c[i], v1) for i in range(dim)]), 6)
    lam2 = _snap(_seq_dot(v2, [_seq_dot(c[i], v2) for i in range(dim)]), 6)
    return project_scores2_scaled(
        e, v1, v2, math.sqrt(lam1), math.sqrt(lam2)
    ).orderBy("vec_id")
