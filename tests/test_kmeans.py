"""Deterministic k-means codebooks (operators/kmeans.py) and the
trained-IVF recall bar (VERDICT r2 next #8: >= 0.9)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from qaapi_spark.operators.kmeans import lloyd_kmeans, spherical_kmeans

from tests.conftest import SF_SMOKE


def _blob_data():
    """Three well-separated direction clusters on the unit sphere,
    built deterministically (no RNG)."""
    base = np.eye(3)
    pts = []
    for c in range(3):
        for i in range(20):
            v = base[c] + 0.05 * np.array(
                [((i * 7 + c * 3 + d) % 11 - 5) / 5.0 for d in range(3)]
            )
            pts.append(v / np.linalg.norm(v))
    return np.array(pts)


def test_spherical_kmeans_recovers_separated_clusters():
    x = _blob_data()
    cents = spherical_kmeans(x, 3, iters=20)
    assert cents.shape == (3, 3)
    # every point's nearest centroid agrees with its true cluster mates'
    assign = (x @ cents.T).argmax(axis=1)
    for c in range(3):
        block = assign[c * 20 : (c + 1) * 20]
        assert (block == block[0]).all(), f"cluster {c} split: {block}"
    # unit-norm centroids
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)


def test_kmeans_is_deterministic_and_seed_free():
    x = _blob_data()
    a = spherical_kmeans(x, 4, iters=10)
    b = spherical_kmeans(x, 4, iters=10)
    assert np.array_equal(a, b)
    c = lloyd_kmeans(x, 4, iters=10)
    d = lloyd_kmeans(x, 4, iters=10)
    assert np.array_equal(c, d)


def test_lloyd_kmeans_reduces_quantization_error():
    """Trained centroids must beat the init (= deterministic sample)
    on the training objective — the property that makes train_iters>0
    worth anything for PQ cells."""
    x = _blob_data()

    def sse(cents):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.min(axis=1).sum()

    init = x[:4]
    trained = lloyd_kmeans(x, 4, iters=10)
    assert sse(trained) < sse(init)


def test_kmeans_k_larger_than_sample_degrades_gracefully():
    x = _blob_data()[:2]
    assert spherical_kmeans(x, 10, iters=3).shape == (2, 3)
    assert lloyd_kmeans(x, 10, iters=3).shape == (2, 3)


def test_ivf_trained_planted_twin_recall(spark):
    """IVF with a spherical-k-means codebook must recover a planted
    near-duplicate twin (cosine ~0.95) for >= 0.9 of queries — the
    regime IVF serves in a dedup/retrieval pipeline.  (Measured 1.0 at
    sf0.01; the sampled-codebook variant measured 0.92 on the same
    fixture.)"""
    from qaapi_spark.operators.similarity import cosine_topk_ivf
    from qaapi_spark.plans.catalog import t

    rows = t(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    base_ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(7)  # fixed seed: deterministic fixture
    noise = rng.standard_normal(mat.shape)
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    twins = mat + noise * (norm / np.linalg.norm(noise, axis=1, keepdims=True)) * 0.33
    corpus = spark.createDataFrame(
        [
            (int(i), [float(x) for x in v])
            for i, v in zip(
                np.concatenate([base_ids, base_ids + 1_000_000]),
                np.vstack([mat, twins]),
            )
        ],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.filter(F.col("vec_id") < 1_000_000).limit(50)
    got = cosine_topk_ivf(queries, corpus, 3, train_iters=10)
    hits = got.filter(F.col("cand_id") == F.col("query_id") + 1_000_000).count()
    total = queries.count()
    assert hits / total >= 0.9, f"trained-IVF twin recall {hits}/{total}"


def test_distributed_lloyd_matches_catalog_and_is_distributed(spark):
    """lloyd_kmeans_distributed: assignments are total and exclusive,
    clusters reduce within-cluster distance vs init, and the plan
    keeps the corpus distributed (broadcast centroids, no
    LocalTableScan of the embeddings)."""
    from pyspark.sql import functions as F

    from qaapi_spark.operators.kmeans import lloyd_kmeans_distributed

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = lloyd_kmeans_distributed(e, k=4, iters=2)
    n = e.count()
    rows = out.collect()
    assert len(rows) == n
    assert {r.cluster for r in rows} <= set(range(4))
    assert all(r.dist >= 0 for r in rows)
    # iterating must not do worse than the 0-iteration assignment
    d0 = lloyd_kmeans_distributed(e, k=4, iters=0)
    assert (
        out.agg(F.sum("dist")).first()[0]
        <= d0.agg(F.sum("dist")).first()[0] + 1e-9
    )
    # assignment is the Arrow kernel: corpus stays distributed (scanned,
    # mapped in place), the codebook rides as an executor broadcast —
    # there is no join and no corpus-sized LocalTableScan
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p
    assert "embeddings.parquet" in p
