"""Retrieval-wave invariants beyond the oracle gate: SRP-LSH recall
against the exact brute-force ranking, and dedup-materialization
consistency with the component grouping."""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.plans import CATALOG

from tests.conftest import SF_SMOKE


def test_srp_lsh_recall_on_planted_neighbors(spark):
    """LSH's design regime is strong similarity (near-dup search at
    cosine >= ~0.9) — the synthetic corpus's true top-k sit at cosine
    0.27-0.39 where *no* small LSH family has high recall (the s-curve
    is flat there).  So plant a perturbed twin (cosine ~0.95) for each
    query and assert the twin is recovered: p(bit agree) ~ 0.9 at 18
    degrees => p(>=1 of 4 four-bit bands collide) ~ 0.99."""
    import numpy as np

    from qaapi_spark.operators.retrieval import srp_lsh_topk
    from qaapi_spark.plans.catalog import t

    rows = t(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    base_ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(7)  # fixed seed: deterministic fixture
    noise = rng.standard_normal(mat.shape)
    norm = np.linalg.norm(mat, axis=1, keepdims=True)
    twins = mat + noise * (norm / np.linalg.norm(noise, axis=1, keepdims=True)) * 0.33
    twin_ids = base_ids + 1_000_000
    corpus = spark.createDataFrame(
        [
            (int(i), [float(x) for x in v])
            for i, v in zip(np.concatenate([base_ids, twin_ids]), np.vstack([mat, twins]))
        ],
        "vec_id long, embedding array<float>",
    )
    queries = corpus.filter(F.col("vec_id") < 1_000_000).limit(50)
    got = srp_lsh_topk(queries, corpus, k=3)
    hits = got.filter(F.col("cand_id") == F.col("query_id") + 1_000_000).count()
    total = queries.count()
    assert hits / total >= 0.8, f"planted-twin recall {hits}/{total}"


def test_srp_lsh_precision_is_exact(spark):
    """Rerank is exact cosine, so every returned (q, c, cosine) must
    agree with the brute-force score for that same pair."""
    exact = CATALOG["ann_topk_bruteforce"].fn(spark, SF_SMOKE)
    approx = CATALOG["ann_topk_srp_lsh"].fn(spark, SF_SMOKE).filter(
        F.col("query_id") != F.col("cand_id")
    )
    joined = approx.alias("a").join(
        exact.alias("e"), ["query_id", "cand_id"]
    )
    bad = joined.filter(F.col("a.cosine") != F.col("e.cosine")).count()
    assert bad == 0


def test_keep_representatives_matches_components(spark):
    comp = CATALOG["dedup_connected_components"].fn(spark, SF_SMOKE)
    kept = CATALOG["dedup_keep_representatives"].fn(spark, SF_SMOKE)
    n_components = comp.select("comp").distinct().count()
    assert kept.count() == n_components
    # every kept doc is its own component representative
    reps = comp.filter(F.col("doc_id") == F.col("comp")).select("doc_id")
    assert kept.select("doc_id").exceptAll(reps).count() == 0


def test_bm25_scores_only_matching_docs(spark):
    """BM25 output contains exactly docs containing >=1 query term."""
    from qaapi_spark.plans.llm_retrieval import _BM25_TERMS
    from qaapi_spark.operators.retrieval import bm25_scores
    from qaapi_spark.plans.catalog import t

    d = t(spark, SF_SMOKE, "documents")
    scores = bm25_scores(d, _BM25_TERMS)
    pat = "(^| )(" + "|".join(_BM25_TERMS) + ")( |$)"
    expected = d.filter(F.lower(F.col("text")).rlike(pat)).count()
    assert scores.count() == expected
    assert scores.filter(F.col("score") <= 0).count() == 0


def test_pq_topk_recall_vs_bruteforce(spark):
    """PQ-ADC with exact rerank: assert recall@5 against the exact
    brute-force top-5 on the real embeddings table, for both the
    deterministic-sample codebook and the Lloyd-trained one (VERDICT
    r2 next #8 tightened this bar from 0.7 to 0.9; it sits at 1.0
    since the self-match exclusion fix)."""
    from qaapi_spark.operators.retrieval import pq_topk
    from qaapi_spark.operators.similarity import cosine_topk_bruteforce
    from qaapi_spark.plans.catalog import t

    e = t(spark, SF_SMOKE, "embeddings")
    qs = e.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r.query_id, r.cand_id)
        for r in cosine_topk_bruteforce(qs, e, 5).collect()
    }
    for iters in (0, 10):
        approx = {
            (r.query_id, r.cand_id)
            for r in pq_topk(qs, e, 5, train_iters=iters).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"PQ recall@5 (train_iters={iters}) = {recall}"
        assert all(q != c for q, c in approx), "self-matches must be excluded"


def test_pq_precision_is_exact(spark):
    """The rerank stage recomputes true cosine, so every returned score
    must equal the exact cosine between the pair."""
    import numpy as np

    from qaapi_spark.operators.retrieval import pq_topk
    from qaapi_spark.plans.catalog import t

    e = t(spark, SF_SMOKE, "embeddings")
    qs = e.filter(F.col("vec_id") % 100 == 0)
    got = pq_topk(qs, e, 5).collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in e.collect()}
    for r in got:
        a, b = vecs[r.query_id], vecs[r.cand_id]
        want = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)
        assert abs(r.cosine - want) < 1e-9


def test_pq_encode_is_compact_and_maponly(spark):
    from qaapi_spark.operators.retrieval import pq_codebook, pq_encode
    from qaapi_spark.plans.catalog import t

    e = t(spark, SF_SMOKE, "embeddings")
    cb = pq_codebook(e, m=8, ksub=16, seed_mod=2)
    assert cb.shape == (8, 16, 8)
    codes = pq_encode(e, cb)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only: no shuffle to encode
    row = codes.first()
    assert len(row.codes) == 8 and all(0 <= c < 16 for c in row.codes)


def test_ivfpq_topk_planted_twin_recall(spark):
    """IVFADC must recover a planted near-duplicate twin (cosine ~0.95)
    for >= 0.9 of queries — the twin's cell matches its original's, its
    residual code sits nearest in ADC space, and the exact rerank
    confirms it.  General top-5 recall is bounded by the COARSE
    quantizer, not PQ (measured: nprobe=3/rerank x64 equals plain-IVF
    nprobe=3 recall 0.52 at smoke scale; the catalog entry runs
    nprobe=5/rerank x32 -> 0.64), so the twin regime is the honest
    quality bar, matching test_ivf_trained_planted_twin_recall."""
    import numpy as np

    from qaapi_spark.operators.retrieval import ivfpq_topk
    from qaapi_spark.plans.catalog import t

    rows = t(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding").collect()
    base_ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(7)
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
    got = ivfpq_topk(queries, corpus, 3, nprobe=5)
    hits = got.filter(F.col("cand_id") == F.col("query_id") + 1_000_000).count()
    total = queries.count()
    assert hits / total >= 0.9, f"IVFPQ twin recall {hits}/{total}"
    assert got.filter(F.col("cand_id") == F.col("query_id")).count() == 0


def test_ivfpq_precision_is_exact(spark):
    """IVFADC's rerank recomputes true cosine — every returned score
    equals the exact pair cosine."""
    import numpy as np

    from qaapi_spark.operators.retrieval import ivfpq_topk
    from qaapi_spark.plans.catalog import t

    e = t(spark, SF_SMOKE, "embeddings")
    qs = e.filter(F.col("vec_id") % 100 == 0)
    got = ivfpq_topk(qs, e, 5).collect()
    assert len(got) > 0
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in e.collect()}
    for r in got:
        a, b = vecs[r.query_id], vecs[r.cand_id]
        want = round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 4)
        assert abs(r.cosine - want) < 1e-9


def test_tfidf_dense_overflow_guard_sees_corpus_side(spark):
    """Round-6 (ADVICE r5, medium): the 2^53 exactness guard must bind
    on the GLOBAL quantized weight max, not just the query stripe — a
    doc-only large weight would otherwise silently break the integer
    bound the DuckDB oracle's double sums rely on.  An absurd quant
    trips the bound for every corpus; the error must be a clear
    ValueError, not a hash mismatch downstream."""
    import pytest

    from qaapi_spark.operators.retrieval import tfidf_cosine_topk_dense
    from qaapi_spark.plans.catalog import t

    d = t(spark, SF_SMOKE, "documents").limit(50)
    with pytest.raises(ValueError, match="fixed-point dot overflow"):
        tfidf_cosine_topk_dense(d, query_mod=10, k_pool=5, quant=10**9)


def test_srp_lsh_default_recall_meets_serving_bar(spark):
    """Round-9 retune contract (VERDICT r8 wrong #2): the DEFAULT
    SRP-LSH parameterization (128 planes / 16 bands / 1-flip
    multi-probe) must measure recall@5 >= 0.8 against exact brute
    force on the full sf0.1 corpus — the serving bar the 16/4 default
    missed (0.40).  Uses the in-engine eval so the number asserted is
    the number the catalog reports."""
    from qaapi_spark.plans import CATALOG

    row = (
        CATALOG["ann_recall_eval_srp"].fn(spark, "/root/testdata/sf0.1").collect()[0]
    )
    assert row["recall_at_k"] >= 0.8, row


def test_corpus_rows_footer_matches_count(spark):
    """_corpus_rows (footer num_rows, no job) must equal the Spark
    count on the real corpus, and fall back to count() when the path
    does not exist."""
    from qaapi_spark.plans.llm_retrieval import _corpus_rows
    from qaapi_spark.sources.tables import read_table

    sf = "/root/testdata/sf0.001"
    e = read_table(spark, sf, "embeddings")
    assert _corpus_rows(sf, e) == e.count()
    # missing path -> fallback consumes the passed relation
    assert _corpus_rows("/no/such/dir", e.limit(7)) == 7
