"""Scale-posture assertions for the dedup catalog defaults.

VERDICT r1 next-round #2: the catalog-default `dedup_ngram_jaccard` and
`dedup_embedding_cosine` must be fully distributed — the corpus parquet
scan stays in the final plan, and no corpus-sized collect happens at
plan-build time.  The driver-collect kernels remain available as the
explicitly opt-in `*_dense` / `*_broadcast` catalog entries.
"""

from __future__ import annotations

from qaapi_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_default_ngram_jaccard_is_sparse_inverted_index(spark):
    df = CATALOG["dedup_ngram_jaccard"].fn(spark, SF)
    p = _plan(df)
    # corpus scan is part of the distributed plan (not consumed by a
    # driver-side toPandas at build time) ...
    assert "parquet" in p and "doc_id" in p
    # ... and no materialized corpus re-enters the plan as local rows
    assert "LocalTableScan" not in p
    # the sparse shape is a pure Catalyst join — no Python kernel at all
    assert "MapInPandas" not in p and "FlatMapGroupsInPandas" not in p


def test_default_embedding_cosine_is_blocked_grid(spark):
    df = CATALOG["dedup_embedding_cosine"].fn(spark, SF)
    p = _plan(df)
    assert "parquet" in p and "vec_id" in p
    assert "LocalTableScan" not in p
    # blocked miner = applyInPandas over (bi, bj) groups; the broadcast
    # fast path would show MapInPandas instead (corpus collected+bcast)
    assert "FlatMapGroupsInPandas" in p


def test_connected_components_edges_are_sparse(spark):
    # the CC dedup query feeds on jaccard pairs; its edge relation must
    # be the sparse variant (no driver collect while building edges)
    from qaapi_spark.operators.dedup import ngram_jaccard_pairs_sparse
    from qaapi_spark.plans.catalog import t

    d = t(spark, SF, "documents")
    p = _plan(ngram_jaccard_pairs_sparse(d, 0.4, n=2))
    assert "parquet" in p and "LocalTableScan" not in p
