"""Round-11 miner cost-routing tests (VERDICT r10 next #2): the pure
regime crossover, the adaptive IVF parameter derivation (Python/SQL
twins), rank-init equivalence on contiguous ids, and the route flip at
the sf0.1 corpus size."""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.plans.llm_retrieval import (
    _IVF_OCC,
    _IVF_TRAIN_CAP,
    _MINE_TOUCH_BUDGET,
    _mine_ivf_params,
    _mine_pool_regime,
    _mine_pool_routed,
)
from tests.conftest import SF_SMOKE

SF_BENCH = "/root/testdata/sf0.1"


def test_regime_crossover():
    """SRP's expected scored rows per anchor are 0.5625 n for the
    128-plane/16-band/1-flip config (16 bands x 9 probe keys x n/256
    occupancy); the route flips to IVF exactly where that exceeds the
    1024-row budget — n* = floor(1024 / 0.5625) = 1820."""
    assert _mine_pool_regime(500) == "srp"
    assert _mine_pool_regime(1820) == "srp"  # 1023.75 <= 1024
    assert _mine_pool_regime(1821) == "ivf"  # 1024.3 > 1024
    assert _mine_pool_regime(2000) == "ivf"
    assert _mine_pool_regime(10**9) == "ivf"
    # budget is the caller's dial
    assert _mine_pool_regime(2000, budget=2048) == "srp"


def test_ivf_params_match_sql_twins():
    """_mine_ivf_params must equal the CEIL arithmetic the oracle's
    scalar subqueries (_K_CELLS_EXPR / _NPROBE_EXPR / _STRIDE_EXPR)
    compute, for corpus sizes around every boundary."""
    import math

    assert _mine_ivf_params(500) == (32, 12, 1)
    assert _mine_ivf_params(2000) == (125, 47, 2)
    for n in (1, 15, 16, 17, 1024, 1025, 99_999):
        k, nprobe, stride = _mine_ivf_params(n)
        assert k == math.ceil(n / _IVF_OCC)
        assert nprobe == math.ceil(3 * k / 8.0)
        assert stride == math.ceil(n / _IVF_TRAIN_CAP)
        assert 1 <= nprobe <= k


def test_rank_init_equals_prefix_init_on_contiguous_ids(spark):
    """rank_init=True (first k rows BY RANK, the stripe-safe init) must
    reproduce the id<k prefix init exactly when ids are contiguous
    from 0 — the stride=1 case every existing green consumer hits."""
    from qaapi_spark.operators.kmeans import lloyd_centroids_distributed

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(64)
    a = lloyd_centroids_distributed(e, k=4, iters=2).collect()
    b = lloyd_centroids_distributed(e, k=4, iters=2, rank_init=True).collect()
    assert sorted((r["cid"], tuple(r["c"])) for r in a) == sorted(
        (r["cid"], tuple(r["c"])) for r in b
    )


def test_route_flips_to_ivf_at_bench_sf(spark):
    """At sf0.1 (n=2000 > n*=1820) the routed pool must take the IVF
    branch; at smoke SF (n=500) the SRP branch.  The pool DataFrame is
    lazy, so this asserts the decision without paying the fit."""
    from qaapi_spark.plans.llm_retrieval import _mine_anchor_inputs

    for sf_dir, want in ((SF_SMOKE, "srp"), (SF_BENCH, "ivf")):
        _pos, e, qs, _partners = _mine_anchor_inputs(spark, sf_dir)
        pool, route = _mine_pool_routed(spark, sf_dir, e, qs)
        assert route == want, sf_dir
        assert set(pool.columns) == {"query_id", "cand_id", "cosine"}


def test_stripe_codebook_has_k_cells(spark):
    """The stripe-trained adaptive codebook must emit exactly k_cells
    rows (rank init found k seeds; no cluster emptied at smoke SF) of
    the corpus dimension."""
    from qaapi_spark.plans.llm_retrieval import _mine_ivf_codebook_kernel

    n = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    k, _nprobe, _stride = _mine_ivf_params(n)
    cents = _mine_ivf_codebook_kernel(spark, SF_SMOKE).collect()
    assert len(cents) == k
    assert all(len(r["c"]) == 64 for r in cents)
