"""Embedding linear algebra (operators/linalg.py): covariance
correctness vs numpy, power-iteration convergence to the true leading
eigenvector, engine-exactness invariants, and SemDeDup's drop rule."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from qaapi_spark.operators.linalg import (
    _seq_dot,
    _snap,
    covariance_upper,
    power_iteration_pc1,
    project_scores,
)

from tests.conftest import SF_SMOKE


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(v) for v in r]) for i, r in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def _det_matrix(n=40, d=6):
    # deterministic, no RNG: varied enough that the covariance has a
    # clearly dominant direction (dim 0 scaled up)
    x = np.array(
        [[((i * 7 + j * 13) % 23 - 11) / 11.0 for j in range(d)] for i in range(n)]
    )
    x[:, 0] *= 3.0
    return x


def test_covariance_matches_numpy(spark):
    x = _det_matrix()
    # float32 ingest mirrors the parquet column type
    x32 = x.astype(np.float32).astype(np.float64)
    rows = covariance_upper(_vec_df(spark, x.astype(np.float32))).collect()
    d = x.shape[1]
    assert len(rows) == d * (d + 1) // 2
    ref = np.cov(x32, rowvar=False, bias=True)
    for r in rows:
        assert abs(r["cov"] - ref[r["i"] - 1][r["j"] - 1]) < 1e-5, (r, )


def test_power_iteration_finds_leading_eigenvector(spark):
    x = _det_matrix()
    rows = [
        (r["i"], r["j"], r["cov"])
        for r in covariance_upper(_vec_df(spark, x.astype(np.float32))).collect()
    ]
    d = x.shape[1]
    v = np.array(power_iteration_pc1(rows, d, iters=30))
    c = np.cov(x.astype(np.float32).astype(np.float64), rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    lead = vecs[:, np.argmax(w)]
    # same direction up to sign and the 6dp snapping
    assert abs(abs(float(lead @ v)) - 1.0) < 1e-3


def test_projection_is_seq_fold_and_scores_match(spark):
    x = _det_matrix()
    df = _vec_df(spark, x.astype(np.float32))
    v = [_snap(val, 6) for val in np.linalg.qr(_det_matrix(6, 6))[0][:, 0]]
    got = {r["vec_id"]: r["pc1"] for r in project_scores(df, v).collect()}
    for i, row in enumerate(x.astype(np.float32).astype(np.float64)):
        assert abs(got[i] - round(_seq_dot(list(row), v), 4)) <= 1e-4


def test_snap_matches_spark_round_half_up():
    assert _snap(0.1234565, 6) in (0.123456, 0.123457)  # repr-dependent but stable
    assert _snap(2.5e-6, 6) == 3e-06  # exact midpoint goes away from zero
    assert _snap(-2.5e-6, 6) == -3e-06
    assert _snap(1.0, 6) == 1.0


def test_semdedup_drops_planted_twin(spark):
    from qaapi_spark.plans import CATALOG

    out = CATALOG["dedup_semantic_kmeans"].fn(spark, SF_SMOKE).collect()
    n = len(out)
    kept = sum(1 for r in out if r["is_kept"])
    assert n > 0 and 0 < kept <= n
    # twins must land in the same cluster and exactly one survives:
    # recompute the dropped set's defining property on a sample pair
    by_id = {r["vec_id"]: r for r in out}
    dropped = [r for r in out if not r["is_kept"]]
    assert dropped, "testdata plants near-identical embedding twins"
    for r in dropped[:5]:
        # some lower-id vector shares its cluster (necessary condition)
        assert any(
            o["cluster"] == r["cluster"] and o["vec_id"] < r["vec_id"]
            for o in out
        ), r


def test_deflated_second_component_orthogonal(spark):
    import numpy as np

    from qaapi_spark.operators.linalg import power_iteration_two

    x = _det_matrix()
    rows = [
        (r["i"], r["j"], r["cov"])
        for r in covariance_upper(_vec_df(spark, x.astype(np.float32))).collect()
    ]
    d = x.shape[1]
    v1, v2 = power_iteration_two(rows, d, iters=30)
    a, b = np.array(v1), np.array(v2)
    assert abs(float(a @ b)) < 1e-5  # Gram-Schmidt pass holds
    c = np.cov(x.astype(np.float32).astype(np.float64), rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(c)
    order = np.argsort(w)[::-1]
    assert abs(abs(float(vecs[:, order[0]] @ a)) - 1.0) < 1e-3
    assert abs(abs(float(vecs[:, order[1]] @ b)) - 1.0) < 1e-2
