"""Distributed embedding linear algebra with engine-exact arithmetic.

Two building blocks a training-data pipeline runs over its embedding
columns before curation decisions (whitening, PCA-space semantic
dedup, drift monitoring):

- :func:`covariance_upper` — the d x d covariance matrix as rows,
  computed with the srp_quantize cross-engine-exact recipe: inputs
  quantized to int64 fixed point (``floor(x*1e6+0.5)`` over
  bit-identical IEEE doubles), per-partition integer Grams via BLAS
  (every partial an exact integer), exact integer cell sums
  (order-independent), the final covariance formula in doubles over
  bit-identical operands.  This makes a *linear algebra aggregate*
  value-hash-verifiable against DuckDB.
- :func:`power_iteration_pc1` — the leading eigenvector of that
  matrix via power iteration with per-iteration 6-decimal snapping
  and *sequential left-fold* dot products, so an unrolled DuckDB SQL
  oracle iterates bit-identically (same trick that makes the Lloyd
  k-means query hash-checkable).

Scale notes (100 TB): the covariance kernel accumulates a d x d
integer Gram per partition inside one Arrow pass (a BLAS GEMM — no
product-row explode at all), so the shuffle input is O(partitions *
d^2) rows regardless of corpus size; the eigen step touches
only the d x d matrix (driver-side, bounded — the ANN-codebook
pattern), and the projection is map-only with the eigenvector riding
as a literal.  The reference has no linear-algebra surface; this is
part of the extended LLM-pipeline surface (SURVEY §2 extension).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_DECIMAL = "decimal(28,14)"


def _snap(x: float, dp: int) -> float:
    """Round-half-up decimal snap matching Spark's ``F.round`` exactly
    (``BigDecimal.valueOf(double)`` goes through the shortest decimal
    representation, as ``repr`` does here, then HALF_UP) — Python's
    built-in ``round`` is banker's rounding and could diverge at a
    midpoint."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


COV_QUANT = 1_000_000


def covariance_upper(
    df: DataFrame,
    vec_col: str = "embedding",
    round_dp: int = 6,
    quant: int = COV_QUANT,
) -> DataFrame:
    """Upper-triangle covariance rows ``(i, j, cov)`` (1-based dims,
    ``i <= j``, population covariance) of 6dp-fixed-point-quantized
    ``vec_col`` — ``z = floor(x * quant + 0.5)`` per component.

    Shape (round-6 partial-Gram rewrite, VERDICT r5 #3): one
    ``mapInPandas`` pass accumulates a d x d integer Gram + the d
    linear sums per PARTITION (a BLAS GEMM over the quantized matrix,
    exact because every partial stays an integer < 2^53 per <=8k-row
    chunk and accumulates in int64), emitting d(d+1)/2 + d + 1 rows
    per partition; one tiny aggregate sums the exact integer partials
    in DECIMAL(38,0).  The corpus is scanned once and the shuffle is
    O(partitions * d^2) — the n*d(d+1)/2 product-row explode of the
    previous formulation is gone.

    Engine-exactness (the srp_quantize recipe, not the DECIMAL(28,14)
    per-product one): both engines compute z from bit-identical
    doubles (floor over IEEE ops is deterministic), integer sums are
    order-independent, and the final ``ROUND((S/q^2)/n - mi*mj, dp)``
    runs the same double ops over identical operands.  int64 bound:
    n_partition * (quant * max|x|)^2 must stay < 2^63 — ~5e5 rows of
    unit-normalized d=64 float32 per 128 MB partition gives ~1.6e17,
    two orders under the limit (each chunk's partial is asserted
    < 2^53 for float64 exactness, and the running per-partition
    accumulation is asserted < 2^63 so the int64 ``S += g`` can
    never silently wrap).
    """
    return covariance_from_moments(
        gram_partials(df, vec_col, quant), round_dp, quant
    )


def gram_partials(
    df: DataFrame, vec_col: str = "embedding", quant: int = COV_QUANT
) -> DataFrame:
    """Exact integer moment partials ``(i, j, v)`` per partition of
    ``vec_col``: rows with ``i>=1, j>=i`` carry the Gram cell sums
    Σ z_i z_j, rows ``(k, 0)`` the linear sums Σ z_k, and ``(0, 0)``
    the row count — an ADDITION-MERGEABLE state (integer sums are
    order- and grouping-independent), so per-partition, per-epoch, or
    per-day partials all merge to the same covariance.  This is what
    lets :func:`covariance_upper` and the streaming drift monitor
    (`streaming/incremental.stream_covariance_update`) share one
    oracle."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    x = df.select(F.transform(vec_col, lambda v: v.cast("double")).alias("x"))
    q = float(quant)

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        S = None
        T = None
        n = 0
        # Running upper bound on any accumulated cell |S[i,j]| (and on
        # |T[k]| / n, which are strictly smaller): Σ chunk_n * zmax^2.
        # The per-chunk assert keeps each BLAS partial exact in
        # float64 (< 2^53); this cumulative assert keeps the int64
        # `S += g` from silently wrapping on a huge partition
        # (ADVICE r6 #1 — e.g. ~9e6 rows of |z|~1e6 overflows 2^63).
        acc_bound = 0.0
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["x"].to_numpy())
            # chunk so each BLAS partial sum stays an exact integer in
            # float64: chunk_n * (quant*max|x|)^2 < 2^53
            for lo in range(0, len(m), 8000):
                z = np.floor(m[lo:lo + 8000] * q + 0.5)
                zmax = float(np.abs(z).max(initial=1.0))
                assert len(z) * zmax * zmax < 2**53, "gram chunk overflow"
                acc_bound += len(z) * zmax * zmax
                assert acc_bound < 2**63, (
                    "gram partition accumulation would overflow int64; "
                    "repartition the input into smaller partitions"
                )
                g = (z.T @ z).astype(np.int64)
                t_ = z.sum(axis=0).astype(np.int64)
                if S is None:
                    S, T = g, t_
                else:
                    S += g
                    T += t_
                n += len(z)
        if S is None:
            return
        d = S.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu + 1, np.arange(1, d + 1), [0]]),
                "j": np.concatenate([ju + 1, np.zeros(d, np.int64), [0]]),
                "v": np.concatenate([S[iu, ju], T, [n]]),
            }
        )

    return x.mapInPandas(gram, "i int, j int, v long")


def covariance_from_moments(
    parts: DataFrame, round_dp: int = 6, quant: int = COV_QUANT
) -> DataFrame:
    """Close a :func:`gram_partials` relation into upper-triangle
    covariance rows ``(i, j, cov)``: one tiny exact DECIMAL(38,0) sum
    per cell, then the fixed double arithmetic both engines share."""
    q = float(quant)
    agg = parts.groupBy("i", "j").agg(
        F.sum(F.col("v").cast("decimal(38,0)")).alias("s")
    )
    n1 = agg.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("s").cast("double").alias("n")
    )
    means = agg.filter((F.col("i") > 0) & (F.col("j") == 0)).crossJoin(
        F.broadcast(n1)
    ).select(
        F.col("i").alias("k"),
        (F.col("s").cast("double") / F.lit(q) / F.col("n")).alias("m"),
    )
    cells = agg.filter(F.col("j") > 0)
    mi = means.select(F.col("k").alias("i"), F.col("m").alias("mi"))
    mj = means.select(F.col("k").alias("j"), F.col("m").alias("mj"))
    return (
        cells.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .crossJoin(F.broadcast(n1))
        .select(
            "i",
            "j",
            # + 0.0 normalizes IEEE negative zero (ROUND of a tiny
            # negative yields -0.0, which value-hashes as "-0.0")
            (
                F.round(
                    F.col("s").cast("double") / F.lit(q * q) / F.col("n")
                    - F.col("mi") * F.col("mj"),
                    round_dp,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def _seq_dot(row: list[float], v: list[float]) -> float:
    """Sequential left-fold dot product — matches DuckDB
    ``list_reduce`` and Spark ``F.aggregate`` fold order exactly
    (numpy's pairwise/SIMD dot would drift in the last ulp and break
    the per-iteration rounding contract)."""
    acc = 0.0
    for a, b in zip(row, v):
        acc += a * b
    return acc


def power_iteration_pc1(
    cov_rows: list[tuple[int, int, float]],
    dim: int,
    iters: int = 8,
    round_dp: int = 6,
) -> list[float]:
    """Leading eigenvector of the symmetric matrix given as
    ``(i, j, cov)`` upper-triangle rows (1-based), via ``iters`` power
    iterations from the uniform start vector.

    Engine-exact: every matvec entry and the norm are sequential
    left folds in IEEE doubles, and the vector snaps to ``round_dp``
    decimals after each normalization, so an unrolled SQL oracle
    (DuckDB ``list_reduce``) reproduces every iterate bit-for-bit.
    Pure Python on a d x d matrix — bounded driver work by design.
    """
    c = [[0.0] * dim for _ in range(dim)]
    for i, j, cov in cov_rows:
        c[i - 1][j - 1] = cov
        c[j - 1][i - 1] = cov
    v = [_snap(1.0 / dim**0.5, round_dp)] * dim
    for _ in range(iters):
        w = [_seq_dot(c[i], v) for i in range(dim)]
        norm = _seq_dot(w, w) ** 0.5
        if norm == 0.0:
            break
        v = [_snap(x / norm, round_dp) for x in w]
    return v


def project_scores(
    df: DataFrame,
    v: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pc1",
    round_dp: int = 4,
) -> DataFrame:
    """Map-only projection of every vector onto ``v`` (sequential
    left-fold dot, rounded) — the eigenvector rides as a literal
    array, no join, no shuffle."""
    vlit = F.array(*[F.lit(float(x)) for x in v])
    score = F.aggregate(
        F.zip_with(
            F.transform(vec_col, lambda c: c.cast("double")),
            vlit,
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, val: acc + val,
    )
    return df.select(
        F.col(id_col), (F.round(score, round_dp) + F.lit(0.0)).alias(out_col)
    )


def power_iteration_two(
    cov_rows: list[tuple[int, int, float]],
    dim: int,
    iters: int = 8,
    round_dp: int = 6,
) -> tuple[list[float], list[float]]:
    """(v1, v2): the two leading eigenvectors via power iteration plus
    Hotelling deflation, every step snapped like
    :func:`power_iteration_pc1` so the unrolled SQL oracle reproduces
    both vectors bit-for-bit: lambda1 = v1·(C v1) (sequential folds,
    snapped), C2 = snap(C - lambda1 v1 v1ᵀ), then the same iteration
    on C2."""
    c = [[0.0] * dim for _ in range(dim)]
    for i, j, cov in cov_rows:
        c[i - 1][j - 1] = cov
        c[j - 1][i - 1] = cov
    v1 = power_iteration_pc1(cov_rows, dim, iters=iters, round_dp=round_dp)
    w = [_seq_dot(c[i], v1) for i in range(dim)]
    lam = _snap(_seq_dot(v1, w), round_dp)
    c2_rows = [
        (i + 1, j + 1, _snap(c[i][j] - lam * v1[i] * v1[j], round_dp))
        for i in range(dim)
        for j in range(i, dim)
    ]
    v2 = power_iteration_pc1(c2_rows, dim, iters=iters, round_dp=round_dp)
    # one snapped Gram-Schmidt pass: finite iterations + snapping leave
    # a small v1 component in v2 (|v1·v2| ~ 0.06 at 8 iters); removing
    # it is itself engine-exact (raw fold dot, then normalize + snap)
    dp_ = _seq_dot(v1, v2)
    u = [v2[i] - dp_ * v1[i] for i in range(dim)]
    norm = _seq_dot(u, u) ** 0.5
    v2 = [_snap(x / norm, round_dp) for x in u]
    return v1, v2


def project_scores2(
    df: DataFrame,
    v1: list[float],
    v2: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Map-only 2-D projection (pc1, pc2) — both eigenvectors ride as
    literal arrays; zero joins, zero shuffles."""

    def score(v: list[float]):
        vlit = F.array(*[F.lit(float(x)) for x in v])
        return F.round(
            F.aggregate(
                F.zip_with(
                    F.transform(vec_col, lambda cc: cc.cast("double")),
                    vlit,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, val: acc + val,
            ),
            round_dp,
        ) + F.lit(0.0)

    return df.select(
        F.col(id_col), score(v1).alias("pc1"), score(v2).alias("pc2")
    )


def project_scores2_scaled(
    df: DataFrame,
    v1: list[float],
    v2: list[float],
    s1: float,
    s2: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 4,
) -> DataFrame:
    """Map-only WHITENED 2-D projection (w1, w2): each component's
    sequential-fold score divides by its scale (sqrt of the snapped
    eigenvalue) BEFORE the output rounding, so the whitened plane has
    unit variance per axis.  Same engine-exactness contract as
    :func:`project_scores2` — the fold, the one division, and the snap
    are identical IEEE ops in Spark and DuckDB."""

    def score(v: list[float], s: float):
        vlit = F.array(*[F.lit(float(x)) for x in v])
        raw = F.aggregate(
            F.zip_with(
                F.transform(vec_col, lambda cc: cc.cast("double")),
                vlit,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, val: acc + val,
        )
        return F.round(raw / F.lit(float(s)), round_dp) + F.lit(0.0)

    return df.select(
        F.col(id_col),
        score(v1, s1).alias("w1"),
        score(v2, s2).alias("w2"),
    )
