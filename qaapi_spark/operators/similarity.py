"""Similarity search over embedding columns (array<float>).

Physical strategy: dense vector math is the one place where built-in
expression folds lose badly to vectorized kernels, so the hot paths are
Arrow-batched numpy GEMMs inside ``mapInPandas`` (one matrix multiply
per Arrow batch — no per-row Python, no shuffle added):

  - ``nearest_broadcast``: stream the big side, broadcast the small
    reference matrix (queries / centroids); per batch compute
    B x R^T and take per-row top-k.  This is the scale shape: the
    streamed side is unbounded, the broadcast side bounded.
  - brute-force top-k: stream *candidates*, broadcast *queries*,
    emit per-batch partial top-k per query, then a tiny global
    top-k reduce — exact ANN baseline that survives an unbounded
    corpus.
  - pair mining (cosine >= threshold): broadcast the normalized
    corpus matrix and stream it against itself (upper triangle).
    Bounded-corpus operator; at 100 TB swap in the block-id
    cross-join variant (same kernel per block pair).

Expression-level ``dot``/``l2_norm`` (zip_with + aggregate) are kept
for row-at-a-time composition in other plans.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qaapi_spark.operators.windows import topk_per_group

_PAIR_SCHEMA = "query_id long, cand_id long, cosine double"

# Driver/executor ceiling for the binary-Hamming screen's query-side
# collect+broadcast: the screen kernel builds an (n_query x batch)
# int64 grid per Arrow batch, so n_query is the memory lever on BOTH
# sides.  8192 queries x ~10k-row batches = ~650 MB of transient grid
# per task — the practical edge on local[32]; catalog queries use
# a few hundred.
_HAMMING_QUERY_MAX: int = 8192


def dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays in double precision (sequential
    left fold => deterministic, engine-portable result)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def with_unit_vector(df: DataFrame, vec_col: str, out_col: str = "unit_vec") -> DataFrame:
    """Pre-normalize so cosine == dot of unit vectors (normalize once,
    not once per pair)."""
    n = l2_norm(F.col(vec_col))
    return df.withColumn(
        out_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double") / n),
    )


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids, L2-normalized float64 matrix) for a broadcast-sized side."""
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def nearest_broadcast(
    stream: DataFrame,
    ref: DataFrame,
    k: int,
    stream_id: str = "vec_id",
    stream_vec: str = "embedding",
    ref_id: str = "vec_id",
    ref_vec: str = "embedding",
    round_to: int = 4,
    exclude_self: bool = False,
) -> DataFrame:
    """For every streamed row, its k nearest reference rows by cosine.

    The reference side is collected + broadcast (bounded: query sets,
    centroid codebooks); the streamed side is unbounded.  Output
    (query_id=stream id, cand_id=ref id, cosine), ranked
    deterministically on (rounded cosine desc, cand_id asc).
    """
    r_ids, r_mat = _collect_matrix(ref, ref_id, ref_vec)
    spark = stream.sparkSession
    b = spark.sparkContext.broadcast((r_ids, r_mat))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = b.value
        for pdf in batches:
            s = np.stack(pdf[stream_vec].to_numpy()).astype(np.float64)
            s /= np.linalg.norm(s, axis=1, keepdims=True)
            sims = np.round(s @ mat.T, round_to)  # (batch, n_ref)
            s_ids = pdf[stream_id].to_numpy(dtype=np.int64)
            if exclude_self:
                mask = s_ids[:, None] == ids[None, :]
                sims[mask] = -np.inf
            kk = min(k, sims.shape[1])
            # rank by (-cosine, cand_id): lexsort is stable + deterministic
            order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims), axis=1)[:, :kk]
            out_q = np.repeat(s_ids, kk)
            out_c = ids[order].ravel()
            out_s = np.take_along_axis(sims, order, axis=1).ravel()
            keep = np.isfinite(out_s)
            yield pd.DataFrame(
                {"query_id": out_q[keep], "cand_id": out_c[keep], "cosine": out_s[keep]}
            )

    return stream.select(stream_id, stream_vec).mapInPandas(gen, _PAIR_SCHEMA)


def cosine_topk_bruteforce(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k by cosine: stream candidates, broadcast queries.

    Per Arrow batch: GEMM + per-query partial top-k (at most k rows per
    query per batch leave the executor), then a global top-k reduce.
    Candidates can be arbitrarily large; queries must fit in a broadcast.
    """
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast((q_ids, q_mat))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = b.value
        for pdf in batches:
            c = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = np.round(mat @ c.T, round_to)  # (n_query, batch)
            sims[q_ids[:, None] == c_ids[None, :]] = -np.inf  # self-match
            kk = min(k, sims.shape[1])
            order = np.lexsort((np.broadcast_to(c_ids, sims.shape), -sims), axis=1)[:, :kk]
            out_q = np.repeat(ids, kk)
            out_c = c_ids[order].ravel()
            out_s = np.take_along_axis(sims, order, axis=1).ravel()
            keep = np.isfinite(out_s)
            yield pd.DataFrame(
                {"query_id": out_q[keep], "cand_id": out_c[keep], "cosine": out_s[keep]}
            )

    partial = candidates.select(id_col, vec_col).mapInPandas(gen, _PAIR_SCHEMA)
    return topk_per_group(partial, ["query_id"], [F.desc("cosine"), F.asc("cand_id")], k)


def cosine_topk_filtered(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str = "label",
    round_to: int = 4,
) -> DataFrame:
    """Metadata-filtered exact top-k by cosine — the vector-DB
    "search within my tenant/class" surface: each query ranks only
    candidates whose ``filter_col`` equals the query's own, scored
    and tie-broken exactly like :func:`cosine_topk_bruteforce`.

    Same scale shape as the unfiltered kernel (broadcast queries +
    their filter values, stream candidates, per-batch GEMM + partial
    top-k); the filter is a mask on the score grid, NOT a pre-shuffle
    — so a low-selectivity filter costs nothing extra and a
    high-selectivity one still never shuffles the corpus.
    """
    from typing import Iterator

    import pandas as pd

    # one collect so ids/vectors/filter values share a row order
    rows = queries.select(id_col, vec_col, filter_col).collect()
    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    q_mat = np.array([r[1] for r in rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_lab = np.array([r[2] for r in rows], dtype=np.int64)
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast((q_ids, q_mat, q_lab))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat, lab = b.value
        for pdf in batches:
            c = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            c_ids = pdf[id_col].to_numpy(dtype=np.int64)
            c_lab = pdf[filter_col].to_numpy(dtype=np.int64)
            sims = np.round(mat @ c.T, round_to)  # (n_query, batch)
            sims[ids[:, None] == c_ids[None, :]] = -np.inf  # self-match
            sims[lab[:, None] != c_lab[None, :]] = -np.inf  # filter
            kk = min(k, sims.shape[1])
            order = np.lexsort((np.broadcast_to(c_ids, sims.shape), -sims), axis=1)[:, :kk]
            out_q = np.repeat(ids, kk)
            out_c = c_ids[order].ravel()
            out_s = np.take_along_axis(sims, order, axis=1).ravel()
            keep = np.isfinite(out_s)
            yield pd.DataFrame(
                {"query_id": out_q[keep], "cand_id": out_c[keep], "cosine": out_s[keep]}
            )

    partial = candidates.select(id_col, vec_col, filter_col).mapInPandas(
        gen, _PAIR_SCHEMA
    )
    return topk_per_group(partial, ["query_id"], [F.desc("cosine"), F.asc("cand_id")], k)


def mmr_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    pool: int = 10,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): per query, fetch a ``pool``-sized exact
    cosine candidate pool, then greedily select ``k`` — each step
    maximizing ``lam*rel - (1-lam)*max_sim_to_selected`` with
    deterministic (score desc, cand_id) ties.  Output
    (query_id, rank, cand_id, mmr) with the rank-1 score = relevance.

    Scale shape: the pool fetch is the brute-force kernel (broadcast
    queries, streamed corpus, per-batch partial top-k); the greedy
    re-rank touches only pool-sized groups — ``applyInPandas`` over
    (query, pool) islands, pool^2 sims per query, never the corpus.

    Exactness: relevance and pairwise sims are 4dp-rounded doubles
    (the bruteforce recipe), ``lam=0.5`` scales by a power of two, so
    every step's score arithmetic is bit-identical in DuckDB and the
    k greedy rounds unroll as chained CTEs (the Lloyd trick).
    """
    from typing import Iterator  # noqa: F401

    import pandas as pd

    pool_df = cosine_topk_bruteforce(
        queries, candidates, pool, id_col=id_col, vec_col=vec_col, round_to=round_to
    )
    vecs = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    grouped = pool_df.join(vecs, "cand_id")

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("cand_id", ignore_index=True)
        m = np.stack(pdf["cv"].to_numpy()).astype(np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ m.T, round_to)
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        cids = pdf["cand_id"].to_numpy(dtype=np.int64)
        sel: list[int] = []
        scores_out: list[float] = []
        remaining = list(range(len(cids)))
        while remaining and len(sel) < k:
            if sel:
                cur = lam * rel - (1.0 - lam) * sims[:, sel].max(axis=1)
            else:
                cur = rel
            pick = min(remaining, key=lambda i: (-cur[i], cids[i]))
            sel.append(pick)
            # 5dp, not 4: an MMR score is HALF of a difference of
            # 4dp values, i.e. systematically AT 4dp midpoints where
            # np.round (half-even) and DuckDB ROUND (half-away)
            # disagree; at 5dp those values are exactly representable
            # and the round is midpoint-free on both engines
            scores_out.append(float(np.round(cur[pick], round_to + 1)) + 0.0)
            remaining.remove(pick)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "rank": np.arange(1, len(sel) + 1, dtype=np.int64),
                "cand_id": cids[sel],
                "mmr": scores_out,
            }
        )

    return grouped.groupBy("query_id").applyInPandas(
        mmr, "query_id long, rank long, cand_id long, mmr double"
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold (exact).

    Streams the corpus against a broadcast of itself (upper-triangle
    GEMM).  Bounded-corpus shape: for an unbounded corpus, grid the
    ids into blocks and run the same kernel per block pair.
    """
    a_ids, a_mat = _collect_matrix(df, id_col, vec_col)
    spark = df.sparkSession
    b = spark.sparkContext.broadcast((a_ids, a_mat))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = b.value
        for pdf in batches:
            s = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            s /= np.linalg.norm(s, axis=1, keepdims=True)
            s_ids = pdf[id_col].to_numpy(dtype=np.int64)
            sims = np.round(s @ mat.T, round_to)
            ii, jj = np.nonzero((sims >= threshold) & (s_ids[:, None] < ids[None, :]))
            yield pd.DataFrame(
                {"query_id": s_ids[ii], "cand_id": ids[jj], "cosine": sims[ii, jj]}
            )

    return (
        df.select(id_col, vec_col)
        .mapInPandas(gen, _PAIR_SCHEMA)
        .select(
            F.col("query_id").alias("id_a"),
            F.col("cand_id").alias("id_b"),
            "cosine",
        )
    )


def embedding_near_dup_pairs_blocked(
    df: DataFrame,
    threshold: float,
    n_blocks: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Blocked exact pair mining — the unbounded-corpus shape.

    Grid the ids into n_blocks by hash; each row is replicated to every
    block-pair it participates in (factor n_blocks), then one
    applyInPandas GEMM per (block_i, block_j) group.  No broadcast of
    the corpus: memory per task is two blocks, shuffle is keyed on the
    block pair.  Output identical to ``embedding_near_dup_pairs``.
    """
    from typing import Iterator  # noqa: F401

    blk = (F.col(id_col) % n_blocks).cast("int")
    tagged = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), blk.alias("blk"))
    # replicate each row to all block pairs (min(bi,bj), max(bi,bj))
    pairs_of = F.array(
        *[
            F.struct(
                F.least("blk", F.lit(o)).alias("bi"),
                F.greatest("blk", F.lit(o)).alias("bj"),
            )
            for o in range(n_blocks)
        ]
    )
    replicated = tagged.select(
        "id", "vec", "blk", F.explode(F.array_distinct(pairs_of)).alias("bp")
    ).select("id", "vec", "blk", F.col("bp.bi").alias("bi"), F.col("bp.bj").alias("bj"))

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        left = pdf[pdf["blk"] == bi]
        right = pdf[pdf["blk"] == bj]
        if left.empty or right.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        lm = np.stack(left["vec"].to_numpy()).astype(np.float64)
        lm /= np.linalg.norm(lm, axis=1, keepdims=True)
        rm = np.stack(right["vec"].to_numpy()).astype(np.float64)
        rm /= np.linalg.norm(rm, axis=1, keepdims=True)
        l_ids = left["id"].to_numpy(dtype=np.int64)
        r_ids = right["id"].to_numpy(dtype=np.int64)
        sims = np.round(lm @ rm.T, round_to)
        if bi == bj:
            # same-block: matrix holds both orderings; count each once
            ii, jj = np.nonzero((sims >= threshold) & (l_ids[:, None] < r_ids[None, :]))
            return pd.DataFrame({"id_a": l_ids[ii], "id_b": r_ids[jj], "cosine": sims[ii, jj]})
        # cross-block: each unordered pair appears once; normalize order
        ii, jj = np.nonzero(sims >= threshold)
        a, b = l_ids[ii], r_ids[jj]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b), "cosine": sims[ii, jj]}
        )

    return replicated.groupBy("bi", "bj").applyInPandas(
        score, "id_a long, id_b long, cosine double"
    )


def cosine_topk_ivf(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    n_centroids_mod: int = 37,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    train_iters: int = 0,
    n_centroids: int | None = None,
    train_rows: int = 4096,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: probe only the nprobe nearest
    centroid buckets per query.

    With ``train_iters == 0`` centroids are a deterministic sample of
    the corpus (vec_id % n_centroids_mod == 0) — seed-free AND
    SQL-reproducible, so this configuration carries a full DuckDB
    oracle.  With ``train_iters > 0`` the codebook is fitted with
    deterministic spherical k-means over a bounded training stripe
    (operators/kmeans.py) — better-balanced buckets and higher recall
    at the same nprobe, still rerun-stable, but no longer
    SQL-expressible (rows-only check + recall test).  Plan either way:
    (1) assign candidates to nearest centroid (broadcast codebook GEMM,
    map-only), (2) probe top-nprobe centroids per query, (3)
    shuffle-join probes x assignments on centroid_id and score only
    those pairs.

    A caller may hand in a prefit codebook relation
    (``cents``: centroid_id, cvec) — e.g. the engine-exact distributed
    Lloyd centroids (operators/kmeans.lloyd_centroids_distributed),
    which keeps the trained-codebook configuration SQL-reproducible.
    """
    if cents is not None:
        pass
    elif train_iters > 0:
        from qaapi_spark.operators.kmeans import spherical_kmeans, training_sample

        sample = training_sample(candidates, train_rows, id_col, vec_col)
        k_cents = n_centroids or max(1, len(sample) // n_centroids_mod)
        fitted = spherical_kmeans(sample, k_cents, train_iters)
        cents = candidates.sparkSession.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(fitted)],
            "centroid_id long, cvec array<double>",
        )
    else:
        cents = candidates.filter(F.col(id_col) % n_centroids_mod == 0).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
        )
    assigned = nearest_broadcast(
        candidates, cents, 1, stream_id=id_col, stream_vec=vec_col,
        ref_id="centroid_id", ref_vec="cvec", round_to=round_to,
    ).select(F.col("query_id").alias("cand_id"), F.col("cand_id").alias("centroid_id"))
    probes = nearest_broadcast(
        queries, cents, nprobe, stream_id=id_col, stream_vec=vec_col,
        ref_id="centroid_id", ref_vec="cvec", round_to=round_to,
    ).select(F.col("query_id"), F.col("cand_id").alias("centroid_id"))

    cand_vecs = candidates.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cvec"))
    pairs = (
        probes.join(assigned, "centroid_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .join(cand_vecs, "cand_id")
    )
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast({int(i): v for i, v in zip(q_ids, q_mat)})

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qmap = b.value
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.stack(pdf["cvec"].to_numpy()).astype(np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            q = np.stack([qmap[int(x)] for x in pdf["query_id"]])
            sims = np.round(np.einsum("ij,ij->i", q, c), round_to)
            yield pd.DataFrame(
                {"query_id": pdf["query_id"], "cand_id": pdf["cand_id"], "cosine": sims}
            )

    scored = pairs.select("query_id", "cand_id", "cvec").mapInPandas(score, _PAIR_SCHEMA)
    return topk_per_group(scored, ["query_id"], [F.desc("cosine"), F.asc("cand_id")], k)


def sign_bits(vec: Column, d: int = 64) -> Column:
    """Pack the sign pattern of a <=64-dim float vector into ONE long:
    bit i set iff ``vec[i] >= 0`` (note -0.0 >= 0 is true under IEEE,
    identically in every engine).  Disjoint bits sum exactly in long
    arithmetic; bit 63's weight is the two's-complement negative so the
    packed value stays a valid signed 64-bit int.  All JVM-side — the
    binary quantization step never leaves whole-stage codegen."""
    if d > 64:
        raise ValueError(f"sign_bits packs at most 64 dims, got {d}")
    terms = [
        F.when(vec[i] >= 0, F.lit(w)).otherwise(F.lit(0)).cast("long")
        for i, w in ((i, (1 << i) if i < 63 else -(1 << 63)) for i in range(d))
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def hamming_topk_binary(
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    rerank_pool: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    d: int = 64,
    round_to: int = 4,
) -> DataFrame:
    """Binary-quantized ANN: sign-bit vectors + Hamming-distance
    screen, exact-cosine rerank of the top ``rerank_pool`` candidates.

    The 100 TB memory play for vector search: a d<=64-dim float corpus
    compresses 32x into one int64 per vector (`sign_bits`, pure JVM
    expression), the query bit set is broadcast, and the screen is an
    Arrow kernel streaming the bit corpus: per batch one vectorized
    XOR+popcount matrix and a PER-BATCH partial top-pool, so at most
    queries x pool rows per batch ever reach the shuffle (any global
    top-pool row is in its batch's top-pool under the same (hamming,
    cand_id) order, so batch cuts are lossless — the
    cosine_topk_bruteforce lemma).  A window top-k over the raw
    queries x corpus grid instead shuffles the whole grid: 30 s vs
    ~3 s at 50k vectors x 500 queries.  Only pool-sized candidate
    sets ever touch the full-precision vectors again (the float
    corpus is joined, not broadcast).  Deterministic ranking:
    (hamming asc, cand_id) for the pool, (rounded cosine desc,
    cand_id) for the final k.

    Contract: ``queries`` must be a subset (by ``id_col``) of
    ``candidates`` — the query bit vectors are read off the corpus
    packing, so an out-of-corpus query returns no rows.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from qaapi_spark.operators.dedup import _popcount_u64

    spark = queries.sparkSession
    cb = candidates.select(
        F.col(id_col).alias("cand_id"), sign_bits(F.col(vec_col), d).alias("cbits")
    )
    # Query bits come off the same corpus packing (queries are a
    # filtered view of the corpus in every catalog use) — one bounded
    # collect of the query stripe's packed ints, broadcast to the
    # screen kernel.  The bound is ENFORCED, not assumed (ADVICE r7
    # #3, same contract as the dense-Jaccard pack's driver ceiling):
    # the screen also materializes a (n_query x batch) int64 distance
    # grid per Arrow batch, so a corpus-sized "query" relation would
    # blow executor memory before it blew the driver — fail fast with
    # the fix (swap roles or shard the query set).
    q_stripe = cb.join(
        F.broadcast(queries.select(F.col(id_col).alias("cand_id"))),
        "cand_id",
        "left_semi",
    ).limit(_HAMMING_QUERY_MAX + 1)
    q_rows = q_stripe.collect()
    if len(q_rows) > _HAMMING_QUERY_MAX:
        raise ValueError(
            f"hamming_topk_binary: > {_HAMMING_QUERY_MAX} query vectors "
            "would be collected/broadcast to the screen kernel; shard "
            "the query relation or raise _HAMMING_QUERY_MAX deliberately"
        )
    q_ids = np.array([r["cand_id"] for r in q_rows], dtype=np.int64)
    q_bits = np.array([r["cbits"] for r in q_rows], dtype=np.int64).view(np.uint64)
    bq = spark.sparkContext.broadcast((q_ids, q_bits))

    def screen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, bits = bq.value
        if not len(ids):
            return
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf["cand_id"].to_numpy(dtype=np.int64)
            c_bits = pdf["cbits"].to_numpy(dtype=np.int64).view(np.uint64)
            # (n_query, batch) XOR + popcount, int16-sized values
            hd = _popcount_u64(bits[:, None] ^ c_bits[None, :]).astype(np.int64)
            hd[ids[:, None] == c_ids[None, :]] = np.iinfo(np.int64).max  # self
            kk = min(rerank_pool, hd.shape[1])
            order = np.lexsort((np.broadcast_to(c_ids, hd.shape), hd), axis=1)[:, :kk]
            out_q = np.repeat(ids, kk)
            out_c = c_ids[order].ravel()
            out_h = np.take_along_axis(hd, order, axis=1).ravel()
            keep = out_h < np.iinfo(np.int64).max
            yield pd.DataFrame(
                {"query_id": out_q[keep], "cand_id": out_c[keep], "hamming": out_h[keep]}
            )

    partial = cb.mapInPandas(screen, "query_id long, cand_id long, hamming long")
    pool = topk_per_group(
        partial, ["query_id"], [F.asc("hamming"), F.asc("cand_id")], rerank_pool
    )
    uq = with_unit_vector(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("unit_vec").alias("uq")
    )
    # Semi-filter the corpus to pool members BEFORE normalizing: the
    # 64-term unit-vector fold runs on <= queries x pool rows, never
    # the full corpus (only the one-int64 sign bits touched everyone).
    uc = with_unit_vector(
        candidates.join(
            F.broadcast(pool.select(F.col("cand_id").alias(id_col)).distinct()),
            id_col,
            "left_semi",
        ),
        vec_col,
    ).select(F.col(id_col).alias("cand_id"), F.col("unit_vec").alias("uc"))
    rr = (
        uc.join(F.broadcast(pool), "cand_id")
        .join(F.broadcast(uq), "query_id")
        .select(
            "query_id",
            "cand_id",
            "hamming",
            F.round(dot(F.col("uq"), F.col("uc")), round_to).alias("cosine"),
        )
    )
    return topk_per_group(
        rr, ["query_id"], [F.desc("cosine"), F.asc("cand_id")], k
    )
