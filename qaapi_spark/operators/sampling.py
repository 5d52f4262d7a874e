"""Deterministic sampling / dataset-splitting operators.

Training-data pipelines need *reproducible* splits and samples: the
same document must land in the same split on every run, on any engine,
at any parallelism.  `df.sample()` / `sampleBy()` are seeded per
partition-order and not portable across engines, so these operators
derive the randomness from a content hash instead:

    bucket(doc) = first 4 hex chars of md5(cast(id as string))

md5 hex is identical in Spark, DuckDB, Python, etc., so thresholds are
plain lexicographic comparisons on the hex prefix — a pure map-side
projection/filter (no shuffle, fully pushdown-friendly) that scales to
any corpus size and is exactly reproducible.

Thresholds are hex strings: a fraction f maps to the prefix
``format(int(f * 16**4), '04x')`` (granularity 1/65536).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_prefix(id_col: Column, nchars: int = 4) -> Column:
    """Portable uniform hash bucket: hex prefix of md5(id as string)."""
    return F.substring(F.md5(id_col.cast("string")), 1, nchars)


def frac_to_hex(f: float, nchars: int = 4) -> str:
    """Fraction -> hex threshold (rows with prefix < threshold are
    'inside' the fraction)."""
    return format(min(int(round(f * 16**nchars)), 16**nchars - 1), f"0{nchars}x")


def deterministic_split(
    df: DataFrame,
    id_col: str,
    splits: Sequence[tuple[str, float]],
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given fractions.

    ``splits`` is an ordered list of (name, fraction); fractions must
    sum to 1.  E.g. [("train", .8), ("val", .1), ("test", .1)].
    Map-only; the same row always lands in the same split.
    """
    total = sum(f for _, f in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    h = hash_prefix(F.col(id_col))
    expr = F.lit(splits[-1][0])
    cum = 0.0
    arms = []
    for name, frac in splits[:-1]:
        cum += frac
        arms.append((name, frac_to_hex(cum)))
    for name, bound in reversed(arms):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    The Spark-native analog of ``sampleBy`` but reproducible across
    engines and runs: keep row iff hash_prefix(id) < threshold(stratum).
    Map-only filter — pushes down to the scan.
    """
    h = hash_prefix(F.col(id_col))
    cond = h < F.lit(frac_to_hex(default_fraction)) if default_fraction else F.lit(False)
    for stratum, frac in sorted(fractions.items()):
        cond = F.when(
            F.col(strata_col) == stratum, h < F.lit(frac_to_hex(frac))
        ).otherwise(cond)
    return df.filter(cond)


def exact_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically.

    The fraction-based sampler can't promise exact counts; this one
    ranks each group by the portable md5 order (ties broken by id) and
    keeps the first k — the same rows on every run, engine, and
    partitioning.  One shuffle keyed on the group; per-group state in
    the window is a single counter, so group size never pressures
    memory.  The per-group top-k shape Spark compiles to a running
    rank over the sorted group — no global sort, no collect.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hash_negative_samples(
    corpus: DataFrame,
    k: int = 4,
    attempts: int = 16,
    query_mod: int = 100,
    id_col: str = "doc_id",
    group_col: str = "source",
    seed: str = "negs1",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every query document (the ``id % query_mod == 0`` stripe),
    pick ``k`` pseudo-random corpus documents that are neither the
    query itself nor from the query's own ``group_col`` (the standard
    false-negative exclusion — a same-source doc is too likely a true
    positive).

    Scale shape: the candidate ids are COMPUTED, not searched —
    ``cand = md5int(seed, query, j) % n`` for j in 0..attempts-1
    (dense-id contract, the layout every packed training corpus has) —
    so the work is |stripe| x attempts probe rows broadcast-joined
    against the corpus projection; the corpus is never shuffled and no
    query x corpus grid ever exists.  Rejected probes (self / same
    group / hash collision on the same candidate) are skipped and the
    first ``k`` acceptances by attempt order win; with a same-group
    fraction p, P(< k of `attempts` accepted) is binomial-tail small
    (~1e-9 at p=0.05, k=4, attempts=16) and DETERMINISTIC — both
    engines compute the identical shortfall if it ever happens.

    The md5-derived integers are engine-portable (the module recipe),
    so the full sample is value-hash verifiable; 48 hash bits mod n
    carries negligible modulo bias for any realistic corpus.  A corpus
    with SPARSE ids degrades gracefully (computed candidates that hit
    no row are skipped, deterministically in both engines) but
    under-fills; compact ids first with a rank pass if yours are
    sparse.

    Output: (query_id, neg_id, attempt, rank) with rank 1..k ordered
    by (attempt, neg_id).
    """
    n1 = corpus.agg(F.count("*").alias("n"))
    q = corpus.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("query_id"), F.col(group_col).alias("qgrp")
    )
    probes = (
        q.crossJoin(F.broadcast(n1))
        .select(
            "query_id",
            "qgrp",
            F.explode(F.sequence(F.lit(0), F.lit(attempts - 1))).alias("j"),
            "n",
        )
        .select(
            "query_id",
            "qgrp",
            "j",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.lit(seed),
                                F.col("query_id").cast("string"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.col("n"),
            ).alias("cand_id"),
        )
    )
    cand = (
        corpus.select(F.col(id_col).alias("cand_id"), F.col(group_col).alias("cgrp"))
        .join(F.broadcast(probes), "cand_id")
        .filter((F.col("cand_id") != F.col("query_id")) & (F.col("cgrp") != F.col("qgrp")))
        .groupBy("query_id", F.col("cand_id").alias("neg_id"))
        .agg(F.min("j").alias("attempt"))
    )
    from qaapi_spark.operators.windows import topk_per_group

    ranked = topk_per_group(
        cand, ["query_id"], [F.asc("attempt"), F.asc("neg_id")], k
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.asc("attempt"), F.asc("neg_id"))
    return ranked.select(
        "query_id", "neg_id", "attempt", F.row_number().over(w).cast("long").alias("rank")
    )


def weighted_sample_wor_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    weight_col: Column | str,
    id_col: str = "doc_id",
    seed: str = "wrs1",
    round_dp: int = 6,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis-Spirakis exponential-key scheme (A-ES, Inf. Process.
    Lett. 97(5), 2006, public): each row draws a deterministic uniform
    u and competes with key = -ln(u) / w; the k SMALLEST keys per
    group are a weighted-WOR sample (inclusion probability
    proportional to weight, sequentially without replacement).

    Determinism/portability: u is the module's md5 recipe —
    48 hash bits of (seed ':' id), mapped to (u48+1)/(2^48+1) in
    (0, 1] — so both engines draw the identical uniform; the key is
    ROUNDed to ``round_dp`` decimals with an id tiebreak, the same
    rounded-float ordering contract the cosine family uses.

    Scale shape: key computation is map-only; selection is one
    group-keyed window top-k (WindowGroupLimit pushes the rank filter
    to partial per-partition top-k before the shuffle).  This is the
    one-pass distributed weighted sampler — no global sort, no
    multi-round rejection loop, state per group = k rows.

    Output: group, id, weight, es_key, rank (1..k by key asc).
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u48 = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    u = (u48 + 1) / F.lit(float((1 << 48) + 1))
    key = F.round(-F.log(u) / w, round_dp)
    keyed = df.filter(w > 0).select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        w.alias("weight"),
        key.alias("es_key"),
    )
    from pyspark.sql import Window

    win = Window.partitionBy("grp").orderBy(F.asc("es_key"), F.asc("id"))
    return (
        keyed.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
    )
