"""Sketch operators: count-min sketch + exact heavy hitters.

CMS is the classic bounded-memory frequency sketch for unbounded key
domains: d independent hash rows x w buckets; point estimate = min over
rows.  Built as ONE hash-aggregate: explode the d (row, bucket) pairs
per input row (JVM-side xxhash64), groupBy (row, bucket) + count —
map-side partial counts mean the shuffle carries at most d*w rows per
partition regardless of input size.

Deterministic (seeded hash family) but not SQL-reproducible in DuckDB
(no xxhash64) => rows-only driver check; the CMS overestimate
guarantee (est >= true; est <= true + eps*N w.h.p.) is asserted in
tests against exact counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame, key: Column | str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch table: (row, bucket, cnt), d*w rows max."""
    k = F.col(key) if isinstance(key, str) else key
    pairs = F.array(
        *[
            F.struct(
                F.lit(r).alias("row"),
                ((F.xxhash64(F.lit(r), k) % width + width) % width).alias("bucket"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_point_estimates(
    df: DataFrame,
    sketch: DataFrame,
    key: Column | str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Estimated frequency for each distinct key in ``df``:
    min over the sketch's d rows (broadcast sketch join)."""
    k = F.col(key) if isinstance(key, str) else key
    keys = df.select(k.alias("key")).distinct()
    probes = keys.select(
        "key",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        ((F.xxhash64(F.lit(r), F.col("key")) % width + width) % width).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select("key", F.col("p.row").alias("row"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def heavy_hitters_exact(df: DataFrame, key: Column | str, k: int) -> DataFrame:
    """Exact top-k frequent keys (deterministic tie-break on key) —
    the ground truth the sketch approximates; oracle-checkable."""
    kcol = F.col(key) if isinstance(key, str) else key
    return (
        df.groupBy(kcol.alias("key"))
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("key"))
        .limit(k)
    )
