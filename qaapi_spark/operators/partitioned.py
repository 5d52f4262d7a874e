"""Partition-scoped maintenance: rewrite only the partitions a batch
touches (VERDICT r2 next-round #4).

The plain maintenance path (``operators/maintain.py`` +
``pipeline._swap_write``) reconciles a trailing-window batch by
rewriting the WHOLE curated table — oracle-correct, but at 100 TB every
batch pays a full-table write.  The scalable shape, short of adopting a
table format like Delta, is hash-bucket partitioning on the merge key:

  * curated tables are laid out as ``path/<pcol>=<bucket>/`` parquet,
    where ``bucket = pmod(xxhash64(key), n_buckets)`` — deterministic,
    so a given key lives in exactly one partition forever;
  * a batch's affected buckets = buckets of the batch keys, UNION the
    target buckets currently holding any batch merge-key (guards
    against a key whose partitioning attribute drifted upstream —
    found with a column-pruned semi-join scan, far cheaper than a
    rewrite);
  * the merge runs against ONLY the affected partitions (partition
    pruning at the scan), and the result is written back with dynamic
    partition overwrite, which replaces exactly the partitions present
    in the written frame and leaves every other partition's files
    untouched (asserted by tests/test_partitioned_merge.py on file
    mtimes+inodes).

Reference semantics preserved: these helpers compose with the J2/J3/J5
relational merges in ``operators/maintain.py`` (Update...sql:36-134) —
the partition scope only narrows WHICH target rows those merges see,
never what they compute.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PCOL = "__pbucket"


def bucket_of(key_col: str, n_buckets: int):
    """Deterministic bucket expression for a key column (engine-stable:
    xxhash64 is fixed-seed in Spark, and the bucket is derived data, so
    cross-engine oracles never see it)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def write_partitioned(
    df: DataFrame,
    path: str,
    key_col: str,
    n_buckets: int,
    dynamic: bool = False,
    coalesce: int | None = None,
) -> None:
    """Write ``df`` bucket-partitioned by ``key_col``.  With
    ``dynamic`` the write overwrites ONLY the bucket directories
    present in ``df`` (dynamic partition overwrite); without it the
    whole table is replaced."""
    out = df.withColumn(PCOL, bucket_of(key_col, n_buckets))
    if coalesce is not None:
        # spread per partition dir, not per table: repartition on the
        # bucket before write so each dir gets `coalesce` file(s)
        out = out.repartition(max(1, coalesce * n_buckets), PCOL)
    writer = out.write.mode("overwrite").partitionBy(PCOL)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a bucket-partitioned table back as its logical relation
    (the physical bucket column stays behind the curtain)."""
    if not os.path.exists(path):
        return None
    df = spark.read.parquet(path)
    return df.drop(PCOL) if PCOL in df.columns else df


def affected_buckets(
    target: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    key_col: str,
    n_buckets: int,
    scope_df: DataFrame | None = None,
) -> list[int]:
    """Buckets a maintenance batch touches: buckets of the batch's
    ``key_col`` values (plus ``scope_df``'s — e.g. a delete scope wider
    than the inserted rows), plus target buckets that hold any batch
    merge-key (column-pruned scan + semi-join — no rewrite).  When the
    partition key IS the (single) merge key, the target scan is skipped:
    bucketing is deterministic, so batch keys can only live in batch
    buckets.  Bounded by ``n_buckets`` rows — the collect is driver-safe.
    """
    b = batch.select(bucket_of(key_col, n_buckets).alias("b"))
    if scope_df is not None:
        b = b.unionByName(scope_df.select(bucket_of(key_col, n_buckets).alias("b")))
    if list(keys) != [key_col]:
        tgt_b = (
            target.select(PCOL, *keys)
            .join(F.broadcast(batch.select(*keys).distinct()), list(keys), "left_semi")
            .select(F.col(PCOL).alias("b"))
        )
        b = b.unionByName(tgt_b)
    return sorted({r["b"] for r in b.distinct().collect()})


def merge_partitioned(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    keys: Sequence[str],
    merge_fn: Callable[[DataFrame, DataFrame], DataFrame],
    key_col: str | None = None,
    n_buckets: int = 8,
    coalesce: int | None = None,
    scope_df: DataFrame | None = None,
) -> None:
    """Apply ``merge_fn(scoped_target, batch) -> merged`` to the
    bucket-partitioned table at ``path``, rewriting only the affected
    bucket directories.

    ``key_col`` is the partitioning key (defaults to ``keys[0]``); it
    must be functionally stable per merge key — the affected-bucket
    probe still catches drifted rows and rewrites their old bucket.
    ``scope_df`` widens the probe with extra ``key_col`` values whose
    partitions the merge may shrink (delete scopes).
    """
    key_col = key_col or keys[0]
    if not os.path.exists(path):
        write_partitioned(batch, path, key_col, n_buckets, coalesce=coalesce)
        return
    raw = spark.read.parquet(path)
    buckets = affected_buckets(raw, batch, keys, key_col, n_buckets, scope_df=scope_df)
    if not buckets:
        return
    # partition pruning: the filter on the partition column reaches the
    # scan, so unaffected bucket dirs are never read OR written
    scoped = raw.filter(F.col(PCOL).isin(buckets)).drop(PCOL)
    merged = merge_fn(scoped, batch)
    # dynamic overwrite replaces only partitions PRESENT in the written
    # frame: an affected bucket whose rows were all deleted would keep
    # its stale files.  Find emptied buckets BEFORE the write (the plan
    # reads the very files the write replaces), then drop their dirs
    # explicitly (bounded by n_buckets; single-writer layout, same
    # assumption as _swap_write).  Materialize `merged` with an eager
    # localCheckpoint first: the probe and the write then both read the
    # checkpoint — one pass instead of two over the merge join, and no
    # cache-eviction gamble that would re-read the replaced files
    # mid-write.  The checkpoint is bucket-scoped (affected partitions
    # only), so its footprint is bounded by the batch's blast radius,
    # not the table.
    merged = merged.localCheckpoint(eager=True)
    present = {
        r["b"]
        for r in merged.select(bucket_of(key_col, n_buckets).alias("b"))
        .distinct()
        .collect()
    }
    write_partitioned(
        merged, path, key_col, n_buckets, dynamic=True, coalesce=coalesce
    )
    import shutil

    for b in buckets:
        if b not in present:
            shutil.rmtree(os.path.join(path, f"{PCOL}={b}"), ignore_errors=True)
