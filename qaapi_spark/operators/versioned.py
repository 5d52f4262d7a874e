"""Versioned table storage: overwrite without losing history.

A minimal snapshot convention over plain parquet (no table-format
dependency): every write lands a new immutable ``v=N`` directory and
then atomically flips a ``_LATEST`` pointer file.  Readers resolve the
pointer first, so a reader never observes a half-written snapshot —
the same write-audit-publish shape the pipeline's swap-write uses,
plus history:

    table/
      v=1/part-*.parquet
      v=2/part-*.parquet
      _LATEST            # contains "2"

This buys, with ~60 lines and zero dependencies:
  - rollback (point _LATEST back) after a bad batch;
  - time travel (read any retained version) for debugging/audits;
  - CDC between versions (see plans/profiling.cdc shape) — diff two
    snapshots relationally;
  - vacuum (drop all but the last K versions) to bound storage.

At production scale the same call sites swap to a real table format
(Delta/Iceberg) whose log generalizes this single pointer; the
semantics here are deliberately the intersection of those formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def latest_version(spark: SparkSession, table_path: str) -> int | None:
    """Version the _LATEST pointer names, or None for an empty table.

    Read through the Hadoop FS API, not spark.read.text: Spark's file
    index treats ``_``-prefixed files as hidden (which is exactly why
    the pointer is named ``_LATEST`` — table scans skip it)."""
    fs, p, jvm = _fs(spark, f"{table_path}/_LATEST")
    if not fs.exists(p):
        return None
    reader = jvm.java.io.BufferedReader(jvm.java.io.InputStreamReader(fs.open(p)))
    try:
        line = reader.readLine()
    finally:
        reader.close()
    return int(line.strip()) if line else None


def _retained_versions(spark: SparkSession, table_path: str) -> list[int]:
    fs, root, _ = _fs(spark, table_path)
    if not fs.exists(root):
        return []
    return sorted(
        int(st.getPath().getName()[2:])
        for st in fs.listStatus(root)
        if st.getPath().getName().startswith("v=")
    )


def versioned_overwrite(df: DataFrame, table_path: str) -> int:
    """Write the next snapshot and flip the pointer; returns the new
    version.  The data write is complete before the pointer moves, so
    concurrent readers see either the old or the new snapshot.
    Version numbers increase monotonically over ALL retained snapshots
    (a write after rollback never clobbers the rolled-back-from one)."""
    spark = df.sparkSession
    retained = _retained_versions(spark, table_path)
    cur = max([latest_version(spark, table_path) or 0] + retained)
    new = cur + 1
    df.write.mode("overwrite").parquet(f"{table_path}/v={new}")
    # write pointer to a temp file, then atomic rename over _LATEST
    fs, latest, jvm = _fs(spark, f"{table_path}/_LATEST")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{table_path}/_LATEST.tmp")
    out = fs.create(tmp, True)
    out.write(str(new).encode("ascii"))
    out.close()
    if fs.exists(latest):
        fs.delete(latest, False)
    fs.rename(tmp, latest)
    return new


def read_version(spark: SparkSession, table_path: str, version: int | None = None) -> DataFrame:
    """Read a snapshot; None means the pointer's current version."""
    v = version if version is not None else latest_version(spark, table_path)
    if v is None:
        raise FileNotFoundError(f"no versions at {table_path}")
    return spark.read.parquet(f"{table_path}/v={v}")


def rollback(spark: SparkSession, table_path: str, version: int) -> None:
    """Point _LATEST at an older retained snapshot (O(1), no rewrite)."""
    fs, latest, jvm = _fs(spark, f"{table_path}/_LATEST")
    vdir = jvm.org.apache.hadoop.fs.Path(f"{table_path}/v={version}")
    if not fs.exists(vdir):
        raise FileNotFoundError(f"version {version} not retained at {table_path}")
    tmp = jvm.org.apache.hadoop.fs.Path(f"{table_path}/_LATEST.tmp")
    out = fs.create(tmp, True)
    out.write(str(version).encode("ascii"))
    out.close()
    fs.delete(latest, False)
    fs.rename(tmp, latest)


def vacuum(spark: SparkSession, table_path: str, keep_last: int = 2) -> list[int]:
    """Drop all snapshot dirs except the newest ``keep_last`` (never the
    pointer target); returns the dropped versions."""
    fs, root, jvm = _fs(spark, table_path)
    cur = latest_version(spark, table_path)
    versions = _retained_versions(spark, table_path)
    keep = set(versions[-keep_last:]) | ({cur} if cur is not None else set())
    dropped = []
    for v in versions:
        if v not in keep:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{table_path}/v={v}"), True)
            dropped.append(v)
    return sorted(dropped)
