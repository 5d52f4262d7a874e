"""Readers for the driver-provided parquet tables (TESTDATA.md).

Parquet scans go through Spark's vectorized reader; Catalyst pushes
filters and prunes columns into the scan, so callers should express
projections/filters declaratively rather than materializing wide reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5, nation=25 rows; fixed-size lookup tables in TPC-H).
BROADCAST_TABLES = {"region", "nation"}


def parquet_files(path: str) -> list[str]:
    """Every parquet data file under ``path`` (a single file, a flat
    dir, or a partitioned dir — ADVICE r15: the footer readers' flat
    ``*.parquet`` glob silently missed partitioned layouts), matching
    Spark's reader semantics: recursive, skipping ``_``/``.``-prefixed
    metadata files (which Spark's scans ignore)."""
    import glob
    import os

    if not os.path.isdir(path):
        return [path]
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith(("_", "."))
    )


def footer_rows(path: str):
    """Exact row count of a parquet file/dir from footer metadata —
    driver-side, no Spark job (num_rows is mandatory file metadata);
    None when the path is unreadable OR holds no parquet files (ADVICE
    r15: an empty/partitionless dir must fall back to count(), not
    report 0) so callers fall back to count()."""
    import pyarrow.parquet as pq

    files = parquet_files(path)
    if not files:
        return None
    try:
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet stores ts as INT64 TIMESTAMP(NANOS), which the
        # vectorized reader rejects; read nanos as long and convert
        # (sub-microsecond part is zero in the generated data, so the
        # integer division is exact and matches DuckDB's ns->us cast).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def events_stream_spec(spark: SparkSession, events_path: str):
    """(raw_schema, normalize) for schema-up-front streaming reads of
    events.parquet.

    The driver's testdata has shipped `ts` as INT64 TIMESTAMP(NANOS)
    (readable only as long via nanosAsLong, then converted), as
    TIMESTAMP_NTZ micros (watermarks demand TIMESTAMP, so cast — the
    engine pins session tz UTC, making the cast value-preserving), and
    as plain TIMESTAMP — mirror read_table's adaptive handling instead
    of assuming any one vintage.  `normalize(stream_df)` returns the
    stream with `ts` as a watermarkable TIMESTAMP.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(events_path)
    ts_type = dict(raw.dtypes).get("ts")

    def normalize(stream_df: DataFrame) -> DataFrame:
        if ts_type == "bigint":
            return stream_df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if ts_type == "timestamp_ntz":
            return stream_df.withColumn("ts", F.col("ts").cast("timestamp"))
        return stream_df

    return raw.schema, normalize


def register_temp_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose all tables as temp views for spark.sql() entry points."""
    for name in TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
