"""SparkSession factory tuned for the local[32] test harness.

The settings mirror what a production cluster deployment would set per
job (AQE on, shuffle partitions sized to cores, UTC session timezone so
timestamp semantics are engine-independent).  The driver harness passes
its own session to the entry points; ``tune_session`` applies the
runtime-settable subset to any session we are handed.
"""

from __future__ import annotations

import os

# Arrow/pandas kernels run in up to `cores` parallel python workers;
# multi-threaded BLAS inside each would oversubscribe the box (n^2
# threads) and serialize on contention.  Workers inherit this env from
# the driver process in local mode — set before any worker spawns.
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

from pyspark.sql import SparkSession


def scratch_dir(prefix: str) -> str:
    """``tempfile.mkdtemp`` that is removed at interpreter exit.

    Streaming stage/store/checkpoint dirs and pipeline warehouses must
    outlive the (lazy) DataFrames built over them, so they cannot be
    deleted inline — but without cleanup every catalog/bench
    invocation leaked its staged copies to /tmp (ADVICE r6 #4).
    atexit bounds the leak to one process lifetime; dirs a caller
    deletes earlier are fine (ignore_errors)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def tune_session(spark: SparkSession) -> SparkSession:
    """Runtime-settable conf that query correctness/perf relies on.

    Safe and idempotent on a session we did not create.
    """
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Let AQE coalesce small shuffles all the way down instead of
    # holding partition count at default parallelism: iterative ops
    # (connected components) and post-filter aggregates otherwise run
    # 32-64 near-empty tasks per stage, and per-task overhead dominates.
    # On a real cluster the same setting trades idle tasks for fewer,
    # fuller ones — the advisory size (64 MB default) still splits
    # genuinely large shuffles.
    conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    # File-commit overhead: the streaming/MV epoch stores write many
    # tiny epoch-keyed parquet dirs per query (profiled r15: ~11 write
    # jobs per retraction stream, ~0.15s floor each).  Committer v2
    # renames task output straight into the destination (one rename per
    # task instead of task->job-temp->dest, i.e. half the metadata ops)
    # and _SUCCESS markers are pure overhead here (no reader consumes
    # them — grep-verified).  Both are standard production settings.
    # v2's constraint (VERDICT r15 #4): task commit is not atomic under
    # concurrent attempts, so it is only safe while speculative
    # execution is OFF (our writes are epoch-keyed overwrite dirs and
    # retry-idempotent, which covers task RETRY, but speculation runs
    # two attempts of one task concurrently).  Enforce the constraint
    # in code rather than prose: a session with speculation enabled
    # keeps the v1 committer.  SCALE.md "Committer" section documents
    # the deployment rule.
    hc = spark.sparkContext._jsc.hadoopConfiguration()
    speculation = (
        spark.sparkContext.getConf().get("spark.speculation", "false").lower()
    )
    if speculation != "true":
        hc.set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    hc.set("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    return spark


# --- kernel cache registry ---------------------------------------------
# Operators that persist() an intermediate feeding multiple consumers of
# ONE returned plan (e.g. simhash fingerprints) register it here; the
# harness (bench, oracle checker, tests) releases between queries so
# executor storage memory is not leaked across a long-lived session.
_KERNEL_CACHES: list = []

# Ephemeral metadata caches (e.g. the streaming stores' remembered
# parquet schemas) that must not outlive one harness query: cleared by
# release_kernel_caches alongside the persisted frames.
_EPHEMERAL_CACHES: list = []


def register_ephemeral_cache(cache) -> None:
    """Track a dict-like cache to be .clear()ed between harness
    queries; returns nothing (register once at module import)."""
    _EPHEMERAL_CACHES.append(cache)


def register_kernel_cache(df):
    """Track a persisted DataFrame for later bulk release; returns df."""
    _KERNEL_CACHES.append(df)
    return df


# Cross-query memoized kernel results (e.g. the connected-components
# labels that both dedup_connected_components and
# dedup_keep_representatives derive from).  Unlike the scratch caches
# above, these are part of the engine's contract — a materialized
# intermediate two catalog queries share, like a materialized view —
# so the harness's between-query release leaves them in place and the
# build cost is billed to whichever query materializes first.
_SHARED_KERNELS: dict = {}


def shared_kernel(spark, key, builder):
    """Return the memoized DataFrame for ``key`` (tuple of hashables),
    building it with ``builder()`` on first use.  Keyed per Spark
    application so a restarted session can never serve stale plans."""
    full_key = (spark.sparkContext.applicationId, *key)
    df = _SHARED_KERNELS.get(full_key)
    if df is None:
        df = builder()
        _SHARED_KERNELS[full_key] = df
    return df


def release_kernel_caches(include_shared: bool = False) -> int:
    """Unpersist every registered scratch kernel cache; with
    ``include_shared`` also drop the cross-query shared memos.
    Returns how many caches were released."""
    for cache in _EPHEMERAL_CACHES:
        try:
            cache.clear()
        except Exception:
            pass
    n = 0
    while _KERNEL_CACHES:
        df = _KERNEL_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    if include_shared:
        while _SHARED_KERNELS:
            _, df = _SHARED_KERNELS.popitem()
            try:
                df.unpersist()
                n += 1
            except Exception:
                pass
    return n


def get_spark(app_name: str = "qaapi-spark") -> SparkSession:
    n = cpu_count()
    builder = SparkSession.builder
    # Conf A/B hooks (r16, guide §1.2 — configuration last, measured):
    # both are evaluated by interleaved same-host A/B runs before any
    # default flips; env-gated so the A/B toggles ONLY the conf under
    # test in otherwise identical processes.
    io_codec = os.environ.get("SPARK_GRAFT_IO_CODEC")
    if io_codec:
        builder = builder.config("spark.io.compression.codec", io_codec)
    prefer_smj = os.environ.get("SPARK_GRAFT_PREFER_SMJ")
    if prefer_smj:
        builder = builder.config("spark.sql.join.preferSortMergeJoin", prefer_smj)
    spark = (
        builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # ContextCleaner only reclaims broadcast/checkpoint/shuffle blocks
        # after a driver GC notices the refs are dead; the default
        # periodicGC.interval (30 min) lets a long-lived session running
        # many broadcast-heavy queries accumulate dead blocks until the
        # heap thrashes (measured: +2-5x per-query latency deep into a
        # 117-query suite, recovered by an explicit System.gc()).
        .config("spark.cleaner.periodicGC.interval", "30s")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    return tune_session(spark)
