"""Structured-Streaming variants of the batch surface (SURVEY.md §2.9
extension: the reference is strictly batch; this is the incremental
upgrade path).

Two shapes:
  - windowed aggregation over an event stream with watermarked late-
    data handling (`events_windowed_counts`)
  - the landing-directory reconcile: stream JSON batches out of a
    directory and apply the same maintenance semantics via
    foreachBatch (`stream_landing_reconcile`)

Both run the bounded test data through a real streaming query
(availableNow trigger + memory sink), so the plumbing is the same one
an unbounded source (Kafka, autoloader directory) would use.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _scratch(prefix: str) -> str:
    """See :func:`qaapi_spark.session.scratch_dir` (atexit-cleaned
    mkdtemp; ADVICE r6 #4)."""
    from qaapi_spark.session import scratch_dir

    return scratch_dir(prefix)


def _stage_monotonic_mtimes(stage_dir: str) -> None:
    """Make FileStreamSource's delivery order EXPLICIT for ordered-ingest
    streams (ADVICE r9 #3): the source sorts discovered files by
    modification time, so a timestamp tie or a coarse-mtime filesystem
    could reorder ``slice=0 .. slice=N`` micro-batches — silently
    violating the ordered-ingest contract of stream_pack_chunks /
    stream_scd2_history (wrong offsets / intervals, no error).  Stamp
    every staged file with strictly increasing mtimes in slice-index
    order so the sort key IS the intended order on any filesystem."""
    import os

    t = 946684800.0  # fixed past epoch (2000-01-01): only ORDER matters
    for d in sorted(
        (e for e in os.listdir(stage_dir) if e.startswith("slice=")),
        key=lambda e: int(e.split("=", 1)[1]),
    ):
        p = os.path.join(stage_dir, d)
        for f in sorted(os.listdir(p)):
            t += 2.0
            os.utime(os.path.join(p, f), (t, t))


def _store_swap(store_dir: str) -> None:
    """Crash-safe promote of ``store_dir + '.next'`` (fully written by
    the caller) to ``store_dir``.

    The old rmtree-then-move pattern had a window (ADVICE r9 #2): dying
    between the two calls left NO store, and the next epoch's existence
    check treated the replayed batch as first-epoch — silently
    discarding all accumulated state.  Here the old store is renamed
    (atomic) to a recoverable trash name before the new one is renamed
    (atomic) into place, so every crash point leaves either the store
    or its trash on disk for :func:`_store_recover` to restore —
    mirroring compact_files' ``.__compact_old__`` self-heal
    (operators/maintain.py)."""
    import os
    import shutil

    trash = store_dir + ".__swap_old__"
    shutil.rmtree(trash, ignore_errors=True)
    if os.path.isdir(store_dir):
        os.rename(store_dir, trash)
    os.rename(store_dir + ".next", store_dir)
    shutil.rmtree(trash, ignore_errors=True)


def _store_recover(store_dir: str) -> bool:
    """Entry-time self-heal + existence check for a ``_store_swap``
    store: a crash between the two renames strands the accumulated
    state at ``.__swap_old__`` with ``store_dir`` absent — restore it
    (the streaming engine replays the uncommitted batch, and every
    merge here is retry-idempotent).  A dangling ``.next`` needs no
    handling: the replayed merge rewrites it in overwrite mode.

    Returns whether the store exists after recovery — the ONLY
    condition under which a merge may skip reading prior state
    (first-epoch); any other read error must propagate (ADVICE r8 #2)."""
    import os

    trash = store_dir + ".__swap_old__"
    if not os.path.isdir(store_dir) and os.path.isdir(trash):
        os.rename(trash, store_dir)
    return os.path.isdir(store_dir)


def _footer_min_max(path: str, col: str):
    """(min, max) of an integer column from parquet FOOTER statistics
    — driver-side pyarrow, no Spark job (the round-9 sentinel trick,
    generalized for the stagers' lo/hi probes: every ordered-ingest
    stager pays one full-scan min/max aggregate job just to derive its
    slice boundaries).

    Exactness: parquet min/max statistics are EXACT for fixed-width
    physical types (truncation applies only to BYTE_ARRAY/FLBA per the
    format spec), and both the stats and Spark's F.min/F.max ignore
    nulls — so when stats are present for every row group the result
    is bit-identical to the aggregate.  Returns None (caller falls
    back to the one-job Spark aggregate) when the path has no files,
    any row group lacks stats for ``col`` (a writer may disable
    statistics — ADVICE r9 #4), or the column is not fixed-width.
    File discovery is the shared recursive helper (VERDICT r15 next
    #7 / ADVICE r15: the flat glob silently forfeited the optimization
    on partitioned stage dirs)."""
    import pyarrow.parquet as _pq

    from qaapi_spark.sources.tables import parquet_files

    files = parquet_files(path)
    if not files:
        return None
    lo = hi = None
    try:
        for f in files:
            pf = _pq.ParquetFile(f)
            idx = pf.schema_arrow.get_field_index(col)
            if idx < 0 or not str(pf.schema_arrow.field(idx).type).startswith(
                ("int", "uint")
            ):
                return None
            for g in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
    except Exception:
        return None
    return None if lo is None else (lo, hi)


_PQ_SCHEMAS: dict = {}

try:  # clear between harness queries (no cross-query metadata reuse)
    from qaapi_spark.session import register_ephemeral_cache

    register_ephemeral_cache(_PQ_SCHEMAS)
except Exception:  # pragma: no cover - session module always importable
    pass


def _read_pq(spark, path: str, key: str | None = None):
    """``spark.read.parquet`` with the inferred schema remembered per
    store root (optimization guide §5 — the driver should do no data
    work it doesn't need): every un-schema'd parquet read costs a
    1-task Spark job just to read one footer for schema inference, and
    the per-epoch callbacks issue 2-5 such reads per epoch over stores
    whose schema never changes within a stream (r16 job profile: about
    half the insert epoch's job count was these).  First read infers and
    caches; later reads of the same ``key`` pass the schema explicitly
    (zero jobs).

    ``key`` defaults to the literal path — safe because scratch roots
    are mkdtemp-unique per query.  Callers reading per-epoch SUBDIRS of
    one root pass ``key=root + "#e"`` so all snapshots share one entry;
    the root itself (partitioned read, schema includes ``epoch``) keys
    separately.  The cache is cleared between harness queries."""
    k = key or path
    sch = _PQ_SCHEMAS.get(k)
    if sch is None:
        df = spark.read.parquet(path)
        _PQ_SCHEMAS[k] = df.schema
        return df
    return spark.read.schema(sch).parquet(path)


def _footer_ts_min_max_us(path: str, col: str = "ts"):
    """(min, max) of ``unix_micros(cast(col as timestamp))`` from
    parquet FOOTER statistics — the SCD2 stagers' boundary probe
    (VERDICT r15 next #8: the one remaining per-stream aggregate job;
    ``us`` is derived from ts so `_footer_min_max` can't answer it).

    Exactness argument, per physical type (raw int64 stats via
    ``min_raw``/``max_raw`` — never the lossy logical accessors):
    - timestamp[us] (NTZ): the engine pins session tz UTC, so the
      NTZ->TIMESTAMP cast is value-preserving and unix_micros == raw.
    - timestamp[us, tz=UTC]: isAdjustedToUTC micros ARE unix micros.
    - timestamp[ns]: read via nanosAsLong + ``timestamp_micros(ts div
      1000)`` (events_stream_spec), so us == raw div 1000; ``div``
      truncates toward zero while ``//`` floors — identical only for
      raw >= 0, so negative raws decline.
    min/max COMMUTE with these strictly monotonic conversions, and
    both footer stats and F.min/F.max ignore nulls.  Returns None
    (caller falls back to the one-job aggregate) on any other type,
    missing stats, non-UTC tz, or no files."""
    import pyarrow.parquet as _pq

    from qaapi_spark.sources.tables import parquet_files

    files = parquet_files(path)
    if not files:
        return None
    lo = hi = None
    try:
        for f in files:
            pf = _pq.ParquetFile(f)
            idx = pf.schema_arrow.get_field_index(col)
            if idx < 0:
                return None
            t = str(pf.schema_arrow.field(idx).type)
            if t in ("timestamp[us]", "timestamp[us, tz=UTC]"):
                div = 1
            elif t in ("timestamp[ns]", "timestamp[ns, tz=UTC]"):
                div = 1000
            else:
                return None
            for g in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(g).column(idx).statistics
                if st is None or not st.has_min_max:
                    return None
                rmin, rmax = st.min_raw, st.max_raw
                if not isinstance(rmin, int) or not isinstance(rmax, int):
                    return None
                if rmin < 0:
                    return None
                lo = rmin // div if lo is None else min(lo, rmin // div)
                hi = rmax // div if hi is None else max(hi, rmax // div)
    except Exception:
        return None
    return None if lo is None else (lo, hi)


def _par_writes(*thunks) -> None:
    """Run an epoch's INDEPENDENT write jobs concurrently from driver
    threads (optimization guide §2.6 — overlap jobs so one job's
    single-task tail doesn't leave 31 cores idle).

    The epoch stores' per-write cost is almost entirely fixed latency
    (job scheduling + a 1-task coalesce(1) stage + commit, ~0.15-0.5 s
    each on sf0.1-sized epoch relations — r15 profile_writes
    decomposition), so N sequential writes cost the SUM of their
    latencies while overlapped they cost roughly the MAX.

    Safe because write order within an epoch is not load-bearing:
    every store write is an epoch-keyed overwrite directory and every
    reader filters ``epoch < N`` (or takes the latest-earlier
    snapshot), so no consumer can observe a partially-ordered epoch;
    a replayed epoch overwrites whatever subset landed.  Shared
    persisted inputs are materialized once under the BlockManager's
    per-block get-or-compute locks.  Exceptions propagate after all
    writes settle, so a failed write still fails the stream (and the
    engine's retry) exactly as the sequential form did."""
    if len(thunks) == 1:
        thunks[0]()
        return
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(t) for t in thunks]
    for f in futures:
        f.result()


def events_windowed_counts(
    spark: SparkSession,
    events_path: str,
    window: str = "6 hours",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window counts per event_type over a parquet-backed
    stream; returns the final (complete-mode) result as a batch DF.

    complete output mode => bounded replay produces exactly the batch
    group-by result, so the query is DuckDB-oracle checkable while
    still exercising watermark + window state machinery.
    """
    from qaapi_spark.sources.tables import events_stream_spec

    # schema must be known up-front for a streaming source; take the
    # RAW on-disk shape and normalize ts to TIMESTAMP in-stream
    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    # FileStreamSource wants a directory; stage the single parquet file
    # behind a symlink dir (zero-copy)
    import os

    stage_dir = _scratch(prefix="events_stream_")
    os.symlink(os.path.abspath(events_path), os.path.join(stage_dir, "part-0.parquet"))

    stream = normalize_ts(
        spark.readStream.schema(raw_schema).format("parquet").load(stage_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    name = "events_windowed_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}").select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def stream_landing_reconcile(
    spark: SparkSession,
    landing_dir: str,
    warehouse_dir: str,
    pattern: str = "all_contacts_*.json",
) -> dict[str, int]:
    """Reference EP1 as a stream: watch the landing directory for
    contact batch files and merge each micro-batch insert-only into
    the curated contacts table (foreachBatch => exactly-once per
    epoch against an idempotent merge).
    """
    from qaapi_spark import transforms as T
    from qaapi_spark.pipeline import CalabrioPipeline
    from qaapi_spark.schemas import ENTITY_SCHEMAS

    pipe = CalabrioPipeline(spark, warehouse_dir)

    stream = (
        spark.readStream.schema(ENTITY_SCHEMAS["all_contacts"])
        .option("multiLine", "true")
        .option("pathGlobFilter", pattern)
        .json(landing_dir)
    )

    from qaapi_spark.operators.maintain import merge_insert_only

    def upsert_batch(batch_df: DataFrame, epoch_id: int) -> None:
        new = T.contacts_curated(batch_df).dropDuplicates(["contact_id"])
        tgt = pipe.read("t_contacts")
        merged = new if tgt is None else merge_insert_only(tgt, new, ["contact_id"])
        pipe._swap_write(merged, "t_contacts")

    q = (
        stream.writeStream.foreachBatch(upsert_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", warehouse_dir + "/_checkpoints/contacts")
        .start()
    )
    q.awaitTermination()
    out = pipe.read("t_contacts")
    return {"t_contacts": out.count() if out is not None else 0}


def stream_dedup_events(
    spark: SparkSession, events_path: str, state_partitions: int | None = 8
) -> DataFrame:
    """Streaming exact dedup: the event file staged TWICE into the
    landing dir (every row arrives at least twice), recovered to one
    row per event_id with watermark + dropDuplicates.

    This is the streaming half of the dedup surface (operators/dedup
    is the batch half): state holds one key per event inside the
    watermark horizon; duplicates beyond the watermark age out of
    state, which is the bounded-memory contract an unbounded source
    needs.  Append mode + availableNow => the materialized result is
    exactly the distinct event set, hence DuckDB-oracle checkable.

    ``state_partitions`` sizes the stateful stage's shuffle (each
    shuffle partition owns a state store whose open/commit cost is per
    partition per batch, so over-partitioning a modest per-batch key
    volume pays pure overhead: 32 -> 8 partitions measured 2.7s ->
    1.7s on sf0.1).  Size it to expected keys-per-batch / ~500k on a
    real cluster; ``None`` keeps the session's shuffle partitioning.
    """
    import os

    from qaapi_spark.sources.tables import events_stream_spec

    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    stage_dir = _scratch(prefix="events_dup_stream_")
    for i in range(2):  # duplicate arrival: same file, two source files
        os.symlink(os.path.abspath(events_path), os.path.join(stage_dir, f"part-{i}.parquet"))

    stream = normalize_ts(
        spark.readStream.schema(raw_schema).format("parquet").load(stage_dir)
    )
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type", "value")
    )
    name = "events_dedup_" + uuid.uuid4().hex[:8]
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            # picked up once at stream start; scoped + restored below
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    return spark.sql(f"SELECT * FROM {name}")


def stream_neardup_dedup(
    spark: SparkSession,
    docs_path: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    n_bands: int = 16,
) -> DataFrame:
    """Incremental NEAR-dup dedup: documents arrive in micro-batches
    (one file per trigger) and each batch is screened against the
    accumulated minhash-LSH band-key store of every document kept so
    far, with EXACT Jaccard verification of every candidate — the
    streaming half of the near-dup surface, where stream_dedup_events
    is the exact half.

    Per batch (foreachBatch; effectively-once because each epoch's
    writes go to epoch-keyed directories in OVERWRITE mode, so a retry
    of epoch N replaces epoch N's own output instead of appending
    duplicates — foreachBatch itself only guarantees at-least-once):

      1. map-only minhash signatures + band keys for the batch;
      2. cross-batch: (batch doc, kept doc) candidate pairs by band
         equi-join against the store, verified with exact shingle-set
         Jaccard >= threshold against the kept-sets store — only
         verified near-dups drop;
      3. within the batch, greedy min-id over VERIFIED pairs: drop a
         doc iff a smaller-id batch survivor is a true near-dup;
      4. append survivors' band keys and shingle sets to the stores.

    Because candidates are exactly verified (and r=4 banding misses a
    true pair with probability (1-j^4)^16 ~ 2.2e-4 at j=0.8 — equality
    with the exact pair relation is asserted empirically by the oracle
    gate at every SF, same trade as minhash_lsh_verified_pairs, where
    r=2's moderate-similarity candidate flood made the verify join >80%
    of runtime), the kept set is DETERMINISTIC — a pure function of
    (batch partition, id order, exact pair relation) — which is what
    lets the driver hash-check this stream against a batch SQL oracle
    (VERDICT r2 next-round #5).

    State per kept doc: n_bands 24-byte band keys (the probe side) +
    its int64 shingle set (the verify side — the same information a
    production system keeps by retaining the kept corpus itself),
    stored as ONE nested row (id, bands: array<struct<band, bsig>>,
    sh) so each epoch commits a single store write instead of two
    (VERDICT r3 #5: the epoch-keyed idempotency fix added a write job
    per store per epoch; nesting halves that and the per-epoch store
    re-open cost — the probe side is recovered with one narrow
    explode, no shuffle).  Band probes are equi-joins with the batch
    as the small side; the verify join touches only candidate pairs,
    so cost tracks true-dup density, never corpus size.

    Contract note: a document whose text yields ZERO shingles (shorter
    than the shingle width) produces no minhash signature and is
    dropped from the kept output — same convention as the batch
    minhash/jaccard kernels, which cannot score empty sets.
    """
    import os

    from pyspark.sql import functions as F

    from qaapi_spark.operators.dedup import (
        _hashed_shingle_sets,
        minhash_band_arrays,
    )

    # stage the corpus as two files => two micro-batches (docs split by
    # id parity), so the store genuinely accumulates across epochs
    stage_dir = _scratch(prefix="docs_neardup_stream_")
    store_dir = _scratch(prefix="neardup_store_")
    batch_df = spark.read.parquet(docs_path)
    batch_df.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b0.parquet")
    )
    batch_df.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b1.parquet")
    )

    def _jaccard_ge(pairs: DataFrame, sa: DataFrame, sb: DataFrame) -> DataFrame:
        """pairs (id, other) verified: exact shingle-set Jaccard >=
        threshold, using sa for `id` and sb for `other` sides."""
        j = (
            pairs.join(sa.select(F.col("id"), F.col("sh").alias("sh_a")), "id")
            .join(
                sb.select(F.col("id").alias("other"), F.col("sh").alias("sh_b")),
                "other",
            )
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "j",
                F.round(
                    F.col("inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                    4,
                ),
            )
        )
        return j.filter(F.col("j") >= threshold)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/*.parquet")
    )

    def dedup_batch(bdf: DataFrame, epoch_id: int) -> None:
        # one file per trigger => the batch arrives as ONE partition;
        # spread it so the signature kernel parallelizes — but only to
        # a SMALL floor, not defaultParallelism: an epoch runs ~8
        # chained jobs over a micro-batch, and at 32-way the per-task
        # overhead of those jobs outweighs the extra cores (measured
        # 7.5 -> 6.4 s/epoch-pair at sf0.1 going 32 -> 8; the r6
        # stream_ivf_assign lesson).  Batches that already arrive with
        # >= 8 splits (a genuinely large micro-batch on a cluster)
        # keep their natural partitioning — no forced shuffle.
        if bdf.rdd.getNumPartitions() < 8:
            bdf = bdf.repartition(8)
        sets = (
            _hashed_shingle_sets(bdf, 2, "text", "doc_id")
            .filter(F.size("sh") > 0)
            .persist()
        )
        # pre-explode band arrays: one row per doc — the form the store
        # persists; the exploded probe keys derive with a narrow explode.
        # persisted: consumed by the candidate/within-batch joins AND the
        # store write.  Signatures derive from the PERSISTED hashed
        # shingle sets (identical arrays — word_shingles is distinct)
        # instead of re-tokenizing text through minhash_signatures, so
        # each epoch scans/tokenizes the batch text exactly once
        # (round-10 probe: the duplicated tokenize+shingle+hash pass
        # was part of the ~3.2 s/epoch floor).
        # O(1)-wide signature tree (the stream_pipeline shave, VERDICT
        # r10 next #3, now applied here per VERDICT r11 next #4): one
        # nested transform over sequence(0, num_hashes-1) instead of a
        # 64-wide F.array of per-index expressions — value-identical
        # (xxhash64(i, v) with i the sequence element = xxhash64(lit(i),
        # v); the CC stream hash-checks the same form against the batch
        # oracle) but a constant-size tree to analyze/plan per epoch.
        signed = sets.select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                lambda i: F.array_min(
                    F.transform(F.col("sh"), lambda v: F.xxhash64(i, v))
                ),
            ).alias("sig"),
        )
        bands_arr = minhash_band_arrays(signed, num_hashes, n_bands).persist()
        keys = bands_arr.select("id", F.explode("bands").alias("bk")).select(
            "id", "bk.band", "bk.bsig"
        )
        # existence check, not try/except (the ADVICE r8 #2 / r9 #2
        # class): only the genuinely-missing first-epoch store may be
        # skipped; any other read error must propagate instead of
        # silently treating a populated store as empty.  The epoch
        # partition filter makes the screen RETRY-SAFE: a foreachBatch
        # retry of epoch N would otherwise read epoch N's own prior
        # output and drop every batch doc against itself (j(d,d) = 1
        # passes any threshold) — only strictly-earlier epochs are the
        # legitimate cross-batch state (round-10 fix; partition pruning
        # skips the excluded directory entirely).
        if _store_recover(store_dir + "/data"):
            rec = _read_pq(spark, store_dir + "/data").filter(
                F.col("epoch") < int(epoch_id)
            )
            store = rec.select(
                F.col("id").alias("other"), F.explode("bands").alias("bk")
            ).select("bk.band", "bk.bsig", "other")
            kept_sets = rec.select("id", "sh")
        else:
            store = None
        if store is not None:
            # cross-batch: band-collision candidates, exactly verified
            cand = (
                keys.join(store, ["band", "bsig"])
                .select("id", "other")
                .distinct()
            )
            dup = _jaccard_ge(cand, sets, kept_sets).select("id").distinct()
            keys = keys.join(dup, "id", "left_anti")
        # within-batch greedy min-id on VERIFIED near-dup pairs
        a, b = keys.alias("a"), keys.alias("b")
        wpairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bsig") == F.col("b.bsig"))
                & (F.col("a.id") > F.col("b.id")),
            )
            .select(F.col("a.id").alias("id"), F.col("b.id").alias("other"))
            .distinct()
        )
        smaller = _jaccard_ge(wpairs, sets, sets).select("id").distinct()
        # single consumer now (the store write) — no persist needed
        kept_ids = keys.select("id").distinct().join(smaller, "id", "left_anti")
        try:
            # SINGLE epoch write (round 10: was two): the nested store
            # row (id, bands[], sh) already identifies the kept docs,
            # so the kept-docs relation derives from the store with one
            # final semi-join against the corpus AFTER the stream ends
            # instead of a per-epoch bdf join + second write job.
            # Epoch-keyed dirs + overwrite = idempotent on foreachBatch
            # retry (a re-run of epoch N replaces its own prior
            # output); one file each (coalesce(1)) so the store re-read
            # every later epoch pays minimal per-file open cost.
            bands_arr.join(kept_ids, "id", "left_semi").join(
                sets, "id"
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{store_dir}/data/epoch={epoch_id}"
            )
        finally:
            bands_arr.unpersist()
            sets.unpersist()

    # An epoch chains ~8 small jobs (signatures, band join, verify,
    # anti-joins, two writes) over a micro-batch; AQE's per-shuffle
    # materialize-then-replan adds serial latency to every one of them
    # (measured 6.8 -> 4.8 s for the two-epoch replay at sf0.1 with it
    # off) while having nothing to re-plan at micro-batch sizes.
    # Scoped to this stream and restored; a deployment with large
    # micro-batches (where AQE's coalescing/skew handling pays for its
    # latency) would key this on expected batch volume.
    # NOTE (ADVICE r7 #4): spark.conf is SESSION-global — any query
    # planned concurrently on this SparkSession loses AQE until the
    # finally-restore runs.  The catalog/bench runners are single-
    # threaded per session, so this is safe here; a concurrent caller
    # should run this stream on a cloned session
    # (spark.newSession()) so the toggle is isolated.
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # 8-way shuffles for the epoch's chained micro-batch joins/aggs
    # (the CC/ExactSubstr stream setting, VERDICT r11 next #4): at
    # session width (32) each of the ~8 per-epoch jobs pays 4x the
    # task overhead on batch-sized inputs; restored after.
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.foreachBatch(dedup_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", store_dir + "/_checkpoint")
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    # kept docs = the store's ids (exactly the survivors, every epoch)
    # re-attached to the corpus once — the epoch=N partition-discovery
    # column drops in the select
    kept = spark.read.parquet(store_dir + "/data").select(
        F.col("id").alias("doc_id")
    )
    return (
        spark.read.parquet(docs_path)
        .join(kept, "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
    )


def stream_interval_join(
    spark: SparkSession,
    events_path: str,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "24 hours",
    watermark: str = "48 hours",
    state_partitions: int | None = 8,
) -> DataFrame:
    """Stream-stream event-time interval join (attribution): each
    ``right_type`` event joins the same user's ``left_type`` events
    that happened within ``horizon`` BEFORE it — the canonical
    click->purchase attribution query.

    Both sides are watermarked and the join carries the event-time
    range predicate, so Structured Streaming can bound each side's
    state to the horizon + watermark window — the property that makes
    a stream-stream join runnable forever at scale (without the time
    bound, both states grow without limit; Spark refuses outer
    variants for exactly that reason).  With an availableNow bounded
    replay and a watermark wider than the data's disorder, no row is
    late-dropped, so the streamed inner join equals the batch interval
    join and the query is DuckDB-oracle checkable.
    """
    import os

    from qaapi_spark.sources.tables import events_stream_spec

    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    stage_dir = _scratch(prefix="events_ssj_")
    os.symlink(os.path.abspath(events_path), os.path.join(stage_dir, "part-0.parquet"))

    def side(tp: str, alias: str) -> DataFrame:
        s = normalize_ts(
            spark.readStream.schema(raw_schema).format("parquet").load(stage_dir)
        )
        return (
            s.filter(F.col("event_type") == tp)
            .withWatermark("ts", watermark)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
                F.col("value").alias(f"{alias}_value"),
            )
        )

    clicks, purchases = side(left_type, "c"), side(right_type, "p")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )
    name = "attrib_" + uuid.uuid4().hex[:8]
    # a stream-stream join keeps FOUR state stores per shuffle
    # partition (left/right x keyToNumValues/keyWithIndexToValue), so
    # store open/commit overhead scales with partitions x 4 per batch;
    # same sizing rule as stream_dedup_events: keys-per-batch / ~500k
    # on a real cluster, 8 here (measured ~9s -> ~4s at sf0.1)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if state_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .option("checkpointLocation", stage_dir + "/_ckpt")
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
    return spark.sql(f"SELECT * FROM {name}").select(
        F.col("c_id").alias("click_id"),
        F.col("p_id").alias("purchase_id"),
        F.col("c_user").alias("user_id"),
        F.round("p_value", 2).alias("purchase_value"),
    )


def stream_static_enrich(
    spark: SparkSession,
    events_path: str,
    customer_path: str,
) -> DataFrame:
    """Stream-static enrichment join: the event stream joins a STATIC
    dimension (customers) that Spark re-plans per micro-batch — the
    stateless counterpart of stream_interval_join (no watermark or
    state needed on the static side; the dim broadcasts into every
    batch exactly like a batch BroadcastHashJoin).  Output: per-segment
    event counts + value sums, complete mode == the batch group-by.
    """
    import os

    from qaapi_spark.sources.tables import events_stream_spec

    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    stage_dir = _scratch(prefix="events_enrich_")
    os.symlink(os.path.abspath(events_path), os.path.join(stage_dir, "part-0.parquet"))
    stream = normalize_ts(
        spark.readStream.schema(raw_schema).format("parquet").load(stage_dir)
    )
    dim = (
        spark.read.parquet(customer_path)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    agg = (
        stream.join(F.broadcast(dim), "user_id")  # static side: no state
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    name = "enrich_" + uuid.uuid4().hex[:8]
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {name}")


def stream_interval_join_left(
    spark: SparkSession,
    events_path: str,
    left_type: str = "click",
    right_type: str = "purchase",
    horizon: str = "24 hours",
    watermark: str = "48 hours",
    state_partitions: int | None = 8,
) -> DataFrame:
    """LEFT OUTER stream-stream event-time interval join: like
    :func:`stream_interval_join`, plus every unmatched ``left_type``
    event emits a null-extended row once the watermark passes its join
    window — the attribution variant that also surfaces clicks that
    never converted.

    Outer emission is watermark-driven, so a bounded replay needs the
    watermark to cross the LAST real event's window before the query
    stops.  A sentinel file (one far-future event per joined type,
    negative ids, disjoint users) rides behind the data: it passes the
    per-side type filters, advances the event-time watermark past
    every real window, and the no-data finalization batch then flushes
    all pending state.  Sentinels are filtered from the result by id
    sign.  This makes the streamed LEFT join value-equal to the batch
    LEFT interval join — and therefore oracle-checkable.

    At scale the sentinel trick is not needed (an unbounded stream's
    watermark keeps advancing); state stays bounded to horizon +
    watermark per side exactly as in the inner variant.
    """
    import datetime
    import os

    from qaapi_spark.sources.tables import events_stream_spec

    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    stage_dir = _scratch(prefix="events_ssjl_")
    os.symlink(os.path.abspath(events_path), os.path.join(stage_dir, "part-0.parquet"))

    # Derive the watermark-flush sentinel driver-side from parquet
    # footer statistics (no Spark job): the replay previously spent
    # two fixed jobs — a full-scan max(ts) aggregate plus a
    # createDataFrame->write for the 2-row sentinel — on what the
    # file's own row-group stats and a direct pyarrow write answer in
    # milliseconds (round-9 probe: those jobs were ~1.5 s of the
    # ~8 s replay; the join itself is machinery-bound, SCALE.md r9).
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(events_path)
    ts_idx = pf.schema_arrow.get_field_index("ts")
    # Footer stats are an OPTIMIZATION, not a format guarantee (ADVICE
    # r9 #4): a writer may disable column statistics, and a zero-row
    # file has no row groups — either would surface as an obscure
    # AttributeError / ValueError here.  Collect only present stats and
    # fall back to the exact (one-job) Spark max(ts) aggregate when any
    # are missing.
    stat_maxes = [
        st.max
        for g in range(pf.metadata.num_row_groups)
        if (st := pf.metadata.row_group(g).column(ts_idx).statistics) is not None
        and st.has_min_max
    ]
    if len(stat_maxes) == pf.metadata.num_row_groups and stat_maxes:
        max_raw = max(stat_maxes)
    else:
        max_raw = (
            spark.read.schema(raw_schema)
            .parquet(events_path)
            .agg(F.max("ts"))
            .collect()[0][0]
        )
        if max_raw is None:
            raise ValueError(
                f"stream_interval_join_left: {events_path} has no rows "
                "with a non-null ts — cannot derive a watermark-flush "
                "sentinel for the bounded replay"
            )
    ts_type = pf.schema_arrow.field(ts_idx).type
    if not isinstance(max_raw, datetime.datetime):
        # nanos-backed stats surface as integers; sentinel stays in
        # the same physical unit so the streaming reader's
        # normalize_ts path treats it exactly like real rows
        unit_per_day = {"s": 86400, "ms": 86400 * 10**3, "us": 86400 * 10**6, "ns": 86400 * 10**9}[ts_type.unit]
        flush1, flush2 = max_raw + 10 * unit_per_day, max_raw + 20 * unit_per_day
    else:
        flush1 = max_raw + datetime.timedelta(days=10)
        flush2 = max_raw + datetime.timedelta(days=20)
    sent_tbl = pa.table(
        {
            "event_id": pa.array([-1, -2], pa.int64()),
            "ts": pa.array([flush1, flush2], ts_type),
            "user_id": pa.array([-1, -2], pa.int64()),
            "event_type": pa.array([left_type, right_type], pa.string()),
            "value": pa.array([None, None], pa.float64()),
            "props": pa.array([None, None], pa.string()),
        },
        schema=pf.schema_arrow,
    )
    pq.write_table(sent_tbl, os.path.join(stage_dir, "part-1.parquet"))

    def side(tp: str, alias: str) -> DataFrame:
        s = normalize_ts(
            spark.readStream.schema(raw_schema).format("parquet").load(stage_dir)
        )
        return (
            s.filter(F.col("event_type") == tp)
            .withWatermark("ts", watermark)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
                F.col("value").alias(f"{alias}_value"),
            )
        )

    joined = side(left_type, "c").join(
        side(right_type, "p"),
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}")),
        "leftOuter",
    )
    name = "attribl_" + uuid.uuid4().hex[:8]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.sql(f"SELECT * FROM {name}")
        .filter(F.col("c_id") >= 0)
        .select(
            F.col("c_id").alias("click_id"),
            F.col("p_id").alias("purchase_id"),
            F.col("c_user").alias("user_id"),
            F.round(F.col("p_value"), 2).alias("purchase_value"),
        )
    )


def stream_hll_running(
    spark: SparkSession,
    events_path: str,
    state_partitions: int | None = 8,
    n_splits: int = 3,
    p: int = 8,
) -> DataFrame:
    """Streaming distinct-count via MERGEABLE HLL register state: each
    micro-batch computes its own (group, bucket) -> max-rho registers
    and MAX-merges them into a tiny parquet register store (2**p rows
    per group, however much data streams through).  Register-max merge
    is associative and commutative, so the final state is bit-equal to
    the batch computation over all the data — which makes the running
    streaming sketch value-hash-checkable against the SAME DuckDB
    oracle as the batch `sketch_hll_portable` query.

    The input file is staged as ``n_splits`` disjoint id-range slices
    so availableNow really exercises cross-batch merging (one file per
    trigger), not a single-batch degenerate run.
    """
    import os

    from pyspark.sql import functions as F

    from qaapi_spark.operators.sketches import hll_portable
    from qaapi_spark.sources.tables import events_stream_spec

    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    raw = spark.read.schema(raw_schema).parquet(events_path)
    mm = _footer_min_max(events_path, "event_id")  # no-job lo/hi (exact)
    lo, hi = mm if mm else raw.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="events_hll_stream_")
    for i in range(n_splits):
        (
            raw.filter(
                (F.col("event_id") >= int(lo) + i * step)
                & (F.col("event_id") < int(lo) + (i + 1) * step + (1 if i == n_splits - 1 else 0) * (1 << 60))
            )
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    store_dir = _scratch(prefix="events_hll_store_") + "/regs"

    m = 1 << p
    hex_b = p // 4
    h = F.md5(F.col("user_id").cast("string"))
    bucket = F.conv(F.substring(h, 1, hex_b), 16, 10).cast("int")
    w = F.conv(F.substring(h, hex_b + 1, 12), 16, 10).cast("long")
    rho = F.when(w == 0, F.lit(49)).otherwise(F.lit(49) - F.length(F.bin(w)))

    def merge_batch(bdf, epoch_id: int) -> None:
        regs = (
            bdf.select("event_type", bucket.alias("bucket"), rho.alias("rho"))
            .groupBy("event_type", "bucket")
            .agg(F.max("rho").alias("mj"))
        )
        # Self-heal + existence check, not try/except (ADVICE r8 #2 /
        # r9 #2): only the first-epoch missing-store path may skip the
        # read; any other error must propagate, and a crash-stranded
        # store is restored before the decision.
        if _store_recover(store_dir):
            prev = _read_pq(bdf.sparkSession, store_dir)
            regs = (
                regs.unionByName(prev)
                .groupBy("event_type", "bucket")
                .agg(F.max("mj").alias("mj"))
            )
        # tiny relation (groups x 2**p rows): rewrite wholesale per epoch
        regs.coalesce(1).write.mode("overwrite").parquet(store_dir + ".next")
        _store_swap(store_dir)

    stream = spark.readStream.schema(raw_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(stage_dir + "/slice=*")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="hll_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    # final estimate from the merged register store: reuse the batch
    # estimator arithmetic by round-tripping registers through the
    # identical formula (operators/sketches.hll_portable over a
    # synthetic relation would re-hash, so compute from registers
    # directly with the same expressions)
    two49 = 1 << 49
    regs = spark.read.parquet(store_dir)
    per_group = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 49 - mj)")).alias("s_present"),
        F.count("*").alias("nb"),
    )
    v = F.lit(m) - F.col("nb")
    s = F.col("s_present") + v.cast("long") * F.lit(two49)
    numer = 0.7213 / (1.0 + 1.079 / m) * float(m) * float(m) * float(two49)
    e_raw = F.lit(numer) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return per_group.select("event_type", F.round(est, 4).alias("hll_est"))


def stream_ivf_assign(
    spark: SparkSession,
    embeddings_path: str,
    n_centroids_mod: int = 37,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental vector indexing: embeddings arrive in micro-batches
    and each batch is assigned MAP-ONLY to its nearest centroid of the
    fixed deterministic-stripe codebook (the ``ann_topk_ivf``
    configuration, `operators/similarity.cosine_topk_ivf`), then
    appended to an epoch-keyed assignment store — new vectors join the
    IVF index without touching anything already indexed, which is how
    a serving-side ANN index absorbs a corpus that keeps growing.

    The codebook is fixed at index-build time (exactly like a trained
    production IVF index); a batch's assignment depends only on the
    batch and the broadcast codebook, so the streamed store equals the
    batch assignment relation row-for-row — asserted by
    ``tests/test_streaming_multimodal.py`` — and the operator is
    oracle-ready for the catalog (same SQL as the ``assigned`` CTE of
    ann_topk_ivf's oracle).

    Scale shape: per epoch one Arrow kernel pass over the batch
    (broadcast codebook GEMM), one single-file store append; no
    shuffle, no state beyond the store itself.
    """
    import os

    from qaapi_spark.operators.similarity import nearest_broadcast

    corpus = spark.read.parquet(embeddings_path)
    cents = corpus.filter(F.col(id_col) % n_centroids_mod == 0).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cvec")
    )

    stage_dir = _scratch(prefix="emb_ivf_stream_")
    store_dir = _scratch(prefix="emb_ivf_store_")
    corpus.filter(F.col(id_col) % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b0.parquet")
    )
    corpus.filter(F.col(id_col) % 2 == 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b1.parquet")
    )

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/*.parquet")
    )

    def assign_batch(bdf: DataFrame, epoch_id: int) -> None:
        # No repartition: the kernel is map-only over whatever
        # partitioning the source delivers — at scale a micro-batch
        # spans many files/partitions natively, and forcing a shuffle
        # on a single-file fixture batch costs more than the GEMM
        assigned = nearest_broadcast(
            bdf, cents, 1,
            stream_id=id_col, stream_vec=vec_col,
            ref_id="centroid_id", ref_vec="cvec",
        ).select(
            F.col("query_id").alias(id_col),
            F.col("cand_id").alias("centroid_id"),
            F.col("cosine").alias("centroid_cosine"),
        )
        # epoch-keyed overwrite = idempotent on foreachBatch retry
        assigned.coalesce(1).write.mode("overwrite").parquet(
            f"{store_dir}/data/epoch={epoch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(assign_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_dir + "/_checkpoint")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store_dir + "/data").select(
        id_col, "centroid_id", "centroid_cosine"
    )


def stream_pq_encode(
    spark: SparkSession,
    embeddings_path: str,
    m: int = 16,
    ksub: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Incremental PQ code maintenance — the second half of the
    serving-index story next to :func:`stream_ivf_assign`: embedding
    micro-batches are compressed MAP-ONLY to their m per-subspace
    codes against the fixed broadcast sampled codebook
    (`operators/retrieval.pq_codebook(train_iters=0)`, the
    ann_topk_pq_sampled configuration) and appended to an epoch-keyed
    code store.  New vectors join the compressed index without
    touching existing codes, and because the sampled codebook is
    fixed-point int64 the streamed store equals the batch encode
    relation exactly — the catalog oracle is the `enc` CTE of
    ann_topk_pq_sampled's SQL, exploded to (vec_id, j, code).

    Scale shape: per epoch one Arrow encode kernel over the batch
    (broadcast m*ksub*dsub int codebook), one store append; no
    shuffle.  At 100 TB the code store (m bytes/vector) IS what ADC
    serving reads.
    """
    import os

    from qaapi_spark.operators.retrieval import pq_codebook, pq_encode

    corpus = spark.read.parquet(embeddings_path)
    cb = pq_codebook(corpus, m=m, ksub=ksub, train_iters=0,
                     vec_col=vec_col, id_col=id_col)

    stage_dir = _scratch(prefix="emb_pq_stream_")
    store_dir = _scratch(prefix="emb_pq_store_")
    corpus.filter(F.col(id_col) % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b0.parquet")
    )
    corpus.filter(F.col(id_col) % 2 == 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b1.parquet")
    )

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/*.parquet")
    )

    def encode_batch(bdf: DataFrame, epoch_id: int) -> None:
        codes = pq_encode(bdf, cb, vec_col=vec_col, id_col=id_col)
        # epoch-keyed overwrite = idempotent on foreachBatch retry
        codes.coalesce(1).write.mode("overwrite").parquet(
            f"{store_dir}/data/epoch={epoch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(encode_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_dir + "/_checkpoint")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(store_dir + "/data").select(
        F.col("id").alias(id_col),
        F.posexplode("codes").alias("j", "code"),
    )


def stream_covariance_update(
    spark: SparkSession,
    embeddings_path: str,
    round_dp: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Streaming covariance / embedding-drift maintenance: embedding
    micro-batches are reduced MAP-ONLY to their exact integer moment
    partials (`operators/linalg.gram_partials` — d x d Gram + linear
    sums + count in 6dp fixed point) and appended to an epoch-keyed
    moment store; the covariance of everything seen so far is
    recovered by SUMMING the store and closing the fixed arithmetic
    (`covariance_from_moments`).

    Integer sums are addition-mergeable — order- and
    grouping-independent — so the streamed store's covariance equals
    the batch `covariance_upper` BIT-FOR-BIT and the catalog query
    shares `emb_covariance_upper`'s DuckDB oracle (the additive-merge
    counterpart of the register-MAX trick that gave the streaming HLL
    its batch oracle).

    Scale shape: per epoch one Arrow kernel pass over the batch, one
    d(d+1)/2 + d + 1 row store append; no shuffle, state is O(d^2)
    regardless of how much the stream has seen — the moment store IS
    the drift monitor a training pipeline consults between snapshots.
    """
    import os

    from qaapi_spark.operators.linalg import (
        covariance_from_moments,
        gram_partials,
    )

    corpus = spark.read.parquet(embeddings_path)

    stage_dir = _scratch(prefix="emb_cov_stream_")
    store_dir = _scratch(prefix="emb_cov_store_")
    corpus.filter(F.col(id_col) % 2 == 0).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b0.parquet")
    )
    corpus.filter(F.col(id_col) % 2 == 1).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(stage_dir, "b1.parquet")
    )

    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/*.parquet")
    )

    def moments_batch(bdf: DataFrame, epoch_id: int) -> None:
        # map-only partials; epoch-keyed overwrite = idempotent retry
        gram_partials(bdf, vec_col).coalesce(1).write.mode("overwrite").parquet(
            f"{store_dir}/data/epoch={epoch_id}"
        )

    q = (
        stream.writeStream.foreachBatch(moments_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", store_dir + "/_checkpoint")
        .start()
    )
    q.awaitTermination()
    # The staged corpus copy is consumed once the availableNow stream
    # terminates; drop it NOW rather than at interpreter exit — it is
    # the one scratch dir here that scales with corpus size (the
    # moment store the returned lazy DF reads is O(epochs * d^2) and
    # stays until atexit).
    import shutil as _shutil

    _shutil.rmtree(stage_dir, ignore_errors=True)
    return covariance_from_moments(
        spark.read.parquet(store_dir + "/data").select("i", "j", "v"), round_dp
    )


def _merge_weighted_sample_batch(bdf, store_dir: str, k: int, seed: str) -> None:
    """One foreachBatch merge step of the streaming weighted-WOR
    sample, module-level so retry-idempotence is unit-testable
    (tests/test_round9_fixes.py replays the same batch twice).

    Merge contract: union new batch keys with the bounded store,
    dedup, keep the k smallest A-ES keys per group, atomically swap
    the store.  Applying the SAME batch twice must leave the store
    bit-identical (foreachBatch retries replay batches)."""
    from pyspark.sql import Window

    from qaapi_spark.operators.sampling import weighted_sample_wor_per_group
    from qaapi_spark.operators.textstats import ws_tokens

    toks = bdf.select(
        "doc_id",
        "lang",
        F.size(ws_tokens(F.lower(F.col("text")))).alias("n_tokens"),
    )
    batch_top = weighted_sample_wor_per_group(
        toks, "lang", k, "n_tokens", id_col="doc_id", seed=seed
    ).select("grp", "id", "weight", "es_key")
    # Self-heal + existence check, not try/except: a read error other
    # than the expected first-epoch missing store must propagate, or it
    # would silently discard all accumulated state (ADVICE r8 #2), and
    # a swap-crash-stranded store is restored first (ADVICE r9 #2).
    if _store_recover(store_dir):
        batch_top = batch_top.unionByName(_read_pq(bdf.sparkSession, store_dir))
    # Retry-idempotence: if foreachBatch replays a batch whose rows
    # already merged into the store, the union holds exact duplicate
    # (grp, id, es_key) rows; both copies would count toward the k
    # smallest and evict legitimate ids (ADVICE r8 #1).  Duplicates
    # are exact copies (es_key is a pure function of id+seed), so a
    # key-dedup restores idempotence.
    batch_top = batch_top.dropDuplicates(["grp", "id"])
    win = Window.partitionBy("grp").orderBy(F.asc("es_key"), F.asc("id"))
    merged = (
        batch_top.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    # groups x k rows: rewrite wholesale per epoch (idempotent)
    merged.coalesce(1).write.mode("overwrite").parquet(store_dir + ".next")
    _store_swap(store_dir)


def stream_weighted_sample(
    spark: SparkSession,
    docs_path: str,
    k: int = 5,
    n_splits: int = 3,
    state_partitions: int | None = 8,
    seed: str = "wrs1",
) -> DataFrame:
    """Streaming weighted sampling WITHOUT replacement via MERGEABLE
    top-k state: documents arrive in micro-batches and each batch's
    A-ES keys (-ln(u)/w from the deterministic md5 uniform —
    operators/sampling.weighted_sample_wor_per_group) compete against
    the accumulated k-smallest-keys-per-group store.  min-k selection
    over (key, id) is associative and commutative, so the final state
    is exactly the batch sampler's selection over all the data —
    which makes the running stream value-hash-checkable against the
    SAME DuckDB oracle as the batch `sample_weighted_wor_per_lang`
    query (the stream_hll_running contract, applied to sampling).

    This is how a training-mixture sampler keeps a live weighted
    sample over an unbounded corpus feed: state is groups x k rows no
    matter how much data streams through; each epoch's work is one
    map-only key computation + a groups-x-k-bounded merge.
    """
    import os

    from qaapi_spark.operators.sampling import weighted_sample_wor_per_group
    from qaapi_spark.operators.textstats import ws_tokens

    raw = spark.read.parquet(docs_path)
    raw_schema = raw.schema
    mm = _footer_min_max(docs_path, "doc_id")  # no-job lo/hi (exact)
    lo, hi = mm if mm else raw.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="docs_wrs_stream_")
    for i in range(n_splits):
        upper = int(lo) + (i + 1) * step if i < n_splits - 1 else int(hi) + 1
        (
            raw.filter(
                (F.col("doc_id") >= int(lo) + i * step) & (F.col("doc_id") < upper)
            )
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    store_dir = _scratch(prefix="docs_wrs_store_") + "/topk"

    def merge_batch(bdf, epoch_id: int) -> None:
        _merge_weighted_sample_batch(bdf, store_dir, k, seed)

    stream = spark.readStream.schema(raw_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(stage_dir + "/slice=*")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="wrs_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    from pyspark.sql import Window

    win = Window.partitionBy("grp").orderBy(F.asc("es_key"), F.asc("id"))
    return (
        spark.read.parquet(store_dir)
        .withColumn("rank", F.row_number().over(win))
        .select(
            F.col("grp").alias("lang"),
            F.col("id").alias("doc_id"),
            F.col("weight").cast("long").alias("n_tokens"),
            "es_key",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def stream_running_distinct(
    spark: SparkSession,
    events_path: str,
    n_splits: int = 3,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Streaming EXACT running-distinct-users curve via MIN-mergeable
    first-seen state: each micro-batch reduces to (user_id, min
    epoch-day) and MIN-merges into the first-seen store.  min() over
    first-seen days is associative and commutative, so the final state
    is bit-equal to the batch first-seen relation REGARDLESS of
    arrival order — the streamed growth curve hash-checks against the
    same DuckDB oracle as the batch `running_distinct_users_daily`
    query (the stream_hll_running contract, applied to the exact
    computation).

    State is |users| rows — the honest cost of exactness; the
    bounded-state companion is `stream_hll_running` (2^p registers per
    group).  Per-epoch work: one map-side-combined user aggregate over
    the batch plus a |users|-bounded merge.
    """
    import os

    from pyspark.sql import functions as F

    from qaapi_spark.sources.tables import events_stream_spec

    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    raw = spark.read.schema(raw_schema).parquet(events_path)
    mm = _footer_min_max(events_path, "event_id")  # no-job lo/hi (exact)
    lo, hi = mm if mm else raw.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="events_rdist_stream_")
    for i in range(n_splits):
        hi_pad = (1 << 60) if i == n_splits - 1 else 0
        (
            raw.filter(
                (F.col("event_id") >= int(lo) + i * step)
                & (F.col("event_id") < int(lo) + (i + 1) * step + hi_pad)
            )
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    store_dir = _scratch(prefix="events_rdist_store_") + "/first_seen"

    def merge_batch(bdf, epoch_id: int) -> None:
        ts = normalize_ts(bdf)
        seen = (
            ts.groupBy("user_id")
            .agg(F.min(F.floor(F.unix_timestamp("ts") / 86400)).alias("day_s"))
        )
        # Self-heal + existence check (ADVICE r8 #2 / r9 #2): only the
        # first-epoch missing-store path may be skipped; any other read
        # error must propagate rather than silently dropping all state.
        if _store_recover(store_dir):
            seen = (
                seen.unionByName(_read_pq(bdf.sparkSession, store_dir))
                .groupBy("user_id")
                .agg(F.min("day_s").alias("day_s"))
            )
        seen.coalesce(1).write.mode("overwrite").parquet(store_dir + ".next")
        _store_swap(store_dir)

    stream = spark.readStream.schema(raw_schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(stage_dir + "/slice=*")
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="rdist_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    from pyspark.sql import Window

    d = (
        spark.read.parquet(store_dir)
        .groupBy("day_s")
        .agg(F.count("*").alias("new_users"))
    )
    w = Window.orderBy("day_s").rowsBetween(Window.unboundedPreceding, 0)
    return d.select(
        "day_s",
        "new_users",
        F.sum("new_users").over(w).alias("cum_distinct_users"),
    )


def stream_pack_chunks(
    spark: SparkSession,
    docs_path: str,
    budget: int = 128,
    n_splits: int = 3,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Streaming concat-and-chunk shard formation: documents arrive in
    doc_id-ordered micro-batches and each batch's rows are assigned
    their packed offsets from an O(|sources|) running-total state —
    new documents append to training shards without ever recomputing
    earlier offsets, the incremental counterpart of the batch
    `pack_sequences` operator (same output schema, same oracle).

    Ordered ingest is the CONTRACT (shard formation consumes an
    ordered feed): slices are doc_id ranges staged as one sorted file
    each, so cross-batch per-source doc_id order holds; within a
    batch the offset window orders by doc_id.  Under that contract
    the streamed relation is bit-equal to the batch pack.

    Retry-idempotent BY CONSTRUCTION (the ADVICE r8 #1 class of bug
    cannot occur): state is written as per-epoch SNAPSHOTS — epoch e
    derives everything from the epoch e-1 snapshot plus the batch
    content and overwrites its own snapshot and output partition, so
    a replayed epoch reproduces identical bytes instead of
    double-counting into a mutated store.  Snapshot size is
    |sources| rows; per-epoch work is one per-source window over the
    batch plus a |sources|-sized outer merge.
    """
    import os

    from pyspark.sql import Window

    raw = spark.read.parquet(docs_path)
    from qaapi_spark.operators.textstats import ws_tokens

    narrow = raw.select(
        "source", "doc_id", F.size(ws_tokens(F.col("text"))).alias("n_toks")
    )
    mm = _footer_min_max(docs_path, "doc_id")  # projection keeps doc_id intact
    lo, hi = mm if mm else narrow.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="docs_pack_stream_")
    for i in range(n_splits):
        hi_pad = (1 << 60) if i == n_splits - 1 else 0
        (
            narrow.filter(
                (F.col("doc_id") >= int(lo) + i * step)
                & (F.col("doc_id") < int(lo) + (i + 1) * step + hi_pad)
            )
            # one SORTED file per slice: cross-batch doc_id order is
            # the ordered-ingest contract, and staging only the narrow
            # (source, doc_id, n_toks) projection is the 100 TB shape
            # (the replay never ships text)
            .coalesce(1)
            .sortWithinPartitions("source", "doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    # ordered ingest is the contract — make the source's mtime sort
    # key explicit (ADVICE r9 #3)
    _stage_monotonic_mtimes(stage_dir)
    store_root = _scratch(prefix="docs_pack_store_")
    out_root = _scratch(prefix="docs_pack_out_")

    def merge_batch(bdf, epoch_id: int) -> None:
        ss = bdf.sparkSession
        prev_dir = os.path.join(store_root, f"epoch={int(epoch_id) - 1}")
        if int(epoch_id) > 0 and os.path.isdir(prev_dir):
            prev = _read_pq(ss, prev_dir, key=store_root + "#e")
        else:
            prev = ss.createDataFrame([], "source string, total_toks long")
        b = bdf.filter(F.col("n_toks") > 0)
        w = (
            Window.partitionBy("source")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum = F.coalesce(F.sum("n_toks").over(w), F.lit(0))
        placed = (
            b.withColumn("cum_before", cum)
            .join(F.broadcast(prev), "source", "left")
            .withColumn(
                "start_tok",
                (F.coalesce(F.col("total_toks"), F.lit(0)) + F.col("cum_before"))
                .cast("long"),
            )
        )
        out = placed.select(
            "source",
            "doc_id",
            F.col("n_toks").cast("long").alias("n_toks"),
            "start_tok",
            F.floor(F.col("start_tok") / F.lit(budget))
            .cast("long")
            .alias("first_chunk"),
            F.floor((F.col("start_tok") + F.col("n_toks") - 1) / F.lit(budget))
            .cast("long")
            .alias("last_chunk"),
        ).withColumn(
            "n_chunks", F.col("last_chunk") - F.col("first_chunk") + 1
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_root, f"epoch={int(epoch_id)}")
        )
        bsum = b.groupBy("source").agg(F.sum("n_toks").alias("b_toks"))
        totals = (
            prev.join(bsum, "source", "full_outer")
            .select(
                "source",
                (
                    F.coalesce(F.col("total_toks"), F.lit(0))
                    + F.coalesce(F.col("b_toks"), F.lit(0))
                ).cast("long").alias("total_toks"),
            )
        )
        totals.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_root, f"epoch={int(epoch_id)}")
        )

    stream = (
        spark.readStream.schema(narrow.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/slice=*")
    )
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="pack_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    return spark.read.parquet(out_root + "/epoch=*").select(
        "source", "doc_id", "n_toks", "start_tok",
        "first_chunk", "last_chunk", "n_chunks",
    )


def stream_scd2_history(
    spark: SparkSession,
    events_path: str,
    n_splits: int = 3,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Streaming SCD2 (type-2) history maintenance — the CDC-apply
    shape: status events arrive in time-ordered micro-batches, each
    batch CLOSES intervals whose successor has now arrived and emits
    them append-only, and the state carries exactly one OPEN row per
    user (the current interval).  History rows are immutable once
    emitted; only the |users|-row open set ever updates — at 100 TB
    this is why SCD2 is maintained from a stream rather than rebuilt:
    per epoch the work is one user-keyed window over (batch + open
    rows), never a history rescan.

    Time-ordered ingest is the CONTRACT (CDC logs are ordered):
    slices are event-time ranges staged as one sorted file each.
    Under it the emitted union + final open set is bit-equal to the
    batch `scd2_user_status_history` relation, so the stream shares
    its oracle.  State snapshots are per-epoch (the r9
    stream_pack_chunks pattern), so a replayed epoch reproduces
    identical bytes — no retry double-count class.
    """
    import os

    from pyspark.sql import Window

    from qaapi_spark.sources.tables import events_stream_spec

    raw_schema, normalize_ts = events_stream_spec(spark, events_path)
    raw = normalize_ts(spark.read.schema(raw_schema).parquet(events_path))
    narrow = raw.select(
        "user_id",
        F.col("event_type").alias("status"),
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    bounds = _footer_ts_min_max_us(events_path) or tuple(
        narrow.agg(F.min("us"), F.max("us")).collect()[0]
    )
    lo, hi = bounds
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="events_scd2_stream_")
    for i in range(n_splits):
        hi_pad = (1 << 60) if i == n_splits - 1 else 0
        (
            narrow.filter(
                (F.col("us") >= int(lo) + i * step)
                & (F.col("us") < int(lo) + (i + 1) * step + hi_pad)
            )
            .coalesce(1)
            .sortWithinPartitions("user_id", "us", "event_id")
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    # ordered ingest is the contract — make the source's mtime sort
    # key explicit (ADVICE r9 #3)
    _stage_monotonic_mtimes(stage_dir)
    store_root = _scratch(prefix="scd2_store_")
    out_root = _scratch(prefix="scd2_out_")
    state_schema = "user_id long, status string, event_id long, valid_from_us long"

    def merge_batch(bdf, epoch_id: int) -> None:
        ss = bdf.sparkSession
        prev_dir = os.path.join(store_root, f"epoch={int(epoch_id) - 1}")
        if int(epoch_id) > 0 and os.path.isdir(prev_dir):
            prev = _read_pq(ss, prev_dir, key=store_root + "#e")
        else:
            prev = ss.createDataFrame([], state_schema)
        combined = prev.select(
            "user_id", "status", "event_id",
            F.col("valid_from_us").alias("us"), F.lit(True).alias("is_state"),
        ).unionByName(
            bdf.select(
                "user_id", "status", "event_id", "us", F.lit(False).alias("is_state")
            )
        )
        w = Window.partitionBy("user_id").orderBy("us", "event_id")
        # collapse zero-change rows (a state row is always a change —
        # it was one when recorded; in-batch it has no predecessor)
        changes = combined.withColumn("prev", F.lag("status").over(w)).filter(
            F.col("prev").isNull() | (F.col("status") != F.col("prev"))
        )
        nxt = F.lead("us").over(w)
        marked = changes.withColumn("valid_to_us", nxt)
        closed = marked.filter(F.col("valid_to_us").isNotNull()).select(
            "user_id", "status",
            F.col("us").alias("valid_from_us"), "valid_to_us",
        )
        closed.write.mode("overwrite").parquet(
            os.path.join(out_root, f"epoch={int(epoch_id)}")
        )
        open_rows = marked.filter(F.col("valid_to_us").isNull()).select(
            "user_id", "status", "event_id", F.col("us").alias("valid_from_us")
        )
        open_rows.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_root, f"epoch={int(epoch_id)}")
        )

    stream = (
        spark.readStream.schema(
            "user_id long, status string, event_id long, us long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/slice=*")
    )
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="scd2_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    import glob as _glob

    # numeric epoch sort: lexicographic would put epoch=10 before
    # epoch=2 and hand back a stale open set on long replays
    epochs = sorted(
        _glob.glob(store_root + "/epoch=*"),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    final_open = spark.read.parquet(epochs[-1]).select(
        "user_id", "status", "valid_from_us",
        F.lit(None).cast("long").alias("valid_to_us"),
    )
    hist = spark.read.parquet(out_root + "/epoch=*").select(
        "user_id", "status", "valid_from_us", "valid_to_us"
    )
    return hist.unionByName(final_open).withColumn(
        "is_current", F.col("valid_to_us").isNull()
    )


def _pipeline_shards_epoch(
    bdf,
    epoch_id: int,
    store_dir: str,
    totals_root: str,
    out_root: str,
    threshold: float,
    num_hashes: int,
    n_bands: int,
    min_toks: int,
    budget: int,
    source_cap: int | None = None,
) -> None:
    """One foreachBatch step of the composed corpus-refresh pipeline
    (module-level so retry-idempotence is unit-testable): near-dup
    screen of the batch against the kept store -> quality gate ->
    per-source quota cap -> packed-offset assignment from the
    per-epoch totals snapshot.

    The cap is EXACT under ordered ingest: batches arrive in doc_id
    order, so prev-epoch kept count + within-batch rank IS the global
    per-source row_number — the running-count state (one long per
    source, carried in the totals snapshot) reproduces the batch
    pipeline's windowed cap without ever seeing the full corpus.

    Retry-idempotent by construction: the dedup store and shard output
    are epoch-keyed overwrite directories, the dedup screen reads only
    STRICTLY EARLIER epochs (a replayed epoch must not meet its own
    prior output — every doc is its own near-dup), and pack offsets /
    cap counts derive from the epoch-(N-1) totals snapshot plus batch
    content, so a replayed epoch reproduces identical bytes."""
    from pyspark.sql import Window

    from qaapi_spark.operators.dedup import (
        _hashed_shingle_sets,
        minhash_band_arrays,
    )
    from qaapi_spark.operators.textstats import ws_tokens

    spark = bdf.sparkSession
    # staged slices arrive as ONE file -> one partition; repartition
    # unconditionally (the old getNumPartitions probe paid a Py4J
    # RDD-conversion round trip per epoch just to learn that)
    bdf = bdf.repartition(8)
    sets = (
        _hashed_shingle_sets(bdf, 2, "text", "doc_id")
        .filter(F.size("sh") > 0)
        .persist()
    )
    # one NESTED higher-order expression instead of num_hashes separate
    # array_min columns: identical values (xxhash64(int i, shingle) for
    # i in 0..n-1 — sequence elements are INT like the old F.lit(i)),
    # but the logical tree is O(1) wide instead of O(num_hashes), and
    # every downstream action re-analyzes this lineage (~1 s/epoch of
    # pure driver-side analysis at 64 hashes, measured round 11)
    signed = sets.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(F.col("sh"), lambda v: F.xxhash64(i, v))
            ),
        ).alias("sig"),
    )
    bands_arr = minhash_band_arrays(signed, num_hashes, n_bands).persist()
    keys = bands_arr.select("id", F.explode("bands").alias("bk")).select(
        "id", "bk.band", "bk.bsig"
    )

    def jaccard_ge(pairs, sa, sb):
        j = (
            pairs.join(sa.select(F.col("id"), F.col("sh").alias("sh_a")), "id")
            .join(
                sb.select(F.col("id").alias("other"), F.col("sh").alias("sh_b")),
                "other",
            )
            .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
            .withColumn(
                "j",
                F.round(
                    F.col("inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                    4,
                ),
            )
        )
        return j.filter(F.col("j") >= threshold)

    if os.path.isdir(store_dir + "/data"):
        rec = _read_pq(spark, store_dir + "/data").filter(
            F.col("epoch") < int(epoch_id)
        )
        store = rec.select(
            F.col("id").alias("other"), F.explode("bands").alias("bk")
        ).select("bk.band", "bk.bsig", "other")
        kept_sets = rec.select("id", "sh")
        cand = keys.join(store, ["band", "bsig"]).select("id", "other").distinct()
        dup = jaccard_ge(cand, sets, kept_sets).select("id").distinct()
        keys = keys.join(dup, "id", "left_anti")
    a, b = keys.alias("a"), keys.alias("b")
    wpairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.id") > F.col("b.id")),
        )
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("other"))
        .distinct()
    )
    smaller = jaccard_ge(wpairs, sets, sets).select("id").distinct()
    kept_ids = (
        keys.select("id").distinct().join(smaller, "id", "left_anti").persist()
    )

    # quality gate + pack-offset assignment over this epoch's survivors
    gated = (
        bdf.join(kept_ids.withColumnRenamed("id", "doc_id"), "doc_id", "left_semi")
        .select(
            "source",
            "doc_id",
            F.size(ws_tokens(F.lower(F.col("text")))).alias("n_toks"),
        )
        .filter(F.col("n_toks") >= min_toks)
    )
    prev_dir = os.path.join(totals_root, f"epoch={int(epoch_id) - 1}")
    if int(epoch_id) > 0 and os.path.isdir(prev_dir):
        prev = _read_pq(spark, prev_dir, key=totals_root + "#e")
    else:
        prev = spark.createDataFrame(
            [], "source string, total_toks long, n_kept long"
        )
    # ONE window pass computes both the cap rank and the running token
    # prefix (same partitioning+ordering -> one sort, no extra
    # exchange), and ONE broadcast join attaches both state columns.
    # The cap filter is safe to apply AFTER the prefix sum because the
    # kept rows are a per-source PREFIX in doc_id order: for every
    # surviving row, cum_before over the gated relation equals
    # cum_before over the capped relation.
    rk_w = Window.partitionBy("source").orderBy("doc_id")
    cum_w = rk_w.rowsBetween(Window.unboundedPreceding, -1)
    placed = (
        gated.withColumn("rk", F.row_number().over(rk_w))
        .withColumn(
            "cum_before", F.coalesce(F.sum("n_toks").over(cum_w), F.lit(0))
        )
        .join(F.broadcast(prev), "source", "left")
    )
    if source_cap is not None:
        placed = placed.filter(
            F.coalesce(F.col("n_kept"), F.lit(0)) + F.col("rk") <= source_cap
        )
    placed = placed.withColumn(
        "start_tok",
        (F.coalesce(F.col("total_toks"), F.lit(0)) + F.col("cum_before"))
        .cast("long"),
    )
    out = placed.select(
        "source",
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        "start_tok",
        F.floor(F.col("start_tok") / F.lit(budget)).cast("long").alias("first_chunk"),
        F.floor((F.col("start_tok") + F.col("n_toks") - 1) / F.lit(budget))
        .cast("long")
        .alias("last_chunk"),
    ).withColumn("n_chunks", F.col("last_chunk") - F.col("first_chunk") + 1)
    # pin the SKINNY pack rows so the totals snapshot aggregates the
    # same materialization the shard write emits (r16, guide §2.6):
    # the snapshot previously waited for the shard write and re-read
    # the just-written file, serializing its job behind the write —
    # pinned, all three epoch writes are independent and overlap in
    # ONE _par_writes batch (3 serialized jobs -> max of 3).  Unlike
    # the fat sh/bands delta the r14 A/B rejected persisting, `out` is
    # 7 narrow columns of this epoch's survivors.
    out = out.persist()
    try:
        epoch_out = os.path.join(out_root, f"epoch={int(epoch_id)}")
        bsum = out.groupBy("source").agg(
            F.sum("n_toks").alias("b_toks"), F.count("*").alias("b_kept")
        )
        totals = prev.join(bsum, "source", "full_outer").select(
            "source",
            (
                F.coalesce(F.col("total_toks"), F.lit(0))
                + F.coalesce(F.col("b_toks"), F.lit(0))
            ).cast("long").alias("total_toks"),
            (
                F.coalesce(F.col("n_kept"), F.lit(0))
                + F.coalesce(F.col("b_kept"), F.lit(0))
            ).cast("long").alias("n_kept"),
        )
        _par_writes(
            lambda: out.coalesce(1).write.mode("overwrite").parquet(epoch_out),
            lambda: bands_arr.join(kept_ids, "id", "left_semi")
            .join(sets, "id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{store_dir}/data/epoch={int(epoch_id)}"),
            lambda: totals.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(totals_root, f"epoch={int(epoch_id)}")
            ),
        )
    finally:
        out.unpersist()
        kept_ids.unpersist()
        bands_arr.unpersist()
        sets.unpersist()


def stream_pipeline_corpus_to_shards(
    spark: SparkSession,
    docs_path: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    n_bands: int = 16,
    min_toks: int = 16,
    budget: int = 128,
    n_splits: int = 2,
    source_cap: int | None = None,
) -> DataFrame:
    """The incremental corpus-refresh wave: near-dup dedup -> quality
    gate -> per-source quota cap -> concat-and-chunk shard formation
    composed in ONE foreachBatch pipeline (VERDICT r9 next #5) — what
    a production ingest wave runs when new documents land: screen them
    against the standing kept corpus, gate the survivors, stop
    over-quota sources, append the rest to training shards without
    recomputing earlier offsets.

    Ordered ingest is the CONTRACT (shard offsets and cap ranks
    accumulate in doc_id order): slices are doc_id ranges staged as
    one sorted file each with explicit monotonic mtimes.  Under it the
    dedup decisions are the stream_neardup_dedup greedy relation, the
    running-count cap equals the batch pipeline's global per-source
    row_number cap, and the offsets equal the batch pack over the
    capped survivors — so the composition is hash-checkable against
    one batch SQL oracle.

    State per epoch: the kept store (bands + shingle sets, epoch-keyed
    append) and the |sources|-row totals+counts snapshot; per-epoch
    work is the batch screen (band equi-join + exact verify of
    candidates only) plus two per-source windows over the batch — no
    stage rescans history."""
    raw = spark.read.parquet(docs_path)
    mm = _footer_min_max(docs_path, "doc_id")  # no-job lo/hi (exact)
    lo, hi = mm if mm else raw.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="docs_c2s_stream_")
    for i in range(n_splits):
        hi_pad = (1 << 60) if i == n_splits - 1 else 0
        (
            raw.filter(
                (F.col("doc_id") >= int(lo) + i * step)
                & (F.col("doc_id") < int(lo) + (i + 1) * step + hi_pad)
            )
            .coalesce(1)
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    _stage_monotonic_mtimes(stage_dir)
    store_dir = _scratch(prefix="c2s_store_")
    totals_root = _scratch(prefix="c2s_totals_")
    out_root = _scratch(prefix="c2s_out_")

    def merge_batch(bdf, epoch_id: int) -> None:
        _pipeline_shards_epoch(
            bdf, epoch_id, store_dir, totals_root, out_root,
            threshold, num_hashes, n_bands, min_toks, budget,
            source_cap=source_cap,
        )

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/slice=*")
    )
    # same scoping rationale as stream_neardup_dedup: an epoch chains
    # ~10 small jobs over a micro-batch; AQE's materialize-then-replan
    # adds serial latency with nothing to re-plan at this size.  The
    # shuffle width drops to 8 for the stream's duration (the
    # stream_scd2 state_partitions pattern): every shuffle here moves
    # a few hundred rows, so 32-partition exchanges are pure
    # task-scheduling overhead — results are partitioning-invariant
    # (deterministic windows/joins; epoch files stay 1-file coalesced).
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="c2s_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    return spark.read.parquet(out_root + "/epoch=*").select(
        "source", "doc_id", "n_toks", "start_tok",
        "first_chunk", "last_chunk", "n_chunks",
    )


def _verified_jaccard_pairs(pairs, sa, sb, threshold: float):
    """Exact bigram-Jaccard verification of LSH candidate ``pairs``
    (id, other) against shingle-set relations ``sa``/``sb`` (id, sh):
    keep pairs whose rounded Jaccard clears ``threshold``.  Shared by
    the CC insert epoch (within-batch + cross-corpus edges) and the
    retraction epoch's survivor re-screen
    (streaming/retraction._cc_rt_delete_epoch)."""
    j = (
        pairs.join(sa.select(F.col("id"), F.col("sh").alias("sh_a")), "id")
        .join(
            sb.select(F.col("id").alias("other"), F.col("sh").alias("sh_b")),
            "other",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "j",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                4,
            ),
        )
    )
    return j.filter(F.col("j") >= threshold).select("id", "other")


def _propagate_min_labels(spark, edges, dist_nodes):
    """Min-label connected components over ``edges`` (id, other),
    returned as a PERSISTED (node, comp) DataFrame.

    The contracted graph handed in here is bounded by the batch's (or
    the affected components') verified edge count, so below a size
    gate the propagation runs as driver-side union-find over ONE
    LIMIT-bounded collect of the edge list — isolated nodes never
    enter the map (callers coalesce them to their own id).  Above the
    gate (a genuinely dup-heavy batch at cluster scale) the
    distributed min-label operator takes over unchanged, seeded with
    ``dist_nodes`` (one ``id`` column) plus the edge endpoints.
    Labels are min ids by induction in both branches."""
    from qaapi_spark.operators.graph import connected_components

    _EDGE_GATE = 100_000
    edge_rows = edges.limit(_EDGE_GATE + 1).collect()
    if len(edge_rows) <= _EDGE_GATE:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        for ra, rb in ((find(r[0]), find(r[1])) for r in edge_rows):
            if ra != rb:
                # min id wins the root — labels stay min doc_ids
                lo2, hi2 = (ra, rb) if ra < rb else (rb, ra)
                parent[hi2] = lo2
        touched = {int(r[0]) for r in edge_rows} | {int(r[1]) for r in edge_rows}
        comp_rows = [(n_, int(find(n_))) for n_ in sorted(touched)]
        return spark.createDataFrame(comp_rows, "node long, comp long").persist()
    nodes = dist_nodes.unionByName(
        edges.select(F.col("other").alias("id"))
    ).distinct()
    return connected_components(
        nodes, edges, node_col="id", src_col="id", dst_col="other"
    ).persist()


def _has_epochs(root: str) -> bool:
    """Whether an epoch-keyed store holds any delta yet.  The scratch
    roots are pre-created empty by mkdtemp, so a bare isdir reads an
    empty directory (UNABLE_TO_INFER_SCHEMA) — presence means at least
    one ``epoch=`` delta dir."""
    return os.path.isdir(root) and any(
        e.startswith("epoch=") for e in os.listdir(root)
    )


def _frontier_max_doc_id(spark, root: str, epoch_lt: int):
    """Max ``doc_id`` across an epoch-keyed store's deltas with epoch <
    ``epoch_lt`` — the ordered-ingest frontier.  Read from the parquet
    FOOTER statistics (driver-side pyarrow metadata, no Spark job: the
    guard runs every epoch and a full read would add a job per
    micro-batch); falls back to one Spark aggregate if any file lacks
    min/max stats.  None when no prior delta exists."""
    import glob as _g

    import pyarrow.parquet as _pq

    files: list[str] = []
    for d in _g.glob(os.path.join(root, "epoch=*")):
        try:
            e = int(d.rsplit("=", 1)[1])
        except ValueError:
            continue
        if e < int(epoch_lt):
            files.extend(_g.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    mx = None
    try:
        for f in files:
            md = _pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            idx = names.index("doc_id")
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise LookupError("missing column statistics")
                mx = st.max if mx is None else max(mx, st.max)
        return mx
    except (LookupError, ValueError, OSError):
        return (
            spark.read.parquet(root)
            .filter(F.col("epoch") < int(epoch_lt))
            .agg(F.max("doc_id"))
            .collect()[0][0]
        )


def _read_deleted(
    spark, del_root: str, epoch_id: int | None = None, key_col: str = "doc_id"
):
    """The retracted subject keys recorded so far (one ``key_col``
    column — doc_id for the corpus streams, user_id for SCD2 erasure),
    or None when no delete epoch has written yet.  ``epoch_id`` filters
    to strictly earlier epochs (retry-idempotence: a replayed epoch
    never meets its own tombstones); None reads every epoch (the
    final-result read).  _store_recover first: the tombstone root is a
    compactable epoch store like the others (ADVICE r11 #1)."""
    if not _store_recover(del_root) or not _has_epochs(del_root):
        return None
    df = _read_pq(spark, del_root)
    if epoch_id is not None:
        df = df.filter(F.col("epoch") < int(epoch_id))
    return df.select(key_col)


def _ordered_frontier_check_async(bdf, prev_max, msg_fn):
    """Async form of the ordered-ingest guard (guide §2.6): the batch
    min(doc_id) agg — the guard's only Spark job — runs on a driver
    thread and the returned ``check()`` raises at the END of the epoch,
    overlapping the probe with the epoch's real work.  Deferral is safe
    for the same reason as the reinsert guard: the batch still fails
    inside foreachBatch with the identical exception, and the epoch's
    interim writes are epoch-keyed overwrites no reader consumes after
    a failed query."""
    if prev_max is None:
        return lambda: None
    from concurrent.futures import ThreadPoolExecutor

    agg = bdf.agg(F.min("doc_id"))
    pool = ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(agg.collect)
    pool.shutdown(wait=False)

    def check() -> None:
        batch_min = fut.result()[0][0]
        if batch_min is not None and int(batch_min) <= int(prev_max):
            raise ValueError(msg_fn(batch_min))

    return check



def _reject_tombstoned_reinsert(bdf, del_root: str | None, epoch_id: int) -> None:
    """Raise when an insert batch carries a doc_id that was already
    RETRACTED (ADVICE r12 #1): tombstones filter every standing-store
    read, so a re-inserted retracted doc would participate in
    within-batch greedy/edge decisions (it can block a live near-dup or
    become a component's min label) and then silently vanish from later
    reads — corrupting survivors' kept flags / labels instead of
    erroring.  The ExactSubstr stream catches this for free via its
    doc_id-ordered frontier (which counts del_root footer stats); the
    CC-label and near-dup insert epochs have no frontier, so they call
    this explicit semi-join guard.  Retry-idempotent: the tombstone
    read filters ``epoch < epoch_id``, so a replayed insert epoch never
    trips on tombstones written after it."""
    _reject_tombstoned_reinsert_async(bdf, del_root, epoch_id)()


def _reject_tombstoned_reinsert_async(bdf, del_root: str | None, epoch_id: int):
    """Async form of the guard (optimization guide §2.6 — overlap
    independent jobs): starts the tombstone semi-join probe on a
    driver thread and returns ``check()``, which the epoch calls AFTER
    its main chain so the probe's ~0.1-0.5 s job overlaps the epoch's
    real work instead of serializing in front of it.  Deferring the
    raise is safe: the batch still fails inside foreachBatch (identical
    exception, identical stream failure), and everything the epoch
    wrote meanwhile is an epoch-keyed overwrite no reader consumes
    because the failed query's final relation is never built."""
    if del_root is None:
        return lambda: None
    tomb = _read_deleted(bdf.sparkSession, del_root, epoch_id)
    if tomb is None:
        return lambda: None
    from concurrent.futures import ThreadPoolExecutor

    probe = (
        bdf.select("doc_id").join(F.broadcast(tomb), "doc_id", "left_semi").limit(3)
    )
    pool = ThreadPoolExecutor(max_workers=1)
    fut = pool.submit(probe.collect)
    pool.shutdown(wait=False)

    def check() -> None:
        hits = fut.result()
        if hits:
            _raise_tombstoned(hits)

    return check


def _raise_tombstoned(hits) -> None:
    raise ValueError(
        "re-insert of tombstoned doc_id(s) "
        f"{sorted(r[0] for r in hits)}: retracted ids are permanent "
        "(GDPR-shaped) — tombstones filter standing-store reads, so "
        "a re-inserted doc would silently corrupt the maintained "
        "relation instead of erroring"
    )


def _cc_labels_epoch(
    bdf,
    epoch_id: int,
    store_dir: str,
    label_root: str,
    threshold: float,
    num_hashes: int,
    n_bands: int,
    del_root: str | None = None,
) -> None:
    """One foreachBatch step of incremental connected-component
    maintenance over the near-dup graph (module-level so
    retry-idempotence is unit-testable): discover this batch's verified
    near-dup edges (within-batch + vs the standing corpus), CONTRACT
    existing components to their label supernodes, run min-label
    propagation on the contracted graph only, and write a label DELTA.

    Why contraction is the 100 TB shape: a new edge can merge two
    standing components, so greedy ordered dedup can't maintain labels
    — but the merge only involves the components the batch TOUCHES.
    Nodes of the contracted graph are the batch's doc_ids plus the
    labels of touched old docs; its size is bounded by the batch's
    edge count, never the corpus.  Labels are min doc_ids by
    induction, so propagation over supernodes yields exactly the batch
    CC labels (order-independent — the oracle is the SAME recursive
    CTE as dedup_connected_components).

    State: (1) the band store — every ingested doc's band keys +
    shingle sets, epoch-keyed append (the stream_neardup store shape,
    but nothing is ever dropped: CC keeps all docs); (2) the label
    store — per-epoch DELTAS (doc_id, comp), latest epoch wins, so an
    epoch writes only the batch's labels plus rows of components it
    merged (at 100 TB a compactor would periodically fold deltas and a
    label-partitioned layout would bound the relabel scan; the delta
    contract is what makes that a drop-in).

    Retry-idempotent: all reads filter epoch < N (a replayed epoch
    never meets its own prior output), all writes are epoch-keyed
    overwrite.

    ``del_root`` (r12, retraction support): when set, band-store and
    label reads anti-join the tombstoned doc_ids recorded there by
    `streaming/retraction._cc_rt_delete_epoch`, so post-delete inserts
    edge only to live docs; None (the insert-only catalog stream)
    leaves every read unchanged.
    """
    from pyspark.sql import Window

    from qaapi_spark.operators.dedup import (
        _hashed_shingle_sets,
        minhash_band_arrays,
    )

    spark = bdf.sparkSession
    # tombstone-reinsert guard overlapped with the epoch chain (§2.6);
    # checked after the writes settle, before the batch commits
    chk_reinsert = _reject_tombstoned_reinsert_async(bdf, del_root, epoch_id)
    bdf = bdf.repartition(8)
    sets = (
        _hashed_shingle_sets(bdf, 2, "text", "doc_id")
        .filter(F.size("sh") > 0)
        .persist()
    )
    signed = sets.select(
        "id",
        F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(
                F.transform(F.col("sh"), lambda v: F.xxhash64(i, v))
            ),
        ).alias("sig"),
    )
    bands_arr = minhash_band_arrays(signed, num_hashes, n_bands).persist()
    keys = bands_arr.select("id", F.explode("bands").alias("bk")).select(
        "id", "bk.band", "bk.bsig"
    )

    # within-batch verified edges (undirected, id > other)
    a, b = keys.alias("a"), keys.alias("b")
    wcand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.id") > F.col("b.id")),
        )
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("other"))
        .distinct()
    )
    new_edges = _verified_jaccard_pairs(wcand, sets, sets, threshold)

    # latest standing labels (empty on first epoch).  _store_recover,
    # not a bare isdir (ADVICE r11 #1): compact_epoch_store promotes
    # these roots via _store_swap, and a crash between its two renames
    # leaves the root absent with state stranded at .__swap_old__ — a
    # bare check would silently treat the batch as first-epoch and
    # discard all accumulated labels/bands.  Call BOTH (no `and`
    # short-circuit) so each root heals even when the other is absent.
    have_bands = _store_recover(store_dir + "/data")
    have_labels = _store_recover(label_root)
    have_state = have_bands and have_labels
    if have_state:
        rec = _read_pq(spark, store_dir + "/data").filter(
            F.col("epoch") < int(epoch_id)
        )
        # retraction support: tombstoned docs leave the standing corpus
        # logically — their band rows and label rows are filtered from
        # every read instead of rewriting historical epoch files
        dels = _read_deleted(spark, del_root, epoch_id) if del_root else None
        if dels is not None:
            rec = rec.join(
                dels.select(F.col("doc_id").alias("id")), "id", "left_anti"
            )
        store = rec.select(
            F.col("id").alias("other"), F.explode("bands").alias("bk")
        ).select("bk.band", "bk.bsig", "other")
        old_sets = rec.select("id", "sh")
        lab_w = Window.partitionBy("doc_id").orderBy(F.desc("epoch"))
        labels_now = (
            spark.read.parquet(label_root)
            .filter(F.col("epoch") < int(epoch_id))
            .withColumn("rn", F.row_number().over(lab_w))
            .filter(F.col("rn") == 1)
            .select("doc_id", "comp")
        )
        if dels is not None:
            labels_now = labels_now.join(dels, "doc_id", "left_anti")
        labels_now = labels_now.persist()
        # cross edges vs the standing corpus, old endpoint -> its label
        ccand = keys.join(store, ["band", "bsig"]).select("id", "other").distinct()
        cross = _verified_jaccard_pairs(ccand, sets, old_sets, threshold)
        cross_lab = (
            cross.join(
                labels_now.select(
                    F.col("doc_id").alias("other"), F.col("comp").alias("olabel")
                ),
                "other",
            )
            .select("id", F.col("olabel").alias("other"))
            .distinct()
        )
        edges = new_edges.unionByName(cross_lab)
    else:
        labels_now = None
        edges = new_edges

    # The contracted graph is bounded by the BATCH's verified edge
    # count (supernodes fold whole standing components into one row),
    # so nothing corpus- or batch-sized reaches the driver — see
    # _propagate_min_labels for the union-find gate / distributed
    # fallback split.
    comp = _propagate_min_labels(spark, edges, sets.select("id"))

    # EVERY batch doc gets a label — docs whose shingle set is empty
    # (< 2 words) can never pair, exactly like the oracle's seed row,
    # so they label as their own singleton component via the coalesce
    batch_labels = (
        bdf.select("doc_id")
        .join(
            comp.select(F.col("node").alias("doc_id"), "comp"), "doc_id", "left"
        )
        .select("doc_id", F.coalesce("comp", F.col("doc_id")).alias("comp"))
    )
    delta = batch_labels
    if labels_now is not None:
        # old supernodes whose label shrank: rewrite their members
        changed = comp.filter(F.col("comp") < F.col("node")).select(
            F.col("node").alias("old_label"), F.col("comp").alias("new_comp")
        )
        relabeled = (
            labels_now.join(
                changed, labels_now["comp"] == changed["old_label"]
            )
            .select("doc_id", F.col("new_comp").alias("comp"))
            # batch rows already carry their final label
            .join(batch_labels.select("doc_id"), "doc_id", "left_anti")
        )
        delta = batch_labels.unionByName(relabeled)
    try:
        # label delta and band-store delta are independent consumers of
        # pinned inputs — overlap their write jobs (_par_writes)
        _par_writes(
            lambda: delta.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(label_root, f"epoch={int(epoch_id)}")
            ),
            lambda: bands_arr.join(sets, "id")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{store_dir}/data/epoch={int(epoch_id)}"),
        )
    finally:
        comp.unpersist()
        if labels_now is not None:
            labels_now.unpersist()
        bands_arr.unpersist()
        sets.unpersist()
    chk_reinsert()


def stream_cc_labels_incremental(
    spark: SparkSession,
    docs_path: str,
    threshold: float = 0.8,
    num_hashes: int = 64,
    n_bands: int = 16,
    n_splits: int = 2,
) -> DataFrame:
    """Incrementally-maintained connected-component labels over the
    near-dup graph (VERDICT r10 next #7's genuinely-new capability):
    the streaming twin of dedup_connected_components, for the corpus
    owner who needs dedup GROUPS (attribution, canonical selection,
    GDPR cascades) kept current as documents land — not just the
    greedy keep/drop decision stream_neardup_dedup_docs makes.

    Unlike greedy dedup, component labels are ORDER-INDEPENDENT: a
    late edge that bridges two standing components merges them here
    (supernode contraction, see _cc_labels_epoch), so the final
    relation equals the batch CC relation and hash-checks against the
    SAME recursive-CTE oracle.  The LSH screen makes edge discovery
    probabilistically complete (a >= threshold pair whose 16 bands all
    miss would drop its edge, ~2e-4 per pair — the stream_neardup
    assumption; the check corpora are asserted fully covered by
    test).

    Per-epoch cost: the batch screen + min-label propagation on the
    CONTRACTED graph (batch ids + touched labels) + a label-delta
    write — no stage recomputes standing components from scratch.
    """
    raw = spark.read.parquet(docs_path)
    mm = _footer_min_max(docs_path, "doc_id")  # no-job lo/hi (exact)
    lo, hi = mm if mm else raw.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="docs_cc_stream_")
    for i in range(n_splits):
        hi_pad = (1 << 60) if i == n_splits - 1 else 0
        (
            raw.filter(
                (F.col("doc_id") >= int(lo) + i * step)
                & (F.col("doc_id") < int(lo) + (i + 1) * step + hi_pad)
            )
            .coalesce(1)
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    _stage_monotonic_mtimes(stage_dir)
    store_dir = _scratch(prefix="cc_store_")
    label_root = _scratch(prefix="cc_labels_")

    def merge_batch(bdf, epoch_id: int) -> None:
        _cc_labels_epoch(
            bdf, epoch_id, store_dir, label_root, threshold, num_hashes, n_bands
        )

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/slice=*")
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="cc_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    from pyspark.sql import Window

    lab_w = Window.partitionBy("doc_id").orderBy(F.desc("epoch"))
    return (
        spark.read.parquet(label_root)
        .withColumn("rn", F.row_number().over(lab_w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "comp")
    )


def _exsub_epoch(
    bdf,
    epoch_id: int,
    digest_root: str,
    out_root: str,
    min_len: int,
) -> None:
    """One foreachBatch step of streaming ExactSubstr dedup (Lee et
    al. ACL'22 §3 under ordered ingest; module-level so
    retry-idempotence is unit-testable): trim the BATCH's documents
    against the standing window-digest store, then append the batch's
    digests to the store.

    Why the stream EQUALS the batch apply relation: the batch picks
    the corpus-wide FIRST (doc_id, pos) occurrence per window digest
    as canonical and cuts every other occurrence.  Under doc_id-
    ordered ingest, every earlier occurrence lives in an earlier (or
    the same) epoch, so a batch occurrence is non-canonical iff its
    digest exists in the store OR an earlier in-batch occurrence
    exists — and an OLD document's canonicity can never be revoked by
    later arrivals (its occurrence stays first), so emitted rows are
    immutable.  No probabilistic screen anywhere: the equality is
    EXACT, and the stream shares dedup_exact_substring_apply's oracle.

    State: the digest store — 16-byte window digests, epoch-keyed
    append (at 100 TB, bucket it by digest so the per-epoch semi-join
    co-locates; volume is O(distinct windows) x 16 bytes).  Per-epoch
    work: batch windows + one digest semi-join + the shared trim tail
    — nothing rescans earlier documents.

    Retry-idempotent: reads filter epoch < N, writes are epoch-keyed
    overwrite (a replayed epoch never meets its own digests).
    """
    from pyspark.sql import Window

    from qaapi_spark.operators.dedup import (
        _all_window_positions,
        _apply_trim,
        _cut_sets,
    )
    from qaapi_spark.operators.textstats import ws_tokens

    spark = bdf.sparkSession
    bdf = bdf.repartition(8)

    # ordered-ingest GUARD (VERDICT r11 next #6): the stream's EXACT
    # equality with the batch apply holds only under doc_id-ordered
    # arrival — a batch landing behind the standing frontier would
    # silently produce a DIFFERENT relation (its occurrences are
    # earlier than already-emitted canonicals, which this stream never
    # revokes).  Reject it loudly instead: the frontier comes from the
    # emitted rows' parquet footer stats (driver-side, no job; at
    # 100 TB a counter in the commit log), the batch min is one tiny
    # agg.
    chk_order = lambda: None  # noqa: E731 - trivial no-op default
    if _has_epochs(out_root):
        prev_max = _frontier_max_doc_id(spark, out_root, epoch_id)
        chk_order = _ordered_frontier_check_async(
            bdf,
            prev_max,
            lambda batch_min: (
                "out-of-order ingest: batch min doc_id "
                f"{batch_min} <= standing frontier {prev_max}; "
                "stream_exact_substring_apply requires doc_id-"
                "ordered arrival (its canonical picks are "
                "irrevocable) — re-stage the corpus in order or "
                "use the retraction-capable variant to repair"
            ),
        )

    wins = _all_window_positions(bdf, min_len, "text", "doc_id").persist()

    # non-canonical batch occurrences: digest already in the store
    # (any earlier occurrence beats the whole batch) ...
    # _store_recover, not a bare isdir (ADVICE r11 #1): the digest
    # store is compact_epoch_store-promoted, so a swap-crash strands it
    # at .__swap_old__ — recover restores it instead of silently
    # re-canonicalizing the whole batch as first-epoch.
    store = None
    if _store_recover(digest_root) and int(epoch_id) > 0:
        store = spark.read.parquet(digest_root).filter(
            F.col("epoch") < int(epoch_id)
        ).select("h")
        seen = wins.join(store, "h", "left_semi").select("doc_id", "pos")
    else:
        seen = None
    # ... or a strictly earlier in-batch occurrence of the same digest
    w = Window.partitionBy("h").orderBy("doc_id", "pos")
    later = (
        wins.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") >= 2)
        .select("doc_id", "pos")
    )
    nc = later if seen is None else later.unionByName(seen)
    cut = _cut_sets(nc, min_len)
    base = bdf.select(
        "doc_id", ws_tokens(F.lower(F.col("text"))).alias("toks")
    )
    try:
        # append only digests the store has NEVER seen, so the store is
        # truly O(distinct windows) x 16 bytes — a digest recurring in
        # every epoch would otherwise be stored once per epoch
        new_h = wins.select("h").distinct()
        if store is not None:
            new_h = new_h.join(store, "h", "left_anti")
        # trimmed rows and digest delta both hang off pinned `wins` —
        # overlap their write jobs (_par_writes)
        _par_writes(
            lambda: _apply_trim(base, cut)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(out_root, f"epoch={int(epoch_id)}")),
            lambda: new_h.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(digest_root, f"epoch={int(epoch_id)}")
            ),
        )
    finally:
        wins.unpersist()
    chk_order()


def stream_exact_substring_apply(
    spark: SparkSession,
    docs_path: str,
    min_len: int = 10,
    n_splits: int = 2,
) -> DataFrame:
    """Streaming ExactSubstr dedup: the trimmed corpus maintained
    incrementally as documents land — each micro-batch trims against
    the standing window-digest store and its rows never change again
    (the canonical occurrence is always the earliest, so history is
    immutable).  The batch kernel re-aggregates the WHOLE corpus per
    run; here the corpus-sized work happened once, spread over the
    epochs, and a new epoch costs only its own windows + one digest
    semi-join.  EXACTLY equals dedup_exact_substring_apply under
    ordered ingest — no LSH, no probabilistic caveat — and shares its
    oracle."""
    raw = spark.read.parquet(docs_path)
    mm = _footer_min_max(docs_path, "doc_id")  # no-job lo/hi (exact)
    lo, hi = mm if mm else raw.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    step = max(1, (int(hi) - int(lo) + n_splits) // n_splits)
    stage_dir = _scratch(prefix="docs_exsub_stream_")
    for i in range(n_splits):
        hi_pad = (1 << 60) if i == n_splits - 1 else 0
        (
            raw.filter(
                (F.col("doc_id") >= int(lo) + i * step)
                & (F.col("doc_id") < int(lo) + (i + 1) * step + hi_pad)
            )
            .coalesce(1)
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite")
            .parquet(os.path.join(stage_dir, f"slice={i}"))
        )
    _stage_monotonic_mtimes(stage_dir)
    digest_root = _scratch(prefix="exsub_digests_")
    out_root = _scratch(prefix="exsub_out_")

    def merge_batch(bdf, epoch_id: int) -> None:
        _exsub_epoch(bdf, epoch_id, digest_root, out_root, min_len)

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage_dir + "/slice=*")
    )
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.writeStream.foreachBatch(merge_batch)
            .trigger(availableNow=True)
            .option("checkpointLocation", _scratch(prefix="exsub_ckpt_"))
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_aqe is None:
            spark.conf.unset("spark.sql.adaptive.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)

    return spark.read.parquet(out_root + "/epoch=*").select(
        "doc_id", "n_toks", "n_kept", "text_dedup"
    )


def compact_epoch_store(
    spark: SparkSession,
    root: str,
    mode: str,
    upto: int,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> int:
    """Fold the epoch deltas <= ``upto`` of an epoch-keyed store into
    ONE delta directory at epoch=``upto`` — the periodic maintenance
    the delta-writing streams (stream_cc_labels_incremental's label
    store, stream_exact_substring_apply's digest store) are designed
    around: without it every later epoch's store read opens every
    historical delta file.

    ``mode='latest'``: keep each ``key_cols`` group's row from its
    highest epoch (the label store's latest-wins contract).
    ``mode='distinct'``: set semantics — distinct rows (the digest
    store).

    CONTRACT PRESERVATION: readers filter ``epoch < N``.  Folding
    epochs [0..upto] to a single epoch=``upto`` delta keeps every such
    read identical — for 'latest' the folded row carries the group's
    max-epoch value, and any delta in (upto, N) still outranks it; for
    'distinct' the union is unchanged.  Only compact epochs the stream
    has finished (upto < the next epoch to run).

    Crash-safe: the folded store is fully written to ``root + '.next'``
    (later epochs copied over), then promoted with the
    rename-trash-rename _store_swap; _store_recover self-heals a crash
    between the renames.  Returns the number of delta dirs folded.

    READER INVALIDATION (ADVICE r11 #5): the swap replaces the store's
    files out from under any lazy DataFrame previously returned over it
    (e.g. the result of stream_cc_labels_incremental still pointing at
    old epoch files) — collecting such a handle after compaction fails
    with missing-file errors.  Collect outstanding results BEFORE
    compacting, or re-read the root afterwards; the same applies to
    in-flight epochs (only compact epochs the stream has finished)."""
    import glob as _glob
    import shutil

    epochs = sorted(
        _glob.glob(os.path.join(root, "epoch=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )
    old = [p for p in epochs if int(p.rsplit("=", 1)[1]) <= int(upto)]
    later = [p for p in epochs if int(p.rsplit("=", 1)[1]) > int(upto)]
    if len(old) <= 1:
        return 0
    # basePath keeps the epoch partition-discovery column when reading
    # the delta dirs directly (a bare multi-path read drops it)
    df = spark.read.option("basePath", root).parquet(*old)
    if mode == "latest":
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(F.desc("epoch"))
        folded = (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "epoch")
        )
    elif mode == "distinct":
        folded = df.drop("epoch").distinct()
    else:
        raise ValueError(f"unknown compaction mode: {mode}")
    nxt = root + ".next"
    shutil.rmtree(nxt, ignore_errors=True)
    folded.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(nxt, f"epoch={int(upto)}")
    )
    for p in later:
        shutil.copytree(p, os.path.join(nxt, os.path.basename(p)))
    _store_swap(root)
    return len(old)
