"""Round-10 regression tests for the ADVICE r9 fixes: streaming
store swaps must be crash-recoverable (no silent first-epoch reset),
ordered-ingest staging must stamp strictly increasing mtimes, the
footer-stats flush sentinel must fall back when statistics are
absent, the dense-Jaccard vocab guard must bound the collect in ONE
job, and the curation oracles must tokenize empty docs like the
Spark kernels do."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _store(prefix: str) -> str:
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "topk")


def test_store_swap_crash_window_recovers(spark):
    """ADVICE r9 #2: a crash between retiring the old store and
    promoting the new one must NOT look like first-epoch — the
    recovery helper restores the stranded state before the merge's
    existence check."""
    from qaapi_spark.streaming.incremental import (
        _merge_weighted_sample_batch,
        _store_recover,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    store = _store("swapcrash_")

    _merge_weighted_sample_batch(half, store, k=5, seed="t10")
    state = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert state

    # Simulate the crash window: old store renamed to trash, new one
    # not yet promoted (the .next of the dying epoch is irrelevant —
    # the engine replays that batch).
    os.rename(store, store + ".__swap_old__")
    assert not os.path.isdir(store)

    # Entry-time self-heal restores the accumulated state...
    assert _store_recover(store) is True
    healed = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert healed == state
    # ...and the replayed merge is idempotent on top of it.
    _merge_weighted_sample_batch(half, store, k=5, seed="t10")
    replayed = sorted(tuple(r) for r in spark.read.parquet(store).collect())
    assert replayed == state


def test_store_recover_first_epoch_and_stale_trash(spark):
    """First epoch (nothing on disk) must report no store; a stale
    trash left by a crash AFTER promotion must not clobber the newer
    store."""
    from qaapi_spark.streaming.incremental import (
        _merge_weighted_sample_batch,
        _store_recover,
        _store_swap,
    )

    store = _store("swapfresh_")
    assert _store_recover(store) is False

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    _merge_weighted_sample_batch(docs, store, k=3, seed="t10b")
    good = sorted(tuple(r) for r in spark.read.parquet(store).collect())

    # stale trash from a crash after promote: recovery must keep the
    # promoted store and the next swap must clear the trash
    os.makedirs(store + ".__swap_old__", exist_ok=True)
    assert _store_recover(store) is True
    assert sorted(tuple(r) for r in spark.read.parquet(store).collect()) == good

    shutil.copytree(store, store + ".next", dirs_exist_ok=True)
    _store_swap(store)
    assert not os.path.isdir(store + ".__swap_old__")
    assert sorted(tuple(r) for r in spark.read.parquet(store).collect()) == good


def test_stage_monotonic_mtimes_orders_slices(tmp_path):
    """ADVICE r9 #3: after stamping, every file in slice=i has a
    strictly smaller mtime than every file in slice=j for i<j, even
    when the slices were written out of order / with tied mtimes."""
    from qaapi_spark.streaming.incremental import _stage_monotonic_mtimes

    stage = str(tmp_path)
    # write slices in REVERSE order with deliberately tied mtimes
    for i in (2, 0, 1):
        d = os.path.join(stage, f"slice={i}")
        os.makedirs(d)
        for part in ("part-0.parquet", "_SUCCESS"):
            p = os.path.join(d, part)
            with open(p, "w") as f:
                f.write("x")
            os.utime(p, (1000000000, 1000000000))

    _stage_monotonic_mtimes(stage)

    def slice_mtimes(i):
        d = os.path.join(stage, f"slice={i}")
        return [os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)]

    assert max(slice_mtimes(0)) < min(slice_mtimes(1))
    assert max(slice_mtimes(1)) < min(slice_mtimes(2))


def test_interval_join_sentinel_survives_missing_stats(spark, tmp_path):
    """ADVICE r9 #4: a ts column chunk without statistics must route
    the flush-sentinel derivation through the Spark max(ts) fallback
    instead of raising AttributeError — end-to-end result unchanged."""
    import pyarrow.parquet as pq

    from qaapi_spark.streaming.incremental import stream_interval_join_left

    src = f"{SF_SMOKE}/events.parquet"
    nostats = str(tmp_path / "events_nostats.parquet")
    pq.write_table(
        pq.read_table(src), nostats, write_statistics=False, row_group_size=4096
    )
    # sanity: the rewrite really dropped the stats
    pf = pq.ParquetFile(nostats)
    ts_idx = pf.schema_arrow.get_field_index("ts")
    st = pf.metadata.row_group(0).column(ts_idx).statistics
    assert st is None or not st.has_min_max

    got = stream_interval_join_left(spark, nostats)
    want = stream_interval_join_left(spark, src)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_dense_vocab_guard_single_job(spark):
    """ADVICE r9 #5: the vocab ceiling must be enforced BY the bounded
    collect itself (LIMIT max+1) — no separate count() action.  Proxy
    assertion: a ceiling of 10 still fails fast, and the error message
    carries the bound (not a full count that would require the second
    aggregation)."""
    import qaapi_spark.operators.dedup as dd

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    orig = dd._DENSE_VOCAB_MAX
    dd._DENSE_VOCAB_MAX = 10
    try:
        with pytest.raises(ValueError, match="driver bound"):
            dd.ngram_jaccard_pairs(docs, 0.5)
    finally:
        dd._DENSE_VOCAB_MAX = orig


def test_curation_oracle_tokenizer_guards_empty_docs():
    """ADVICE r9 #1: every llm_curation oracle must tokenize through
    the guarded empty->[] CASE (DuckDB string_split_regex('') is ['']),
    and DuckDB must agree the phantom token is gone."""
    import duckdb

    from qaapi_spark.plans.llm_curation import _DD_WORDS

    assert "CASE WHEN" in _DD_WORDS
    n = duckdb.sql(
        f"SELECT len({_DD_WORDS}) FROM (SELECT '   ' AS text)"
    ).fetchone()[0]
    assert n == 0


def test_indexed_miner_recall_bar(spark):
    """VERDICT r9 next #3 / r10 next #2: the ROUTED hard-negative miner
    must clear the 0.8 recall bar against the exact grid — the same
    serving bar the retuned SRP index itself meets (at smoke SF the
    router picks SRP: measured 0.9333 at sf0.001, 0.8794 at sf0.01;
    the IVF branch's bar is test_ivf_miner_recall_floor)."""
    from qaapi_spark.plans.catalog import CATALOG

    r = CATALOG["pairs_mine_recall_eval"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_anchors"] > 0
    assert r["recall_at_k"] >= 0.8, r.asDict()


def _read_tree(spark, path):
    import glob

    out = []
    for d in sorted(glob.glob(path + "/epoch=*")):
        out.extend(sorted(tuple(r) for r in spark.read.parquet(d).collect()))
    return out


def test_pipeline_shards_epoch_retry_idempotent(spark, tmp_path):
    """VERDICT r9 next #5 'done' condition: replaying an epoch of the
    composed corpus-to-shards stream (a foreachBatch retry) must
    reproduce identical bytes — including the dedup decisions, which
    must NOT screen the batch against its own prior output (every doc
    is its own near-dup)."""
    from qaapi_spark.streaming.incremental import _pipeline_shards_epoch

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    mid = int(lo) + max(1, (int(hi) - int(lo) + 2) // 2)
    b0 = docs.filter(F.col("doc_id") < mid)
    b1 = docs.filter(F.col("doc_id") >= mid)
    store = str(tmp_path / "store")
    totals = str(tmp_path / "totals")
    out = str(tmp_path / "out")

    def run(bdf, epoch):
        _pipeline_shards_epoch(
            bdf, epoch, store, totals, out,
            threshold=0.8, num_hashes=64, n_bands=16, min_toks=16, budget=128,
            source_cap=15,
        )

    run(b0, 0)
    run(b1, 1)
    first = (_read_tree(spark, out), _read_tree(spark, store + "/data"),
             _read_tree(spark, totals))
    assert first[0], "pipeline produced no shard rows"

    # replay BOTH epochs out of order (epoch-1 retry, then epoch-0
    # retry against a store that already holds both epochs)
    run(b1, 1)
    run(b0, 0)
    second = (_read_tree(spark, out), _read_tree(spark, store + "/data"),
              _read_tree(spark, totals))
    assert second == first


def test_stream_pipeline_matches_gated_pack_invariants(spark):
    """Composition invariants beyond the oracle: every output doc
    survived the dedup (it appears in stream_neardup's kept relation),
    clears the 16-token gate, and per-source offsets are gapless
    running sums in doc_id order."""
    from qaapi_spark.plans.catalog import CATALOG

    rows = (
        CATALOG["stream_pipeline_corpus_to_shards"].fn(spark, SF_SMOKE).collect()
    )
    kept = {
        r["doc_id"]
        for r in CATALOG["stream_neardup_dedup_docs"].fn(spark, SF_SMOKE).collect()
    }
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        assert r["n_toks"] >= 16
        by_source.setdefault(r["source"], []).append(r)
    for src, rs in by_source.items():
        assert len(rs) <= 15  # per-source quota cap
        rs.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in rs:
            assert r["start_tok"] == run, (src, r)
            run += r["n_toks"]
    # note: kept relation uses parity batching, the pipeline uses range
    # batching — kept sets may differ on docs whose suppressor moved
    # batches, so assert the weaker direction that holds by design:
    # every packed doc is near-dup-free against SOME greedy relation
    # (non-empty intersection sanity, not equality)
    packed = {r["doc_id"] for r in rows}
    assert packed & kept


def test_exact_substring_invariants(spark):
    """ExactSubstr family invariants beyond the oracle: ranges are
    maximal (>= L tokens, within doc bounds, non-overlapping window
    STARTS between islands), and doc stats never exceed the doc."""
    from qaapi_spark.plans.catalog import CATALOG

    L = 10
    ranges = (
        CATALOG["dedup_exact_substring_ranges"].fn(spark, SF_SMOKE).collect()
    )
    stats = {
        r["doc_id"]: r
        for r in CATALOG["dedup_exact_substring_doc_stats"].fn(spark, SF_SMOKE).collect()
    }
    assert ranges, "test corpus should contain duplicated passages"
    by_doc: dict[int, list] = {}
    for r in ranges:
        assert r["range_len"] >= L
        assert r["end_pos"] - r["start_pos"] + 1 == r["range_len"]
        assert r["n_dup_windows"] == r["range_len"] - L + 1
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r["start_pos"])
        # islands are maximal: next island's first window start is at
        # least 2 positions past this island's last window start
        for a, b in zip(rs, rs[1:]):
            assert b["start_pos"] > a["end_pos"] - L + 2
        s = stats[doc]
        assert 0 < s["n_dup_toks"] <= s["n_toks"]
        # token union is bounded by the interval union of the ranges
        assert s["n_dup_toks"] <= sum(r["range_len"] for r in rs)
    # ADVICE r10 #3 (applied r11): doc_stats now emits EVERY document —
    # docs with a range carry positive counts (asserted above), all
    # others appear explicitly with n_dup_toks = 0
    assert set(by_doc) <= set(stats)
    for doc, s in stats.items():
        if doc not in by_doc:
            assert s["n_dup_toks"] == 0, (doc, s)


def test_ivf_miner_recall_floor(spark):
    """The IVF-pooled miner (the routed default's beyond-budget branch)
    must clear the 0.8 bar at its swept adaptive config (round 11:
    k_cells = ceil(n/16), nprobe = ceil(3k/8) = 37.5% corpus touch,
    stripe-trained Lloyd codebook — measured 0.844 at sf0.001 / 0.801
    at sf0.01 / 0.836 at sf0.1 vs 0.66-0.70 for the old k=8/nprobe=3;
    tools/sweep_miner_pool.py)."""
    from pyspark.sql import functions as F

    from qaapi_spark.operators.similarity import cosine_topk_bruteforce
    from qaapi_spark.operators.windows import topk_per_group
    from qaapi_spark.plans.catalog import CATALOG
    from qaapi_spark.plans.llm_retrieval import _HARD_NEG_K, _mine_anchor_inputs

    ivf = (
        CATALOG["pairs_mine_contrastive_ivf"]
        .fn(spark, SF_SMOKE)
        .filter(F.col("label") == "hard_neg")
    )
    got = {(r[0], r[1]) for r in ivf.select("anchor_id", "other_id").collect()}
    _, e, qs, partners = _mine_anchor_inputs(spark, SF_SMOKE)
    grid = cosine_topk_bruteforce(qs, e, int(e.count()))
    ehard = topk_per_group(
        grid.join(partners, ["query_id", "cand_id"], "left_anti"),
        ["query_id"],
        [F.desc("cosine"), F.asc("cand_id")],
        _HARD_NEG_K,
    )
    exact = {(r[0], r[1]) for r in ehard.select("query_id", "cand_id").collect()}
    assert exact
    assert len(got & exact) / len(exact) >= 0.8
