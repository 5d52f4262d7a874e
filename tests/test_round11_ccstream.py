"""Round-11 incremental-CC stream tests (VERDICT r10 next #7): a late
doc that bridges two STANDING components must merge them (the case
greedy ordered dedup cannot handle), label deltas must be
retry-idempotent, and singleton/empty-shingle docs must still label.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _mk_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(path)


# Bigram-Jaccard geometry (computed, then pinned): TA/TB share a
# 20-word run C and differ in a 3-word suffix -> j(TA, TB) = 19/25 =
# 0.76 < 0.8 (no direct edge); TX concatenates both suffix variants ->
# j(TX, TA) = j(TX, TB) = 22/26 = 0.8462 >= 0.8 (edges to both).
_C = " ".join(f"c{i}" for i in range(20))
_TA = _C + " a1 a2 a3"
_TB = _C + " b1 b2 b3"
_TX = _C + " a1 a2 a3 " + _C + " b1 b2 b3"


def test_late_bridge_merges_standing_components(spark, tmp_path):
    """Docs 0,1 (text TA) and 2,3 (text TB) form two components in
    epoch 0; doc 20 (text TX) arrives in epoch 1 with verified edges
    to BOTH -> every doc must relabel to comp 0, including the
    standing component whose label (2) the merge shrinks."""
    from qaapi_spark.streaming.incremental import stream_cc_labels_incremental

    docs = str(tmp_path / "docs.parquet")
    _mk_docs(
        spark,
        docs,
        [(0, _TA), (1, _TA), (2, _TB), (3, _TB), (20, _TX)],
    )
    got = {
        r["doc_id"]: r["comp"]
        for r in stream_cc_labels_incremental(spark, docs, n_splits=2).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 20: 0}


def test_singletons_and_empty_shingles_label_themselves(spark, tmp_path):
    """A one-word doc has NO bigrams (empty shingle set, excluded from
    the band store) and an unrelated doc pairs with nothing — both
    must still appear, each as its own component, like the oracle's
    seed rows."""
    from qaapi_spark.streaming.incremental import stream_cc_labels_incremental

    docs = str(tmp_path / "docs.parquet")
    _mk_docs(
        spark,
        docs,
        [(0, _TA), (1, _TA), (5, "solo"), (9, "totally different words here")],
    )
    got = {
        r["doc_id"]: r["comp"]
        for r in stream_cc_labels_incremental(spark, docs, n_splits=2).collect()
    }
    assert got == {0: 0, 1: 0, 5: 5, 9: 9}


def test_cc_epoch_retry_idempotent(spark, tmp_path):
    """A foreachBatch retry of epoch 1 must reproduce the identical
    label delta: the epoch reads only strictly-earlier state and
    overwrites its own epoch-keyed outputs."""
    from qaapi_spark.streaming.incremental import _cc_labels_epoch

    store = str(tmp_path / "store")
    labels = str(tmp_path / "labels")
    b0 = spark.createDataFrame(
        [(0, _TA), (1, _TA), (2, _TB), (3, _TB)], "doc_id long, text string"
    )
    b1 = spark.createDataFrame([(20, _TX)], "doc_id long, text string")
    _cc_labels_epoch(b0, 0, store, labels, 0.8, 64, 16)
    _cc_labels_epoch(b1, 1, store, labels, 0.8, 64, 16)
    first = sorted(
        (r["doc_id"], r["comp"])
        for r in spark.read.parquet(os.path.join(labels, "epoch=1")).collect()
    )
    # epoch-1 delta: the new doc plus the relabeled standing component
    assert first == [(2, 0), (3, 0), (20, 0)]
    _cc_labels_epoch(b1, 1, store, labels, 0.8, 64, 16)  # replay
    again = sorted(
        (r["doc_id"], r["comp"])
        for r in spark.read.parquet(os.path.join(labels, "epoch=1")).collect()
    )
    assert again == first
    # latest-epoch-wins resolution over the deltas = the merged truth
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("epoch"))
    final = {
        r["doc_id"]: r["comp"]
        for r in spark.read.parquet(labels)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert final == {0: 0, 1: 0, 2: 0, 3: 0, 20: 0}


def test_compact_label_store_preserves_resolution(spark, tmp_path):
    """Folding epochs [0..1] of the label store into one delta must
    leave epoch-2 processing AND the final latest-wins resolution
    byte-identical to the uncompacted run."""
    from qaapi_spark.streaming.incremental import (
        _cc_labels_epoch,
        compact_epoch_store,
    )

    rows0 = [(0, _TA), (1, _TA)]
    rows1 = [(2, _TB), (3, _TB)]
    rows2 = [(20, _TX)]

    def run(compact: bool, sub: str):
        store = str(tmp_path / sub / "store")
        labels = str(tmp_path / sub / "labels")
        for i, rows in enumerate([rows0, rows1, rows2]):
            if compact and i == 2:
                n = compact_epoch_store(spark, labels, "latest", upto=1)
                assert n == 2
            b = spark.createDataFrame(rows, "doc_id long, text string")
            _cc_labels_epoch(b, i, store, labels, 0.8, 64, 16)
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(F.desc("epoch"))
        return sorted(
            (r["doc_id"], r["comp"])
            for r in spark.read.parquet(labels)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        )

    plain = run(False, "plain")
    compacted = run(True, "compacted")
    assert plain == compacted == [(0, 0), (1, 0), (2, 0), (3, 0), (20, 0)]
