"""Round-6 operator invariants beyond the oracle gate: streamed moment
store equals the batch covariance bit-for-bit (addition-mergeability),
and filtered ANN's label restriction + per-label brute-force parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_stream_covariance_equals_batch(spark):
    """Summed per-epoch integer moment partials must close to the same
    covariance as the one-shot batch aggregate — exactly, not
    approximately: integer sums are grouping-independent."""
    from qaapi_spark.operators.linalg import covariance_upper
    from qaapi_spark.streaming.incremental import stream_covariance_update

    streamed = sorted(
        map(
            tuple,
            stream_covariance_update(spark, f"{SF_SMOKE}/embeddings.parquet").collect(),
        )
    )
    batch = sorted(
        map(
            tuple,
            covariance_upper(spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")).collect(),
        )
    )
    assert streamed == batch and len(streamed) > 0


def test_filtered_ann_matches_per_label_bruteforce(spark):
    """Every filtered result shares its query's label, and the ranking
    equals unfiltered brute-force run on each label slice separately."""
    from qaapi_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_filtered,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") % 100 == 0)
    got = cosine_topk_filtered(qs, e, 5).collect()
    assert got, "query stripe must be non-empty"

    lab = {r["vec_id"]: r["label"] for r in e.select("vec_id", "label").collect()}
    for r in got:
        assert lab[r["query_id"]] == lab[r["cand_id"]], r

    want = []
    for lb in sorted({lab[r["query_id"]] for r in got}):
        sl = e.filter(F.col("label") == lb)
        want += [
            tuple(r)
            for r in cosine_topk_bruteforce(
                qs.filter(F.col("label") == lb), sl, 5
            ).collect()
        ]
    assert sorted(map(tuple, got)) == sorted(want)
