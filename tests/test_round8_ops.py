"""Round-8 operator invariants: the banded range join's equivalence
to the naive inequality join (including exact-boundary and cross-band
pairs), and the A-ES weighted sampler's per-group exactness against a
driver-side recomputation."""

from __future__ import annotations

import datetime
import hashlib
import math

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _ts(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def test_banded_range_join_matches_naive(spark):
    """Every pair within the gap appears exactly once, none outside —
    checked against the O(n*m) reference join on a corpus engineered
    to hit band boundaries (deltas exactly at, just under, and just
    over the gap; pairs whose band ids differ by one)."""
    from qaapi_spark.operators.joins import banded_range_join

    gap = 10
    left = spark.createDataFrame(
        [(i, _ts(s)) for i, s in enumerate([0, 5, 9, 10, 19, 20, 21, 100])],
        "lid long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(100 + i, _ts(s)) for i, s in enumerate([0, 9, 10, 11, 15, 29, 30, 31, 99, 111])],
        "rid long, rts timestamp",
    )
    got = {
        (r["lid"], r["rid"], r["delta_us"])
        for r in banded_range_join(left, right, "lts", "rts", gap).collect()
    }
    naive = {
        (r["lid"], r["rid"], r["delta_us"])
        for r in left.crossJoin(right)
        .withColumn("delta_us", F.unix_micros("rts") - F.unix_micros("lts"))
        .filter(F.abs(F.col("delta_us")) <= gap * 1_000_000)
        .collect()
    }
    assert got == naive
    # boundary pairs exist in the fixture: |delta| == gap exactly
    assert any(abs(d) == gap * 1_000_000 for _, _, d in naive)
    # and at least one matched pair spans adjacent bands
    assert any(
        (ls // gap) != (rs // gap)
        for (ls, rs) in [(0, 9), (19, 11), (21, 30)]
    )


def test_banded_range_join_no_duplicate_pairs(spark):
    """The 3-band probe must not double-count a pair (each pair joins
    on the right row's single true band)."""
    from qaapi_spark.operators.joins import banded_range_join

    left = spark.createDataFrame(
        [(1, _ts(10))], "lid long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(2, _ts(10))], "rid long, rts timestamp"
    )
    rows = banded_range_join(left, right, "lts", "rts", 10).collect()
    assert len(rows) == 1 and rows[0]["delta_us"] == 0


def _es_key(seed: str, doc_id: int, w: int) -> float:
    u48 = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:12], 16)
    u = (u48 + 1) / float((1 << 48) + 1)
    return round(-math.log(u) / w, 6)


def test_weighted_wor_matches_driver_recomputation(spark):
    """Per-group selection equals a pure-python A-ES over the same
    md5 uniforms: k smallest (rounded key, id) per group."""
    from qaapi_spark.operators.sampling import weighted_sample_wor_per_group
    from qaapi_spark.operators.textstats import ws_tokens

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    toks = d.select(
        "doc_id", "lang", F.size(ws_tokens(F.lower(F.col("text")))).alias("n")
    ).filter(F.col("n") > 0)
    got = {
        (r["grp"], r["id"], r["rank"])
        for r in weighted_sample_wor_per_group(
            toks, "lang", 3, "n", id_col="doc_id", seed="wrs1"
        ).collect()
    }
    rows = toks.collect()
    by_grp: dict = {}
    for r in rows:
        by_grp.setdefault(r["lang"], []).append(
            (_es_key("wrs1", r["doc_id"], r["n"]), r["doc_id"])
        )
    want = set()
    for g, lst in by_grp.items():
        for rank, (_, did) in enumerate(sorted(lst)[:3], start=1):
            want.add((g, did, rank))
    assert got == want and len(want) > 0


def test_weighted_wor_zero_weight_excluded(spark):
    """Rows with weight <= 0 can never be sampled (the -ln(u)/w key
    is undefined there; A-ES gives them inclusion probability 0)."""
    from qaapi_spark.operators.sampling import weighted_sample_wor_per_group

    df = spark.createDataFrame(
        [(1, "a", 5), (2, "a", 0), (3, "a", 1)], "doc_id long, g string, w long"
    )
    ids = {
        r["id"]
        for r in weighted_sample_wor_per_group(
            df, "g", 10, "w", id_col="doc_id"
        ).collect()
    }
    assert ids == {1, 3}


def test_stream_weighted_sample_equals_batch(spark):
    """min-k merge across micro-batches must reproduce the batch A-ES
    selection bit-for-bit (same keys, same ranks)."""
    from qaapi_spark.plans.catalog import CATALOG

    batch = [
        tuple(r)
        for r in CATALOG["sample_weighted_wor_per_lang"].fn(spark, SF_SMOKE).collect()
    ]
    streamed = [
        tuple(r)
        for r in CATALOG["stream_weighted_sample"].fn(spark, SF_SMOKE).collect()
    ]
    assert streamed == batch and len(batch) > 0


def test_source_kl_divergence_matches_closed_form(spark):
    """KL of a hand-built two-source corpus must equal the closed-form
    sum; a source identical to the corpus mix has KL ~ 0."""
    from qaapi_spark.operators.curation import source_kl_divergence

    # src_a: tokens {x: 2, y: 2}; src_b: tokens {x: 4}
    df = spark.createDataFrame(
        [
            (1, "x y", "src_a"),
            (2, "y x", "src_a"),
            (3, "x x", "src_b"),
            (4, "x x", "src_b"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in source_kl_divergence(df).collect()}
    # corpus: x=6/8, y=2/8
    pa = {"x": 0.5, "y": 0.5}
    qa = {"x": 0.75, "y": 0.25}
    kl_a = sum(pa[t] * math.log(pa[t] / qa[t]) for t in pa)
    kl_b = 1.0 * math.log(1.0 / 0.75)
    assert got["src_a"]["n_tokens"] == 4 and got["src_b"]["n_tokens"] == 4
    assert abs(got["src_a"]["kl_nats"] - round(kl_a, 4)) < 1e-9
    assert abs(got["src_b"]["kl_nats"] - round(kl_b, 4)) < 1e-9


def test_source_kl_divergence_zero_for_uniform_source(spark):
    """A single-source corpus IS the corpus distribution: KL == 0."""
    from qaapi_spark.operators.curation import source_kl_divergence

    df = spark.createDataFrame(
        [(1, "a b c", "only"), (2, "b c d", "only")],
        "doc_id long, text string, source string",
    )
    rows = source_kl_divergence(df).collect()
    assert len(rows) == 1 and rows[0]["kl_nats"] == 0.0


def test_phonetic_blocking_catches_spelling_variant_blocks(spark):
    """Names whose blocking nouns are spelling variants (green/grene)
    must land in one phonetic block and pair up, where exact-noun
    blocking would silently split them."""
    from qaapi_spark.plans.catalog import CATALOG
    import qaapi_spark.plans.llm_dedup as D

    df = spark.createDataFrame(
        [("azure green",), ("azure grene",), ("ivory blush",)],
        "p_name string",
    )
    # reuse the registered query's kernel via a minimal shim table
    noun = F.element_at(F.split("p_name", " "), -1)
    skeleton = F.substring(
        F.concat(
            F.upper(F.substring(noun, 1, 1)),
            F.regexp_replace(
                F.upper(noun.substr(F.lit(2), F.length(noun))), "[AEIOUYHW]", ""
            ),
        ),
        1,
        4,
    )
    codes = {r["p_name"]: r["blk"] for r in df.select("p_name", skeleton.alias("blk")).collect()}
    assert codes["azure green"] == codes["azure grene"] == "GRN"
    assert codes["ivory blush"] != "GRN"


def test_stream_running_distinct_equals_batch(spark):
    """MIN-merge over first-seen days is order-independent, so the
    streamed growth curve must reproduce the batch curve bit-for-bit."""
    from qaapi_spark.plans.catalog import CATALOG

    batch = [
        tuple(r)
        for r in CATALOG["running_distinct_users_daily"].fn(spark, SF_SMOKE).collect()
    ]
    streamed = [
        tuple(r)
        for r in CATALOG["stream_running_distinct_users"].fn(spark, SF_SMOKE).collect()
    ]
    assert streamed == batch and len(batch) > 0
