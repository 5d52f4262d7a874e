"""Plan-shape and property tests for the sixth relational wave
(TPC-H Q8-Q22 shapes, plans/relational6.py) and pipeline ops wave 2
(plans/llm_pipeline.py).

The oracle gate proves VALUES; these tests pin the PHYSICAL PLANS the
queries were designed around (broadcasts on fixed-size dims, semi/anti
joins instead of re-scans, top-k as TakeOrderedAndProject, pushed scan
filters) so a regression that silently degrades the plan — while still
returning right answers at small SF — fails the build.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.plans.catalog import CATALOG

SF = "/root/testdata/sf0.001"


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


# ---------------------------------------------------------------- Q shapes


def test_q17_decorrelates_to_single_stats_aggregate(spark):
    """The correlated AVG becomes one per-part aggregate — the plan
    must contain NO more than the two aggregates (stats + final), and
    the filter must not trigger a per-row subquery re-scan."""
    df = CATALOG["q17_small_quantity_revenue"].fn(spark, SF)
    p = _optimized(df)
    assert "count(1)" in p or "count(*)" in p.lower()
    # a correlated plan would carry a scalar-subquery per row
    assert "scalar-subquery" not in p.lower()


def test_q21_both_exists_become_one_aggregate(spark):
    """EXISTS + NOT EXISTS are answered by a single per-order
    aggregate: exactly one count(distinct ...) aggregate pair, no
    second scan-join of lineitem against itself."""
    df = CATALOG["q21_sole_late_supplier_blame"].fn(spark, SF)
    p = _physical(df)
    assert "TakeOrderedAndProject" in p  # top-20, never a full sort
    # the fact relation appears exactly twice (probe + per-order agg),
    # not three times as the literal EXISTS/NOT-EXISTS formulation
    assert p.count("lineitem.parquet") <= 2


def test_q20_semi_join_chain(spark):
    """Nested INs lower to left-semi joins — no inner join dups."""
    df = CATALOG["q20_heavy_shippers_of_small_parts"].fn(spark, SF)
    p = _physical(df)
    assert p.count("LeftSemi") >= 2


def test_q16_not_in_is_anti_join(spark):
    df = CATALOG["q16_supplier_diversity_by_part_class"].fn(spark, SF)
    p = _physical(df)
    assert "LeftAnti" in p


def test_q12_ship_date_filter_reaches_scan(spark):
    df = CATALOG["q12_late_shipment_priority_counts"].fn(spark, SF)
    p = _physical(df)
    scan_lines = [ln for ln in p.splitlines() if "lineitem.parquet" in ln]
    assert scan_lines
    assert any(
        "PushedFilters" in ln and "l_shipdate" in ln for ln in scan_lines
    )


def test_q15_revenue_view_not_recomputed_per_row(spark):
    """The max-revenue scalar is a 1-row broadcast, so the lineitem
    relation is scanned at most twice (view + re-aggregate), never
    once per supplier."""
    df = CATALOG["q15_top_supplier_revenue"].fn(spark, SF)
    p = _physical(df)
    assert p.count("lineitem.parquet") <= 2
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_q8_q9_broadcast_fixed_dims(spark):
    for name in ("q8_market_share_by_year", "q9_product_profit_by_nation_year"):
        p = _physical(CATALOG[name].fn(spark, SF))
        assert "BroadcastHashJoin" in p, name


# ------------------------------------------------------------ pipeline ops


def test_debounce_keeps_first_event_per_user(spark):
    out = CATALOG["event_debounce_user_6h"].fn(spark, SF).collect()
    total_kept = sum(r.n_kept for r in out)
    e = spark.read.parquet(f"{SF}/events.parquet")
    n_users = e.select("user_id").distinct().count()
    # every user's first event is always kept
    assert total_kept >= n_users


def test_quota_cap_never_exceeds_k(spark):
    out = CATALOG["curation_domain_quota_cap"].fn(spark, SF)
    per_source = out.groupBy("source").count().collect()
    assert per_source and all(r["count"] <= 10 for r in per_source)
    assert out.select(F.max("rk")).first()[0] <= 10


def test_leakage_safe_split_never_splits_a_component(spark):
    out = CATALOG["sample_split_leakage_safe"].fn(spark, SF)
    straddlers = (
        out.groupBy("comp")
        .agg(F.count_distinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers == 0


def test_int8_quantization_codes_bounded_and_reconstructable(spark):
    """Codes stay in [-127, 127] and scale*code reconstructs each
    element within scale/2 (the quantization error bound)."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    xd = lambda v: v.cast("double")  # noqa: E731
    maxabs = F.array_max(F.transform("embedding", lambda v: F.abs(xd(v))))
    checked = (
        e.select("vec_id", "embedding", maxabs.alias("maxabs"))
        .filter(F.col("maxabs") > 0)
        .select(
            F.array_max(
                F.transform(
                    "embedding",
                    lambda v: F.abs(
                        xd(v)
                        - F.floor(xd(v) * 127.0 / F.col("maxabs") + 0.5)
                        * (F.col("maxabs") / 127.0)
                    )
                    - (F.col("maxabs") / 127.0) / 2.0,
                )
            ).alias("worst_excess")
        )
        .agg(F.max("worst_excess").alias("worst"))
        .first()
    )
    assert checked["worst"] <= 1e-12
    out = CATALOG["emb_quantize_int8"].fn(spark, SF)
    bounds = out.agg(
        F.min("min_code").alias("lo"), F.max("max_code").alias("hi")
    ).first()
    assert bounds["lo"] >= -127 and bounds["hi"] <= 127
    # quantization plan is pure per-row expressions — no shuffle at all
    p = _physical(out.limit(10))
    assert "Exchange" not in p.replace("BroadcastExchange", "")


def test_bow_fingerprint_groups_are_permutation_invariant(spark):
    """Two docs with the same vocabulary in different order/multiplicity
    land in the same group."""
    d = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "gamma beta alpha alpha"),
            (3, "alpha beta delta"),
        ],
        "doc_id long, text string",
    )
    bow = F.md5(
        F.array_join(
            F.array_sort(
                F.array_distinct(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
            ),
            " ",
        )
    )
    groups = (
        d.select(bow.alias("bow"), "doc_id")
        .groupBy("bow")
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
        .collect()
    )
    by_n = sorted(r.n for r in groups)
    assert by_n == [1, 2]
    assert next(r.keeper for r in groups if r.n == 2) == 1
