"""Round-13 retraction-aware MV maintenance (VERDICT r12 next #6):
negative partials fold OUT of a distributive-aggregate MV; MAX/MIN
recompute per affected group only; emptied groups leave the view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mv(spark, rows):
    return spark.createDataFrame(
        rows, "k string, s double, n long, mx double"
    ).withColumn("s", F.col("s").cast("decimal(18,2)"))


_MERGES = {"s": "sum", "n": "sum", "mx": "max"}


def test_retract_sums_subtract_exactly(spark):
    from qaapi_spark.operators.maintain import retract_partial_aggregates

    mv = _mv(spark, [("a", 10.50, 3, 5.0), ("b", 7.25, 2, 4.0)])
    dele = _mv(spark, [("a", 4.25, 1, 2.0)])  # a's max (5.0) survives
    got = {
        r["k"]: (float(r["s"]), r["n"], r["mx"])
        for r in retract_partial_aggregates(
            mv, dele, ["k"], _MERGES, count_col="n",
            recompute=lambda keys: keys.withColumn("mx", F.lit(None).cast("double")),
        ).collect()
    }
    # b untouched; a's sums subtract, max unaffected (2.0 < 5.0 proves
    # a surviving row attains 5.0 — recompute never consulted for a)
    assert got == {"a": (6.25, 2, 5.0), "b": (7.25, 2, 4.0)}


def test_retract_max_recomputes_affected_group_only(spark):
    from qaapi_spark.operators.maintain import retract_partial_aggregates

    mv = _mv(spark, [("a", 10.0, 3, 5.0), ("b", 7.0, 2, 4.0)])
    dele = _mv(spark, [("a", 5.0, 1, 5.0)])  # a's standing max retracted
    seen = []

    def recompute(keys):
        seen.extend(r["k"] for r in keys.collect())
        return spark.createDataFrame([("a", 3.5)], "k string, mx double")

    got = {
        r["k"]: (float(r["s"]), r["n"], r["mx"])
        for r in retract_partial_aggregates(
            mv, dele, ["k"], _MERGES, count_col="n", recompute=recompute
        ).collect()
    }
    assert got == {"a": (5.0, 2, 3.5), "b": (7.0, 2, 4.0)}
    assert seen == ["a"]  # ONLY the affected group reached recompute


def test_retract_emptied_group_leaves_view(spark):
    from qaapi_spark.operators.maintain import retract_partial_aggregates

    mv = _mv(spark, [("a", 10.0, 2, 5.0), ("b", 7.0, 2, 4.0)])
    dele = _mv(spark, [("a", 10.0, 2, 5.0)])  # every 'a' row retracted

    def recompute(keys):
        # an emptied group must be dropped BEFORE recompute: returning
        # no row for it would otherwise leave the stale standing max
        assert keys.count() == 0
        return keys.withColumn("mx", F.lit(None).cast("double"))

    got = {
        r["k"]: (float(r["s"]), r["n"], r["mx"])
        for r in retract_partial_aggregates(
            mv, dele, ["k"], _MERGES, count_col="n", recompute=recompute
        ).collect()
    }
    assert got == {"b": (7.0, 2, 4.0)}


def test_retract_requires_recompute_for_extremes(spark):
    from qaapi_spark.operators.maintain import retract_partial_aggregates

    mv = _mv(spark, [("a", 10.0, 2, 5.0)])
    with pytest.raises(ValueError, match="not invertible"):
        retract_partial_aggregates(
            mv, mv, ["k"], _MERGES, count_col="n", recompute=None
        )
    # sum-only merges need no recompute
    out = retract_partial_aggregates(
        mv.drop("mx"),
        _mv(spark, [("a", 4.0, 1, 0.0)]).drop("mx"),
        ["k"],
        {"s": "sum", "n": "sum"},
        count_col="n",
    )
    assert [(r["k"], float(r["s"]), r["n"]) for r in out.collect()] == [
        ("a", 6.0, 1)
    ]


def test_retract_min_variant(spark):
    from qaapi_spark.operators.maintain import retract_partial_aggregates

    mv = spark.createDataFrame(
        [("a", 3, 1.0), ("b", 2, 2.5)], "k string, n long, mn double"
    )
    dele = spark.createDataFrame([("a", 1, 1.0)], "k string, n long, mn double")
    got = {
        r["k"]: (r["n"], r["mn"])
        for r in retract_partial_aggregates(
            mv, dele, ["k"], {"n": "sum", "mn": "min"}, count_col="n",
            recompute=lambda keys: keys.withColumn("mn", F.lit(9.0)),
        ).collect()
    }
    assert got == {"a": (2, 9.0), "b": (2, 2.5)}


# ---- join-view retraction (r14, VERDICT r13 next #3) ----


def _join_view(spark, tmp_path):
    """Epoch-keyed enriched view: epoch 0 = base, epoch 1 = delta."""
    path = str(tmp_path / "view")
    spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "A")],
        "k long, price double, seg string",
    ).write.mode("overwrite").parquet(path + "/epoch=0")
    spark.createDataFrame(
        [(4, 40.0, "B")], "k long, price double, seg string"
    ).write.mode("overwrite").parquet(path + "/epoch=1")
    return path, str(tmp_path / "deleted")


def _rows(df):
    return sorted((r["k"], r["price"], r["seg"]) for r in df.collect())


def test_retract_join_view_anti_joins_and_is_retry_idempotent(spark, tmp_path):
    from qaapi_spark.operators.maintain import retract_join_view

    path, delr = _join_view(spark, tmp_path)
    dele = spark.createDataFrame([(2,), (3,)], "k long")
    live = retract_join_view(
        spark, path, delr, dele, "k", epoch=2, purge_debt_ratio=None
    )
    want = [(1, 10.0, "A"), (4, 40.0, "B")]
    assert _rows(live.select("k", "price", "seg")) == want
    # replayed epoch: identical tombstone bytes, identical relation
    live2 = retract_join_view(
        spark, path, delr, dele, "k", epoch=2, purge_debt_ratio=None
    )
    assert _rows(live2.select("k", "price", "seg")) == want


def test_retract_join_view_second_epoch_composes(spark, tmp_path):
    from qaapi_spark.operators.maintain import retract_join_view

    path, delr = _join_view(spark, tmp_path)
    retract_join_view(
        spark, path, delr, spark.createDataFrame([(2,)], "k long"), "k", 2,
        purge_debt_ratio=None,
    )
    live = retract_join_view(
        spark, path, delr, spark.createDataFrame([(4,)], "k long"), "k", 3,
        purge_debt_ratio=None,
    )
    assert _rows(live.select("k", "price", "seg")) == [
        (1, 10.0, "A"),
        (3, 30.0, "A"),
    ]


def test_retract_join_view_purge_physically_erases(spark, tmp_path):
    """The compaction moment: purge_tombstoned rewrites the view store
    without the retracted keys; the live relation is unchanged before
    vs after, and the keys are GONE from disk, not merely filtered."""
    from qaapi_spark.operators.maintain import retract_join_view
    from qaapi_spark.streaming.retraction import purge_tombstoned

    path, delr = _join_view(spark, tmp_path)
    dele = spark.createDataFrame([(2,), (3,)], "k long")
    before = _rows(
        retract_join_view(spark, path, delr, dele, "k", 2,
                          purge_debt_ratio=None)
        .select("k", "price", "seg")
    )
    assert purge_tombstoned(spark, path, delr, key_col="k") == 2
    assert spark.read.parquet(path).filter(F.col("k").isin(2, 3)).count() == 0
    # read-side anti-join still applied (now a no-op) — same relation
    after = retract_join_view(spark, path, delr, dele, "k", 2,
                              purge_debt_ratio=None)
    assert _rows(after.select("k", "price", "seg")) == before
    # the epoch layout survived the purge (epoch 1 untouched)
    assert spark.read.parquet(path + "/epoch=1").count() == 1


def test_retract_join_view_debt_trigger_autocompacts(spark, tmp_path):
    """VERDICT r14 next #3: repeated takedown epochs accumulate
    tombstone debt; once standing tombstone rows exceed
    purge_debt_ratio x view rows (both from footer stats, no job),
    the next retract auto-runs compact_view — the live relation is
    unchanged, the retracted keys are physically gone, and the
    anti-join side SHRINKS to nothing (del_root reset)."""
    import os

    from qaapi_spark.operators.maintain import retract_join_view

    path, delr = _join_view(spark, tmp_path)  # 4 rows
    # epoch 2: 1 key -> debt 1/4 = 0.25, not > 0.25 -> no compaction
    live = retract_join_view(
        spark, path, delr, spark.createDataFrame([(2,)], "k long"), "k", 2
    )
    assert _rows(live.select("k", "price", "seg")) == [
        (1, 10.0, "A"), (3, 30.0, "A"), (4, 40.0, "B"),
    ]
    assert any(n.startswith("epoch=") for n in os.listdir(delr))
    assert spark.read.parquet(path).filter(F.col("k") == 2).count() == 1
    # epoch 3: second key -> debt 2/4 > 0.25 -> trigger fires
    live = retract_join_view(
        spark, path, delr, spark.createDataFrame([(4,)], "k long"), "k", 3
    )
    assert _rows(live.select("k", "price", "seg")) == [
        (1, 10.0, "A"), (3, 30.0, "A"),
    ]
    # physically erased, tombstone store reset (broadcast side empty)
    assert spark.read.parquet(path).filter(F.col("k").isin(2, 4)).count() == 0
    assert not any(n.startswith("epoch=") for n in os.listdir(delr))
    # a later epoch keeps composing on the compacted store
    live = retract_join_view(
        spark, path, delr, spark.createDataFrame([(3,)], "k long"), "k", 4
    )
    assert _rows(live.select("k", "price", "seg")) == [(1, 10.0, "A")]


def test_compact_view_rerun_after_partial_clear_is_safe(spark, tmp_path):
    """Crash ordering: the store rewrite lands BEFORE tombstones are
    cleared, so a tombstone epoch surviving a crash filters
    already-erased rows (no-op) and a rerun clears it."""
    from qaapi_spark.operators.maintain import compact_view, retract_join_view

    path, delr = _join_view(spark, tmp_path)
    dele = spark.createDataFrame([(2,), (3,)], "k long")
    retract_join_view(
        spark, path, delr, dele, "k", 2, purge_debt_ratio=None
    )
    from qaapi_spark.streaming.retraction import purge_tombstoned

    # simulate the crash window: purge done, del_root NOT yet cleared
    assert purge_tombstoned(spark, path, delr, key_col="k") == 2
    live = retract_join_view(
        spark, path, delr, spark.createDataFrame([], "k long"), "k", 3,
        purge_debt_ratio=None,
    )
    assert _rows(live.select("k", "price", "seg")) == [
        (1, 10.0, "A"), (4, 40.0, "B"),
    ]
    # rerun completes the clear; nothing else changes
    assert compact_view(spark, path, delr, "k") == 0
    import os

    assert not any(n.startswith("epoch=") for n in os.listdir(delr))
    assert _rows(
        spark.read.parquet(path).select("k", "price", "seg")
    ) == [(1, 10.0, "A"), (4, 40.0, "B")]


# ---- join-view dim updates (r15 — third leg of the join-MV arc) ----


def _join_view_jk(spark, tmp_path):
    """Epoch-keyed enriched view CARRYING the join key (dim updates
    need it): fact key k, join key ck, dim-derived seg."""
    path = str(tmp_path / "view_jk")
    spark.createDataFrame(
        [(1, 100, 10.0, "A"), (2, 200, 20.0, "B"), (3, 100, 30.0, "A")],
        "k long, ck long, price double, seg string",
    ).write.mode("overwrite").parquet(path + "/epoch=0")
    spark.createDataFrame(
        [(4, 300, 40.0, "C")], "k long, ck long, price double, seg string"
    ).write.mode("overwrite").parquet(path + "/epoch=1")
    return path


def _rows_jk(df):
    return sorted(
        (r["k"], r["ck"], r["price"], r["seg"]) for r in df.collect()
    )


def test_update_join_view_dim_patches_affected_keys_only(spark, tmp_path):
    import os

    from qaapi_spark.operators.maintain import update_join_view_dim

    path = _join_view_jk(spark, tmp_path)
    patch = spark.createDataFrame([(100, "A2")], "ck long, seg string")
    live = update_join_view_dim(
        spark, path, patch, key_col="k", join_key_col="ck", epoch=2
    )
    want = [
        (1, 100, 10.0, "A2"),
        (2, 200, 20.0, "B"),
        (3, 100, 30.0, "A2"),
        (4, 300, 40.0, "C"),
    ]
    assert _rows_jk(live.select("k", "ck", "price", "seg")) == want
    # only the delta epoch was added; base files untouched
    assert sorted(
        n for n in os.listdir(path) if n.startswith("epoch=")
    ) == ["epoch=0", "epoch=1", "epoch=2"]
    # the delta holds exactly the affected rows
    assert spark.read.parquet(path + "/epoch=2").count() == 2
    # retry-idempotent: replaying the epoch rewrites identical state
    # (collect fresh plans only — the replay's overwrite invalidates
    # the FIRST call's file listing, the documented store caveat)
    live2 = update_join_view_dim(
        spark, path, patch, key_col="k", join_key_col="ck", epoch=2
    )
    assert _rows_jk(live2.select("k", "ck", "price", "seg")) == want


def test_update_join_view_dim_second_update_wins(spark, tmp_path):
    from qaapi_spark.operators.maintain import update_join_view_dim

    path = _join_view_jk(spark, tmp_path)
    update_join_view_dim(
        spark, path,
        spark.createDataFrame([(100, "A2")], "ck long, seg string"),
        key_col="k", join_key_col="ck", epoch=2,
    )
    live = update_join_view_dim(
        spark, path,
        spark.createDataFrame(
            [(100, "A3"), (300, "C2")], "ck long, seg string"
        ),
        key_col="k", join_key_col="ck", epoch=3,
    )
    assert _rows_jk(live.select("k", "ck", "price", "seg")) == [
        (1, 100, 10.0, "A3"),
        (2, 200, 20.0, "B"),
        (3, 100, 30.0, "A3"),
        (4, 300, 40.0, "C2"),
    ]


def test_update_join_view_dim_unmatched_key_is_noop(spark, tmp_path):
    from qaapi_spark.operators.maintain import update_join_view_dim

    path = _join_view_jk(spark, tmp_path)
    live = update_join_view_dim(
        spark, path,
        spark.createDataFrame([(999, "Z")], "ck long, seg string"),
        key_col="k", join_key_col="ck", epoch=2,
    )
    assert _rows_jk(live.select("k", "ck", "price", "seg")) == [
        (1, 100, 10.0, "A"),
        (2, 200, 20.0, "B"),
        (3, 100, 30.0, "A"),
        (4, 300, 40.0, "C"),
    ]
