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
