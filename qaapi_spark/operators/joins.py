"""Join operators beyond plain equi-joins.

The reference's joins are all equi/semi/anti (SURVEY §2.4); `as_of_join`
is part of the extended surface (Spark has no native as-of join —
pyspark_guide 'Common OLAP patterns').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qaapi_spark.operators.windows import topk_per_group


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, the single latest right row with
    right_ts <= left_ts, matched on left_on == right_on.

    Plan: equi-join on the key (shuffle on the key only), range filter,
    then top-1 per left row by right_ts.  This is the set-based
    formulation — right-side fan-in per key is bounded by the key's
    history length.  For heavily skewed keys at 100 TB, the
    alternative is `applyInPandas` + `pd.merge_asof` per key group
    (both sides sorted), which avoids materializing the pre-top-1
    fan-out.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (right_on, right_ts)]
    r = right.select(
        F.col(right_on).alias("__k"), F.col(right_ts).alias("__rts"), *right_cols
    )
    joined = left.join(
        r, (left[left_on] == F.col("__k")) & (F.col("__rts") <= left[left_ts]), "left"
    )
    # rank right matches per left row; left key tuple = all left columns.
    # tiebreak columns make equal-timestamp picks deterministic.
    order = [F.col("__rts").desc_nulls_last()] + [
        F.col(c).desc_nulls_last() for c in (tiebreak or [])
    ]
    ranked = topk_per_group(joined, [left[c] for c in left.columns], order, 1)
    return ranked.drop("__k")
