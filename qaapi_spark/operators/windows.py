"""Window-function operators (reference SURVEY.md §2.6, W1-W3).

Snowflake `QUALIFY ROW_NUMBER() = 1` dedup becomes window-column +
filter (OSS Spark has no QUALIFY).  At scale, each partitionBy key set
becomes one shuffle on those keys; the rolling-total window (W3) runs
over *post-aggregation* day-level cardinality, so its single-partition
global sort is a few thousand rows regardless of input scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def dedup_keep_one(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """W1: ROW_NUMBER() OVER (PARTITION BY keys ORDER BY ...) = 1.

    The reference orders by a constant (Update...sql:119-121 `ORDER BY 1`,
    a nondeterministic pick); we require a real tiebreaker for
    deterministic results — documented divergence (SURVEY §7.3).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def dedup_keep_latest(df: DataFrame, keys: Sequence[str], ts_col: str, tiebreak: Sequence[str] = ()) -> DataFrame:
    """W2: keep newest row per key by timestamp (Update...sql:206-208)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak]
    return dedup_keep_one(df, keys, order)


def rolling_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    preceding: int,
    alias: str,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """W3: SUM(v) OVER (ORDER BY o ROWS BETWEEN n PRECEDING AND CURRENT ROW).

    Reference: queries/pagenation.sql:20 (5-row running total of daily
    call counts).  Unpartitioned frames serialize into one task — fine
    for post-agg day-level data; pass partition_by for large domains.
    """
    w = Window.orderBy(order_col).rowsBetween(-preceding, Window.currentRow)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(order_col).rowsBetween(
            -preceding, Window.currentRow
        )
    return df.withColumn(alias, F.sum(value_col).over(w))


def topk_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column], k: int
) -> DataFrame:
    """Top-K per group via row_number — extension operator (not in the
    reference, needed by the similarity-search surface)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= k)
        .drop(_RN)
    )
