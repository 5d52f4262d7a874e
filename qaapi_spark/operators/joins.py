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


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_gap_s: int,
) -> DataFrame:
    """All (left, right) pairs with |right_ts - left_ts| <= max_gap_s,
    WITHOUT an equi-key — the pure range join (Spark has no native
    range join; the inequality-only formulation falls back to
    BroadcastNestedLoopJoin, a full O(n*m) grid scan).

    Plan — the banding rewrite (the technique behind range-join
    optimizers in Databricks runtime / Flink interval joins, public):
    quantize both sides to band = floor(epoch_us / gap_us); any
    qualifying pair differs by at most one band, so LEFT probes bands
    {b-1, b, b+1} (a 3x explode of the SMALL per-row band list, not of
    data) and the join becomes an EQUI-join on the band key followed
    by the exact |delta| filter.  Each qualifying pair matches exactly
    once (on the right row's true band), so no dedup pass is needed.

    At 100 TB: the shuffle key is the time band — co-locates only
    rows that can possibly match; joined-row work per band is
    (left-rate x 3 gap) x (right-rate x gap), bounded by arrival rate,
    not corpus size.  A hot band (burst traffic) is an AQE skew-join
    case, same as any hot join key.

    Column contract: left/right column sets must be disjoint; output
    is left.* + right.* + delta_us (signed right - left microseconds).

    Timestamps may be TIMESTAMP or TIMESTAMP_NTZ (parquet nanos read
    as NTZ); NTZ is cast through the session timezone — set it to UTC
    for deterministic cross-engine comparisons (catalog pattern).
    """
    gap_us = int(max_gap_s) * 1_000_000

    def micros(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    def band(c: str):
        # exact long floor-division (pmod keeps it a floor, not a
        # truncation, for pre-epoch timestamps) — `/` would promote to
        # double, whose 0.5-ulp quotient error could in principle put
        # an exact-boundary pair two bands apart and lose it
        m = micros(c)
        return ((m - F.pmod(m, F.lit(gap_us))) / F.lit(gap_us)).cast("long")

    lb = band(left_ts)
    l_probe = left.withColumn("__band", F.explode(F.array(lb - 1, lb, lb + 1)))
    r_keyed = right.withColumn("__band", band(right_ts))
    delta = micros(right_ts) - micros(left_ts)
    return (
        l_probe.join(r_keyed, "__band")
        .filter(F.abs(delta) <= gap_us)
        .drop("__band")
        .withColumn("delta_us", delta)
    )


def _bloom_hash(key_str, i: int, m_bits: int):
    """Portable md5-family bloom hash i of a string column, in [0, m)."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), key_str)), 1, 15), 16, 10)
        .cast("long")
        % F.lit(m_bits)
    )


def bloom_filter_bits(
    keys: DataFrame, key_col: str, m_bits: int = 4096, k: int = 3
) -> list[int]:
    """Build a bloom filter over a key relation DISTRIBUTEDLY and
    return it as m_bits/64 packed int64 words (driver-side size is
    the FILTER, never the keys: 4096 bits = 64 longs regardless of
    key count).

    Hashes are the portable md5-prefix family, so the same filter is
    reproducible in any engine; bits aggregate with one bit_or
    hash-agg over (word, bit) pairs — map-side combined, |words|
    result rows.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    key_str = F.col(key_col).cast("string")
    hashes = F.array(*[_bloom_hash(key_str, i, m_bits) for i in range(k)])
    words = (
        keys.select(F.explode(hashes).alias("h"))
        .select(
            (F.col("h") / 64).cast("int").alias("word"),
            # shiftleft with a COLUMN shift amount only exists as the
            # SQL function (the Python wrapper takes an int literal)
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(h % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r["word"]] = r["bits"]
    return out


def bloom_prefilter(
    probe: DataFrame, key_col: str, bits: list[int], m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Map-only bloom membership screen: keeps every true member (no
    false negatives by construction) plus a hash-deterministic set of
    false positives — the explicit runtime-filter shape for paths
    where the planner cannot inject one (app-level pre-shuffle
    filtering, cross-system pushdown).  At 100 TB this is the point:
    the probe side drops most rows INSIDE its scan stage, so the
    exact semi-join that follows shuffles the survivors only; the
    filter itself broadcasts as m/64 longs (a literal array), never
    as the key set.
    """
    if len(bits) != m_bits // 64:
        raise ValueError(
            f"bits has {len(bits)} words; m_bits={m_bits} needs {m_bits // 64}"
        )
    lit_bits = F.array(*[F.lit(b) for b in bits])
    key_str = F.col(key_col).cast("string")
    tmp = probe.withColumn("__bloom_bits", lit_bits)
    for i in range(k):
        tmp = tmp.withColumn(f"__bloom_h{i}", _bloom_hash(key_str, i, m_bits))
    # shiftright with a COLUMN shift amount only exists as the SQL fn
    pred = " AND ".join(
        f"(shiftright(element_at(__bloom_bits, CAST(__bloom_h{i} / 64 AS INT) + 1),"
        f" CAST(__bloom_h{i} % 64 AS INT)) & CAST(1 AS BIGINT)) = 1"
        for i in range(k)
    )
    drop = ["__bloom_bits"] + [f"__bloom_h{i}" for i in range(k)]
    return tmp.filter(F.expr(pred)).drop(*drop)
