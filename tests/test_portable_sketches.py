"""Cross-engine property tests for the portable (md5-hash-family)
sketches: Spark and DuckDB must agree BIT-FOR-BIT on arbitrary inputs,
not just the driver fixtures — this is the invariant that makes the
hash-verified twins trustworthy.

Each example materializes a small random relation, runs the Spark
operator and the operator's own DuckDB oracle SQL over the identical
rows, and compares exactly (no tolerance: the driver's hash tolerates
nothing).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qaapi_spark.operators.sketches import (
    histogram_percentiles,
    histogram_percentiles_oracle_sql,
    hll_portable,
    hll_portable_oracle_sql,
)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_keys = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 40)),
    min_size=1,
    max_size=60,
)


def _duck(pdf: pd.DataFrame, sql: str, view: str = "events"):
    con = duckdb.connect()
    con.register(view, pdf)
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, sorted(map(tuple, res.fetchall()))


@given(rows=_keys)
@_SETTINGS
def test_hll_portable_bit_identical_to_duckdb(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "user_id"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        map(tuple, hll_portable(sdf, "user_id", ["event_type"]).collect())
    )
    _, want = _duck(
        pdf, hll_portable_oracle_sql("events", "user_id", ["event_type"])
    )
    assert got == want


_vals = st.lists(
    st.tuples(
        st.sampled_from(["x", "y"]),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=60,
)


@given(rows=_vals)
@_SETTINGS
def test_histogram_percentiles_bit_identical_to_duckdb(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "value"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        map(tuple, histogram_percentiles(sdf, "value", ["event_type"]).collect())
    )
    _, want = _duck(
        pdf, histogram_percentiles_oracle_sql("events", "value", ["event_type"])
    )
    assert got == want


_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab c")),
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=12,
)


@given(texts=_texts)
@_SETTINGS
def test_simhash_portable_fingerprints_match_duckdb(spark, texts):
    """The md5 60-bit fingerprint (per-bit majority over distinct ws
    tokens) must agree with its SQL formulation on arbitrary text —
    including empty/whitespace-only docs (which produce no tokens and
    therefore no fingerprint)."""
    from qaapi_spark.operators.dedup import simhash_fingerprints_portable

    pdf = pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}
    )
    sdf = spark.createDataFrame(pdf)
    got = sorted(map(tuple, simhash_fingerprints_portable(sdf).collect()))
    sql = r"""
    WITH toks AS (
        SELECT doc_id AS id,
               unnest(list_distinct(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                      ELSE string_split_regex(trim(lower(text)), '\s+') END)) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
        FROM toks
    ),
    votes AS (
        SELECT id, j.j, SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM hashed CROSS JOIN (SELECT unnest(range(0, 60)) AS j) j
        GROUP BY id, j.j
    )
    SELECT id, SUM(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END) AS fp
    FROM votes GROUP BY id
    """
    _, want = _duck(pdf, sql, view="documents")
    assert got == want


@given(rows=_keys)
@_SETTINGS
def test_kmv_overlap_bit_identical_to_duckdb(spark, rows):
    """KMV overlap estimates must agree bit-for-bit with the SQL
    formulation on arbitrary inputs (k small enough that both the
    exact-small and estimated regimes are exercised)."""
    from qaapi_spark.operators.sketches import kmv_overlap, kmv_overlap_oracle_sql

    pdf = pd.DataFrame(rows, columns=["event_type", "user_id"])
    sdf = spark.createDataFrame(pdf)
    got = sorted(
        map(tuple, kmv_overlap(sdf, "user_id", "event_type", k=8).collect())
    )
    _, want = _duck(pdf, kmv_overlap_oracle_sql("events", "user_id", "event_type", k=8))
    assert got == want
