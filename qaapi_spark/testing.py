"""Shared oracle-comparison helpers (used by tests/ and tools/).

Replicates the driver's correctness gate: run the Spark query and the
DuckDB oracle SQL over the same parquet tables; compare row count,
column-name set, and order-insensitive values.  Values must match
exactly (the queries round any float arithmetic themselves so that an
exact match is achievable cross-engine).
"""

from __future__ import annotations

import math

import duckdb

from qaapi_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _norm_cell(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def norm_rows(cols: list[str], rows: list[tuple]):
    """Sort columns by name, then rows — order-insensitive compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda r: tuple(str(x) for x in r))


def compare(s_cols, s_rows, d_cols, d_rows) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    sc, sr = norm_rows(s_cols, s_rows)
    dc, dr = norm_rows(d_cols, d_rows)
    problems = []
    if sc != dc:
        problems.append(f"columns: spark={sc} duck={dc}")
    if len(sr) != len(dr):
        problems.append(f"rowcount: spark={len(sr)} duck={len(dr)}")
    elif sc == dc:
        diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
        if diffs:
            problems.append(
                f"{len(diffs)}/{len(sr)} rows differ; first diff: spark={diffs[0][0]} duck={diffs[0][1]}"
            )
    return problems


# DuckDB result types with no exact Spark twin.  The driver's
# order-insensitive value hash distinguishes these from Spark's types
# even when every value compares equal (VERDICT r3 finding: all six r3
# hash-FAILs had a HUGEINT `SUM(integer)` oracle column; zero
# hash-green queries did).  Python `==` cannot see the difference, so
# the replica audits the declared relation types and fails before the
# driver does.  Fix pattern: `CAST(SUM(x) AS BIGINT)` in the oracle.
FORBIDDEN_DUCK_TYPES = {
    "HUGEINT",      # int128: DuckDB's SUM(integer) result type
    "UHUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",  # Spark: no unsigned
    "TIME",         # Spark has no time-of-day type
}


def audit_oracle_types(
    con: duckdb.DuckDBPyConnection, sql: str
) -> list[tuple[str, str]]:
    """(col, type) pairs of oracle result columns with no Spark twin."""
    rel = con.sql(sql)
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) in FORBIDDEN_DUCK_TYPES
    ]


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str, audit_types: bool = True):
    if audit_types:
        bad = audit_oracle_types(con, sql)
        if bad:
            raise AssertionError(
                f"oracle result types with no Spark twin (driver hash WILL "
                f"mismatch even at equal values): {bad} — wrap with "
                f"CAST(... AS BIGINT/...)"
            )
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    return cols, res.fetchall()
