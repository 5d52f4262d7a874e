"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``qaapi_spark.plans`` (one entry per operator
family from SURVEY.md §2 + the extended LLM-pipeline surface).
"""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from qaapi_spark.plans import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "w3_rolling_daily_events"


def _driver_verified() -> set[str]:
    """Names already green under a previous round's driver gate.

    The driver checks the first N entries of ``queries()`` in order, so
    we front-load queries that no prior ``CORRECTNESS_r*.json`` has
    confirmed — each round's gate then extends hard-signal coverage
    instead of re-checking the same prefix (VERDICT r1 next-round #1).
    """
    seen: set[str] = set()
    for p in Path(__file__).resolve().parent.glob("CORRECTNESS_r*.json"):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("err") is None and rec.get("rows_match"):
                seen.add(name)
    return seen


# Names the round-1 verdict explicitly wants under the hard gate next;
# hoisted to the very front of the unverified segment so they cannot
# fall outside the driver's 50-query check window.
_GATE_PRIORITY = ("pmi_collocations", "tfidf_top_terms")


def _ordered_names() -> list[str]:
    verified = _driver_verified()
    names = list(CATALOG)
    unverified = [n for n in names if n not in verified]
    unverified.sort(key=lambda n: (n not in _GATE_PRIORITY,))
    return unverified + [n for n in names if n in verified]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference queries/pagenation.sql:1-25 shape:
    daily event counts + 5-row rolling total) on sf0.001."""
    return CATALOG[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    not-yet-driver-verified queries first (see _driver_verified)."""
    return {name: CATALOG[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted entries (approx /
    non-SQL-expressible operators) take the driver's rows-only check."""
    return {
        name: CATALOG[name].oracle
        for name in _ordered_names()
        if CATALOG[name].oracle is not None
    }
