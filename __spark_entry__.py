"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``qaapi_spark.plans`` (one entry per operator
family from SURVEY.md §2 + the extended LLM-pipeline surface).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from qaapi_spark.plans import CATALOG

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "w3_rolling_daily_events"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference queries/pagenation.sql:1-25 shape:
    daily event counts + 5-row rolling total) on sf0.001."""
    return CATALOG[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query; omitted entries (approx /
    non-SQL-expressible operators) take the driver's rows-only check."""
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
