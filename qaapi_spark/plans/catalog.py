"""Registry of driver-contract queries.

Each entry pairs a PySpark plan builder with (where SQL-expressible)
the equivalent DuckDB oracle SQL.  Column names are part of the
contract: the driver sorts columns by name and value-hashes, so every
computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from qaapi_spark.sources.tables import read_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    doc: str = ""  # operator family + reference citation


CATALOG: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in CATALOG:
            raise ValueError(f"duplicate query name {name!r}")
        CATALOG[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""))
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a test table with session timezone pinned to UTC so
    timestamp values are engine-independent (oracle comparability)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return read_table(spark, sf_dir, name)
