"""Driver-gate replica: every CATALOG query with an oracle must
hash-match DuckDB at sf0.001 (the driver runs the same at sf0.01)."""

from __future__ import annotations

import pytest

from qaapi_spark.plans import CATALOG
from qaapi_spark.testing import compare, duck_connection, run_oracle

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF_SMOKE)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_query_matches_oracle(spark, duck, name):
    spec = CATALOG[name]
    sdf = spec.fn(spark, SF_SMOKE)
    rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        # rows-only contract: must run and be deterministic across runs
        rows2 = [tuple(r) for r in spec.fn(spark, SF_SMOKE).collect()]
        assert sorted(map(str, rows)) == sorted(map(str, rows2))
        return
    d_cols, d_rows = run_oracle(duck, spec.oracle)
    problems = compare(sdf.columns, rows, d_cols, d_rows)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(CATALOG)
