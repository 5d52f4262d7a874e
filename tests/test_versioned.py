"""Versioned table storage: snapshot isolation, rollback, time travel,
and vacuum over the _LATEST-pointer convention."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from qaapi_spark.operators.versioned import (
    latest_version,
    read_version,
    rollback,
    vacuum,
    versioned_overwrite,
)
from qaapi_spark.sources.tables import read_table

from tests.conftest import SF_SMOKE


def test_versioned_write_read_rollback_vacuum(spark):
    orders = read_table(spark, SF_SMOKE, "orders")
    tbl = tempfile.mkdtemp(prefix="versioned_") + "/orders"

    v1 = versioned_overwrite(orders.filter(F.col("o_orderstatus") == "F"), tbl)
    v2 = versioned_overwrite(orders, tbl)
    assert (v1, v2) == (1, 2)
    assert latest_version(spark, tbl) == 2

    # latest == full table; time travel sees the old snapshot unchanged
    assert read_version(spark, tbl).count() == orders.count()
    n_f = orders.filter(F.col("o_orderstatus") == "F").count()
    assert read_version(spark, tbl, 1).count() == n_f

    # rollback is a pointer flip, not a rewrite
    rollback(spark, tbl, 1)
    assert latest_version(spark, tbl) == 1
    assert read_version(spark, tbl).count() == n_f

    # a write after rollback becomes v3; vacuum keeps last K + current
    v3 = versioned_overwrite(orders.limit(10), tbl)
    assert v3 == 3
    dropped = vacuum(spark, tbl, keep_last=1)
    assert dropped == [1, 2]
    assert read_version(spark, tbl).count() == 10
