"""Sketch queries: CMS frequency estimation + exact heavy hitters."""

from __future__ import annotations

from pyspark.sql import functions as F

from qaapi_spark.operators.sketches import cms_build, cms_point_estimates, heavy_hitters_exact
from qaapi_spark.plans.catalog import query, t


@query(
    "sketch_heavy_hitters_exact",
    oracle="""
    SELECT user_id AS key, COUNT(*) AS cnt
    FROM events GROUP BY user_id
    ORDER BY cnt DESC, key LIMIT 20
    """,
    doc="exact top-k frequent keys (heavy-hitter ground truth) (extension)",
)
def sketch_heavy_hitters_exact(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    return heavy_hitters_exact(e, "user_id", 20)


@query(
    "sketch_cms_user_counts",
    oracle=None,  # xxhash64 hash family not reproducible in DuckDB => rows-only
    doc="count-min sketch: d x w hash-aggregate build + broadcast point "
    "estimates; overestimate bound asserted in tests (extension)",
)
def sketch_cms_user_counts(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    sketch = cms_build(e, "user_id", depth=4, width=1024)
    est = cms_point_estimates(e, sketch, "user_id", depth=4, width=1024)
    return est.orderBy("key")
