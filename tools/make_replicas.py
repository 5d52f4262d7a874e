"""Regenerate the /tmp scale-probe replicas the round notes reference.

Usage: python tools/make_replicas.py [base_sf_dir]   (default sf0.1)

Writes (same recipes as the round-5/6 probes; deterministic):
  /tmp/sfx      — documents x4 (replica k appends a ``variantk`` token
                  and offsets doc_id by k*1_000_000 — ids NOT dense),
                  embeddings x10 (one perturbed dim per replica,
                  vec_id offset k*1_000_000), other tables copied.
  /tmp/sfuni    — events x4  (uniform: ts shifted k days,
                  event_id offset).
  /tmp/sfuni40  — events x40 (uniform).
  /tmp/sfskew40 — events x40 with a ~30% hot key: in 9 of every 10
                  replicas (k % 10 != 0), rows with event_id % 3 == 0
                  rewrite user_id=7 and event_type='hot_type' —
                  0.9 x 1/3 = 30% of all rows land on the hot key.

These exist for wall-clock scaling probes only — correctness gates run
against the driver's own /root/testdata SFs.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qaapi_spark.session import get_spark  # noqa: E402


def _copy_table(src_dir: str, dst_dir: str, name: str) -> None:
    shutil.copy(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet")


def make_sfx(spark, base: str, out: str = "/tmp/sfx") -> None:
    os.makedirs(out, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        _copy_table(base, out, t)
    d = spark.read.parquet(f"{base}/documents.parquet")
    waves = [
        d.withColumn("doc_id", F.col("doc_id") + F.lit(k * 1_000_000)).withColumn(
            "text",
            F.concat(F.col("text"), F.lit(f" variant{k}")) if k else F.col("text"),
        )
        for k in range(4)
    ]
    dd = waves[0]
    for w in waves[1:]:
        dd = dd.unionByName(w)
    dd.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    e = spark.read.parquet(f"{base}/embeddings.parquet")
    ewaves = []
    for k in range(10):
        w = e.withColumn("vec_id", F.col("vec_id") + F.lit(k * 1_000_000))
        if k:
            # perturb one dim per replica so vectors are distinct
            w = w.withColumn(
                "embedding",
                F.expr(
                    f"transform(embedding, (x, i) -> CASE WHEN i = {k % 64} "
                    f"THEN cast(x + {k} * 1e-3 AS float) ELSE x END)"
                ),
            )
        ewaves.append(w)
    ee = ewaves[0]
    for w in ewaves[1:]:
        ee = ee.unionByName(w)
    ee.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")


def make_events_replica(
    spark, base: str, out: str, times: int, skew: bool = False
) -> None:
    os.makedirs(out, exist_ok=True)
    for t in (
        "region nation customer supplier part orders lineitem documents embeddings".split()
    ):
        _copy_table(base, out, t)
    ev = spark.read.parquet(f"{base}/events.parquet")
    waves = []
    for k in range(times):
        w = ev.withColumn("event_id", F.col("event_id") + F.lit(k * 10_000_000))
        if k:
            w = w.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {k} DAYS"))
        if skew and k % 10 != 0:
            # ~30% of total rows onto one hot (user, type) pair
            w = w.withColumn(
                "user_id",
                F.when(F.col("event_id") % 3 == 0, F.lit(7)).otherwise(
                    F.col("user_id")
                ),
            ).withColumn(
                "event_type",
                F.when(F.col("event_id") % 3 == 0, F.lit("hot_type")).otherwise(
                    F.col("event_type")
                ),
            )
        waves.append(w)
    out_df = waves[0]
    for w in waves[1:]:
        out_df = out_df.unionByName(w)
    out_df.write.mode("overwrite").parquet(f"{out}/events.parquet")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    make_sfx(spark, base)
    make_events_replica(spark, base, "/tmp/sfuni", 4)
    make_events_replica(spark, base, "/tmp/sfuni40", 40)
    make_events_replica(spark, base, "/tmp/sfskew40", 40, skew=True)
    print("replicas written: /tmp/sfx /tmp/sfuni /tmp/sfuni40 /tmp/sfskew40")
