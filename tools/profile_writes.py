"""Time every DataFrameWriter.parquet / .collect inside a catalog query.

Monkey-patches the writer and collect so each action prints its wall
time and target path — decomposes a streaming epoch's seconds into its
individual Spark jobs.

Usage: python tools/profile_writes.py <sf_dir> [--repeat N] <name>...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

from qaapi_spark.plans.catalog import CATALOG  # noqa: E402
from qaapi_spark.session import get_spark, release_kernel_caches  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0)
    repeat = 1
    if args and args[0] == "--repeat":
        args.pop(0)
        repeat = int(args.pop(0))
    spark = get_spark("profile-writes")
    spark.sparkContext.setLogLevel("ERROR")

    orig_pq = DataFrameWriter.parquet
    orig_collect = DataFrame.collect
    orig_count = DataFrame.count

    def pq(self, path, **kw):
        t0 = time.time()
        try:
            return orig_pq(self, path, **kw)
        finally:
            tail = "/".join(path.rstrip("/").split("/")[-2:])
            print(f"      write {time.time()-t0:6.3f}s  ...{tail}", flush=True)

    def coll(self):
        t0 = time.time()
        try:
            return orig_collect(self)
        finally:
            print(f"      collect {time.time()-t0:6.3f}s", flush=True)

    def cnt(self):
        t0 = time.time()
        try:
            return orig_count(self)
        finally:
            print(f"      count {time.time()-t0:6.3f}s", flush=True)

    for r in range(repeat):
        for name in args:
            DataFrameWriter.parquet = pq
            DataFrame.collect = coll
            DataFrame.count = cnt
            t0 = time.time()
            try:
                df = CATALOG[name].fn(spark, sf_dir)
                DataFrame.collect = orig_collect
                n = len(df.collect())
            finally:
                DataFrameWriter.parquet = orig_pq
                DataFrame.collect = orig_collect
                DataFrame.count = orig_count
            print(f"[{r}] {name}: total={time.time()-t0:.3f}s rows={n}",
                  flush=True)
            release_kernel_caches()
            spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
