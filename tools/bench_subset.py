"""Time a subset of catalog queries under bench.py's measurement
conditions (release scratch caches + driver GC between queries,
shared kernels left in place, sorted-name order).

Usage: python tools/bench_subset.py <sf_dir> <name> [name...]
       python tools/bench_subset.py <sf_dir> --repeat 2 <name...>

Names run in the order given — pass them in sorted order to replicate
the in-suite shared-kernel state (a query only sees kernels that an
EARLIER-sorted query would have built)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qaapi_spark.session import get_spark, release_kernel_caches  # noqa: E402
from qaapi_spark.plans.catalog import CATALOG  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0)
    repeat = 1
    if args and args[0] == "--repeat":
        args.pop(0)
        repeat = int(args.pop(0))
    spark = get_spark()
    jvm_gc = spark.sparkContext._jvm.System.gc
    for r in range(repeat):
        for name in args:
            t0 = time.time()
            n = len(CATALOG[name].fn(spark, sf_dir).collect())
            dt = time.time() - t0
            release_kernel_caches()
            jvm_gc()
            print(f"[{r}] {name}: {dt:.3f}s ({n} rows)", flush=True)


if __name__ == "__main__":
    main()
