"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is timed end-to-end (plan build + execution + collect of the
result), after a one-query warmup to amortize JVM/session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qaapi_spark.plans import CATALOG  # noqa: E402
from qaapi_spark.session import get_spark, release_kernel_caches  # noqa: E402

# Headline suite: every catalog query (correctness surface == bench
# surface), ordered roughly cheap->expensive for readable output.
BENCH_QUERIES = sorted(CATALOG)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("qaapi-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + parquet footer caches
    CATALOG["a1_orders_by_priority"].fn(spark, sf_dir).collect()
    # warmup: Arrow python-worker pool (first mapInPandas pays cold start)
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()
    # warmup: streaming engine + state-store class load (one micro-batch
    # over a 10-row self-contained stream; ~7s one-time cost otherwise
    # billed to the first streaming query)
    import tempfile
    import uuid

    warm_dir = tempfile.mkdtemp(prefix="bench_stream_warm_")
    spark.range(10).write.mode("overwrite").parquet(warm_dir)
    wq = (
        spark.readStream.schema("id long")
        .parquet(warm_dir)
        .groupBy()
        .count()
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("warm_" + uuid.uuid4().hex[:6])
        .trigger(availableNow=True)
        .start()
    )
    wq.awaitTermination()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        n = len(CATALOG[name].fn(spark, sf_dir).collect())
        timings[name] = round(time.time() - t0, 3)
        release_kernel_caches()  # queries must not lean on a predecessor's cache
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
