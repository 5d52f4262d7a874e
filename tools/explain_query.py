"""Dump `.explain("formatted")` for named catalog queries to files.

Usage: python tools/explain_query.py <sf_dir> <out_dir> <suffix> <name> [name...]

Writes <out_dir>/<name>_<suffix>.txt for each query.  For queries whose
fn() has eager side steps (streaming stores), the captured plan is the
final returned relation — the part the bench's collect() executes last.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qaapi_spark.plans.catalog import CATALOG  # noqa: E402
from qaapi_spark.session import get_spark, release_kernel_caches  # noqa: E402


def main() -> None:
    sf_dir, out_dir, suffix = sys.argv[1:4]
    names = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        release_kernel_caches()
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
