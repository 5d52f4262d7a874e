"""bench.py baseline recovery: q_cs arrays recorded by OLDER rounds
must keep mapping to names after the catalog grows (r11: r10's
226-long q_cs vs the 230-query catalog silently dropped the
round-over-round delta until _catalog_names_at_round)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_prev_bench_recovers_older_round_qcs():
    from bench import _latest_prev_bench
    from qaapi_spark.plans import CATALOG

    rnd, src, q = _latest_prev_bench(0.1)
    assert src == "driver_round"
    assert rnd is not None and rnd >= 10
    assert q and len(q) <= len(CATALOG)
    # recovered names are real catalog names with plausible timings
    assert set(q) <= set(CATALOG)
    assert all(0 <= v < 600 for v in q.values())


def test_catalog_names_at_round_monotone():
    from bench import _catalog_names_at_round

    r6 = _catalog_names_at_round(6)
    r10 = _catalog_names_at_round(10)
    assert r6 and r10 and set(r6) <= set(r10)
