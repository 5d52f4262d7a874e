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


def test_tail_lines_contract():
    """VERDICT r15 next #2: the LAST printed line must be <=1900 chars,
    parseable, and carry an explicit name->sec "queries" map (slowest
    ~25) + per-family subtotals; the preceding line carries the q_cs
    full-recovery array."""
    import json

    from bench import _family_subtotals, _names_md5, _tail_lines
    from qaapi_spark.plans import CATALOG

    # worst-case-ish timings: every catalog query present, long floats
    timings = {n: (i % 97) * 1.237 + 0.013 for i, n in enumerate(sorted(CATALOG))}
    out = {
        "metric": "catalog_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": 0.1,
        "queries": timings,
        "calib_cpu_s": 0.583,
        "calib_spark_s": 0.094,
        "calib_io_s": 0.173,
        "calib_mt_s": 0.06,
        "calib_start": {"cpu": 0.646, "spark": 0.282, "io": 0.148, "mt": 0.076},
        "calib_mid": {"cpu": 0.589, "spark": 0.543, "io": 0.289, "mt": 0.062},
    }
    prev = {n: t + 0.5 for n, t in timings.items()}
    lines = _tail_lines(out, 15, prev)
    assert len(lines) == 2
    final = json.loads(lines[-1])
    assert len(lines[-1]) <= 1900
    q = final["queries"]
    assert 5 <= len(q) <= 25
    assert set(q) <= set(CATALOG)
    # the map really is the slowest ones
    floor = min(q.values())
    n_above = sum(1 for t in timings.values() if t > floor + 0.01)
    assert n_above <= len(q)
    # family subtotals sum to the total
    fam = final["fam"]
    assert abs(sum(fam.values()) - out["value"]) < 0.1 * len(fam) + 1
    assert "stream" in fam and "q" in fam
    # calib quartets survive
    assert final["calib_start"]["cpu"] == 0.646
    assert final["prev_round"] == 15
    # recovery line: q_cs zips to sorted names under the fingerprint
    rec = json.loads(lines[0])
    names = sorted(CATALOG)
    assert rec["q_names_md5"] == _names_md5(names)
    assert len(rec["q_cs"]) == len(names)
    assert rec["q_cs"][0] == int(round(timings[names[0]] * 100))
    assert _family_subtotals(timings) == fam
