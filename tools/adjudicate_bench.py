"""Adjudicate bench runs against the stall-window problem.

This container's io bands inflate file-heavy lines 1.5-3x and recur
more often than a suite run completes (SCALE.md rounds 8-11), so no
single run is trustworthy.  The honest reading, mechanized here:

  1. per-run totals + the start/mid/end calib quartets (a mid-band run
     shows io >= ~2x the quiet ~0.11 s baseline);
  2. a BEST-OF-N per-line composite (cancels a band that hits
     different sections in different runs);
  3. the composite vs the newest driver-recorded baseline
     (bench._latest_prev_bench — q_cs arrays from older rounds map via
     the CORRECTNESS-union name reconstruction), with the shared-set
     delta, the median per-query ratio, and the residual regressions.

Usage:
  python tools/adjudicate_bench.py RUN.err [RUN2.err ...]
  python tools/adjudicate_bench.py [--since TS] bench_history/runs_sf0.1.jsonl
where each RUN.err is a bench.py stderr file (the "# name: 1.234s"
lines); the matching RUN.out (same stem) is read for the calib
quartets when present.  A .jsonl argument is bench.py's committed
per-run log (VERDICT r11 #4): every line is one complete run — the
composite becomes re-derivable from the repo alone.

``--since TS`` (ADVICE r12 #3): the jsonl is append-only across
rounds, so without a bound 'best-of-N' silently blends prior rounds'
timings (a stale fast outlier understates the current round).  TS is
epoch seconds or a local ISO datetime (--since 2026-08-16T12:00);
lines whose ``ts`` is earlier are dropped.  Each ingested line prints
its ts so the right bound is easy to pick.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _latest_prev_bench  # noqa: E402


def parse_err(path: str) -> dict[str, float]:
    q: dict[str, float] = {}
    with open(path, errors="ignore") as f:
        for ln in f:
            for m in re.finditer(r"# ([a-z0-9_]+): ([0-9.]+)s", ln):
                q[m.group(1)] = float(m.group(2))
    return q


def parse_calib(err_path: str) -> dict:
    out_path = re.sub(r"\.err$", ".out", err_path)
    try:
        with open(out_path) as f:
            lines = [ln for ln in f if ln.strip().startswith("{")]
        d = json.loads(lines[-1])
        return {
            "start": d.get("calib_start"),
            "mid": d.get("calib_mid"),
            "end": {
                "cpu": d.get("calib_cpu_s"),
                "io": d.get("calib_io_s"),
                "mt": d.get("calib_mt_s"),
            },
        }
    except (OSError, ValueError, IndexError):
        return {}


def _ts_key(v) -> float:
    """Epoch seconds from a jsonl ``ts`` (float) or an ISO datetime."""
    try:
        return float(v)
    except (TypeError, ValueError):
        from datetime import datetime

        return datetime.fromisoformat(str(v)).timestamp()


def main() -> None:
    argv = sys.argv[1:]
    since = None
    if "--since" in argv:
        i = argv.index("--since")
        if i + 1 >= len(argv):
            sys.exit("--since requires a value (epoch seconds or ISO datetime)")
        since = _ts_key(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    paths = argv
    if not paths:
        sys.exit(__doc__)
    runs = []
    for p in paths:
        if p.endswith(".jsonl"):
            with open(p) as f:
                for i, ln in enumerate(ln for ln in f if ln.strip()):
                    d = json.loads(ln)
                    if since is not None and "ts" not in d:
                        # keep, loudly: a ts-less line predates the ts
                        # field; silently dropping it would bias the
                        # best-of composite (ADVICE r13 #3)
                        print(
                            f"warn: {os.path.basename(p)}#{i} has no ts; "
                            "kept despite --since",
                            file=sys.stderr,
                        )
                    elif since is not None and _ts_key(d.get("ts") or 0) < since:
                        continue
                    runs.append(
                        (
                            f"{os.path.basename(p)}#{i}@{d.get('ts', '?')}",
                            d.get("queries") or {},
                            {
                                "start": d.get("calib_start"),
                                "mid": d.get("calib_mid"),
                                "end": {
                                    "cpu": d.get("calib_cpu_s"),
                                    "io": d.get("calib_io_s"),
                                    "mt": d.get("calib_mt_s"),
                                },
                            },
                        )
                    )
        else:
            runs.append((p, parse_err(p), parse_calib(p)))
    if not runs:
        sys.exit("no runs left after --since filter")
    for p, q, c in runs:
        ios = [
            (c.get(k) or {}).get("io")
            for k in ("start", "mid", "end")
            if c.get(k)
        ]
        print(
            f"{os.path.basename(p)}: total {sum(q.values()):.1f}s / {len(q)}"
            f"  calib_io start/mid/end = {ios}"
        )
    all_names = set().union(*[set(q) for _, q, _ in runs])
    best = {n: min(q[n] for _, q, _ in runs if n in q) for n in all_names}
    print(f"\nbest-of-{len(runs)} total: {sum(best.values()):.1f}s / {len(best)}")

    rnd, src, prev = _latest_prev_bench(0.1)
    if not prev:
        print("no baseline recoverable")
        return
    shared = [n for n in best if n in prev]
    tb, tp = sum(best[n] for n in shared), sum(prev[n] for n in shared)
    ratios = [best[n] / prev[n] for n in shared if prev[n] > 0]
    print(
        f"vs {src} r{rnd}: shared {len(shared)} = {tb:.1f} vs {tp:.1f}"
        f" ({tb - tp:+.1f}s), median ratio {statistics.median(ratios):.3f}"
    )
    print("residual best-of regressions >= 0.5s:")
    for d, n in sorted(((best[n] - prev[n], n) for n in shared), reverse=True):
        if d >= 0.5:
            print(f"  {n}: {prev[n]:.2f} -> {best[n]:.2f} ({d:+.2f})")
    new = sorted(n for n in best if n not in prev)
    if new:
        print(f"new lines ({len(new)}, {sum(best[n] for n in new):.1f}s gross):")
        for n in new:
            print(f"  {n}: {best[n]:.2f}")


if __name__ == "__main__":
    main()
